"""Probe: one-hot-matmul FORWARD gathers (TrainConfig.onehot_gather) across
the gather-heavy zoo.

The r5 MF layout probe (MF_LAYOUT_PROBE.json) showed XLA's fused
compare->dot one-hot stream beats the slow native in-scan gather emitter by
1.36x end-to-end on MF. This measures the generic route
(parallel/ep.py::onehot_gather_fwd -> ops/embedding.py::gather_onehot, [B, D]
orientation) on the rest of the zoo vs the shipped default (native gather
fwd + one-hot-matmul bwd). Full 100-epoch bench-configuration runs,
single-sync checksum timing. Run SOLO. Writes ONEHOT_FWD_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

import bench  # noqa: E402
from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    build_model,
)
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

MODELS = ("ffm", "neuralcf", "deepfm", "widedeep", "nfm", "pnn",
          "deepcrossing", "deepcross", "din", "dien")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ONEHOT_FWD_PROBE.json")


def run_one(name, data, onehot: bool):
    cfg = PRESETS[name]
    if name in ("din", "dien"):
        cfg = cfg.replace(model_kwargs=dict(cfg.model_kwargs, indirect_hist=True))
    model = build_model(cfg, data)
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=bench.EPOCHS,
            track_metrics=False,
            compute_dtype=bench.COMPUTE_DTYPE.get(name),
            matmul_gather_bwd=not onehot,
            onehot_gather=onehot,
        ),
    )
    batch, y, w = bench._train_batch(data, name)
    weights = {"train": w} if w is not None else None
    rng = jax.random.PRNGKey(0)
    res = trainer.fit(rng, (batch, y), weights=weights)  # compile + warm
    jax.block_until_ready(res.params)
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        res = trainer.fit(rng, (batch, y), weights=weights)
        float(res.history["_param_checksum"][-1])
        dt = min(dt, time.perf_counter() - t0)
    return {
        "sec_total": dt,
        "examples_per_sec": y.shape[0] * bench.EPOCHS / dt,
        "final_loss": float(res.history["train_loss"][-1]),
    }


def main():
    only = sys.argv[1:] or MODELS
    data = MovieLens100K(DEFAULT_DATA)
    try:
        out = json.load(open(OUT))
    except FileNotFoundError:
        out = {}
    for name in only:
        row = out.get(name, {})
        for onehot in (False, True):
            key = "onehot" if onehot else "default"
            row[key] = run_one(name, data, onehot)
            print(name, key, row[key]["sec_total"], row[key]["final_loss"],
                  flush=True)
        row["speedup_onehot_vs_default"] = (
            row["default"]["sec_total"] / row["onehot"]["sec_total"]
        )
        row["loss_delta"] = (
            row["onehot"]["final_loss"] - row["default"]["final_loss"]
        )
        out[name] = row
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(
        {k: v.get("speedup_onehot_vs_default") for k, v in out.items()}
    ))


if __name__ == "__main__":
    main()
