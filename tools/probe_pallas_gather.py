"""Probe: Pallas mask-matmul gather (fwd+bwd) vs the r3 default
(native gather fwd + one-hot-matmul bwd) across the gather-heavy zoo.

Motivated by the r4 MF device trace: the two forward gathers cost 0.85 ms
of MF's 1.64 ms device epoch (~12x off HBM bandwidth -- v5e has no gather
hardware) and the in-loop one-hot backward lowers to a slow VPU convolution
emitter, while the same math as isolated mask-matmuls runs at ~0.03 ms
(KERNEL_BENCH.json onehot rows).

Full 100-epoch training timing, single-sync checksum. Run SOLO on an idle
host. Writes PALLAS_GATHER_PROBE.json.
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

MODELS = ("mf", "ffm", "neuralcf", "deepfm", "widedeep", "dien", "nfm", "pnn")


def run_one(name, data, pallas: bool):
    cfg = PRESETS[name]
    model = build_model(cfg, data)
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=bench.EPOCHS,
            track_metrics=False,
            compute_dtype=bench.COMPUTE_DTYPE.get(name),
            matmul_gather_bwd=not pallas,
            pallas_gather=pallas,
        ),
    )
    batch, y, w = bench._train_batch(data, name, indirect=False)
    weights = {"train": w} if w is not None else None
    rng = jax.random.PRNGKey(0)
    res = trainer.fit(rng, (batch, y), weights=weights)  # compile + warm
    jax.block_until_ready(res.params)
    dt = float("inf")
    final = None
    for _ in range(4):
        t0 = time.perf_counter()
        res = trainer.fit(rng, (batch, y), weights=weights)
        final = float(res.history["_param_checksum"][-1])
        dt = min(dt, time.perf_counter() - t0)
    loss = float(res.history["train_loss"][-1])
    return {
        "sec_total": dt,
        "examples_per_sec": y.shape[0] * bench.EPOCHS / dt,
        "final_loss": loss,
        "checksum": final,
    }


def main():
    only = sys.argv[1:] or MODELS
    data = MovieLens100K(DEFAULT_DATA)
    try:
        out = json.load(open("PALLAS_GATHER_PROBE.json"))
    except FileNotFoundError:
        out = {}
    for name in only:
        row = out.get(name, {})
        for pallas in (False, True):
            key = "pallas" if pallas else "default"
            row[key] = run_one(name, data, pallas)
            print(name, key, row[key]["sec_total"], row[key]["final_loss"],
                  flush=True)
        row["speedup_pallas_vs_default"] = (
            row["default"]["sec_total"] / row["pallas"]["sec_total"]
        )
        row["loss_delta"] = (
            row["pallas"]["final_loss"] - row["default"]["final_loss"]
        )
        out[name] = row
        with open("PALLAS_GATHER_PROBE.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(
        {k: v.get("speedup_pallas_vs_default") for k, v in out.items()}
    ))


if __name__ == "__main__":
    main()
