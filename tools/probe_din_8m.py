"""Probe: push DIN training past 8M examples/s bf16 (VERDICT r3 next #3).

Levers measured against the shipped configuration (bf16 + one-hot-matmul
gather backward, whole-run scan):

  A. fused_gather: one [B, L+1] item gather for history+target (one gather
     kernel + ONE combined one-hot matmul backward instead of two).
  B. donate: donate params/opt_state to the compiled run (removes the
     call-boundary copy of the carry).

Timing rule: fetch the in-program _param_checksum (CLAUDE.md r2 relay
pitfall). Writes DIN_8M_PROBE.json. Run solo on an idle host.
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

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA, build_model  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

EPOCHS = 100


def measure(variant: str) -> dict:
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    cfg = PRESETS["din"]
    if variant != "base":
        cfg = cfg.replace(model_kwargs=dict(cfg.model_kwargs, **{
            "fused": {"fused_gather": True},
            "indirect": {"indirect_hist": True},
        }[variant]))
    model = build_model(cfg, data)
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=EPOCHS,
            track_metrics=False,
            compute_dtype="bfloat16",
            matmul_gather_bwd=True,
        ),
    )
    # build both batch formats locally (bench._train_batch now emits the
    # indirect format for din, so the base/fused variants need the standard
    # [B, L] form constructed here)
    import jax.numpy as jnp
    from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler

    sampler = NegativeSampler(
        data.seen_mask(data.train, data.valid, data.test), seed=0
    )
    neg = sampler.sample(cfg.negatives[0])
    combined = MovieLens100K.concat_splits(data.train, neg)
    hist_u = jnp.asarray(data.history_matrix(data.train, cfg.hist_len))
    uidx = jnp.asarray(combined["user"])
    items = jnp.asarray(combined["item"])
    y = jnp.asarray(combined["rating"])
    if variant == "indirect":
        batch = (hist_u, uidx, items)
    else:
        batch = (hist_u[uidx], items)
    rng = jax.random.PRNGKey(0)
    res = trainer.fit(rng, (batch, y))  # compile + warm
    float(res.history["_param_checksum"][-1])
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        res = trainer.fit(rng, (batch, y))
        float(res.history["_param_checksum"][-1])
        jax.block_until_ready(res.params)
        dt = min(dt, time.perf_counter() - t0)
    n = int(y.shape[0])
    return {
        "variant": variant,
        "sec_total": dt,
        "examples_per_sec": n * EPOCHS / dt,
        "final_loss": float(res.history["train_loss"][-1]),
    }


def main():
    import sys as _sys

    variants = _sys.argv[1:] or ["base", "fused", "indirect"]
    try:
        with open("DIN_8M_PROBE.json") as f:
            out = json.load(f)
    except FileNotFoundError:
        out = {}
    for v in variants:
        out[v] = measure(v)
        print(out[v], flush=True)
    for v in out:
        if v != "base" and "base" in out and isinstance(out[v], dict):
            out[v]["speedup_vs_base"] = (
                out[v]["examples_per_sec"] / out["base"]["examples_per_sec"]
            )
    with open("DIN_8M_PROBE.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
