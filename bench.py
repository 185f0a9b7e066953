"""Benchmark: training examples/s/chip on ml-100k, vs the torch-CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N, ...}

The headline metric follows BASELINE.json ("Training examples/s/chip ...
DeepFM + DIN on ml-100k"): geometric-mean speedup over the measured reference
throughput (BASELINE_MEASURED.json, tools/measure_reference_baseline.py),
value = DeepFM examples/s/chip. Timing covers the full-batch training loop
(same work the reference's train_loop does), warm-compiled, whole multi-epoch
scan on device.
"""

from __future__ import annotations

import json
import time

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    build_model,
)
from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler  # noqa: E402
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer  # noqa: E402

# Measured torch-CPU reference throughput (examples/s), full-batch train_loop
# (see BASELINE_MEASURED.json; tools/measure_reference_baseline.py).
REFERENCE_EXAMPLES_PER_SEC = {"deepfm": 14581.0, "din": 17364.0, "mf": 614883.0}

EPOCHS = 100

# Mixed precision per model: bf16 (MXU matmuls, f32 master weights) is used
# only where a full reference-hyperparameter run proved quality parity
# (BF16_QUALITY.json): DIN matches f32 within seed variance at 1.56x speed;
# DeepFM degraded in bf16 and stays f32.
COMPUTE_DTYPE = {"deepfm": None, "din": "bfloat16", "mf": None}


def _train_batch(data: MovieLens100K, name: str):
    cfg = PRESETS[name]
    sampler = NegativeSampler(
        data.seen_mask(data.train, data.valid, data.test), seed=0
    )
    neg = sampler.sample(cfg.negatives[0])
    combined = MovieLens100K.concat_splits(data.train, neg)
    y = jnp.asarray(combined["rating"])
    if cfg.family == "feature":
        return jnp.asarray(data.feature_matrix(combined)), y
    if cfg.family == "pair":
        return (jnp.asarray(combined["user"]), jnp.asarray(combined["item"])), y
    if cfg.family == "seq":
        hist = data.history_matrix(data.train, cfg.hist_len)
        return (
            (jnp.asarray(hist[combined["user"]]), jnp.asarray(combined["item"])),
            y,
        )
    raise ValueError(cfg.family)


def measure(name: str, data: MovieLens100K) -> dict:
    cfg = PRESETS[name]
    model = build_model(cfg, data)
    trainer = Trainer(
        model,
        TrainConfig(
            learning_rate=cfg.learning_rate,
            weight_decay=cfg.weight_decay,
            epochs=EPOCHS,
            track_metrics=False,
            compute_dtype=COMPUTE_DTYPE.get(name),
        ),
    )
    batch, y = _train_batch(data, name)
    rng = jax.random.PRNGKey(0)

    res = trainer.fit(rng, (batch, y))  # compile + warm
    jax.block_until_ready(res.params)
    t0 = time.perf_counter()
    res = trainer.fit(rng, (batch, y))
    jax.block_until_ready(res.params)
    dt = time.perf_counter() - t0

    n = int(y.shape[0])
    eps = n * EPOCHS / dt
    return {
        "compute_dtype": COMPUTE_DTYPE.get(name) or "float32",
        "examples_per_epoch": n,
        "sec_total": dt,
        "examples_per_sec": eps,
        "speedup_vs_reference": eps / REFERENCE_EXAMPLES_PER_SEC[name],
        "final_loss": float(res.history["train_loss"][-1]),
    }


def main() -> None:
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    details = {}
    for name in ("deepfm", "din"):
        details[name] = measure(name, data)

    speedups = [details[m]["speedup_vs_reference"] for m in details]
    geo = 1.0
    for s in speedups:
        geo *= s
    geo **= 1.0 / len(speedups)

    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip (DeepFM ml-100k full-batch; vs_baseline = geomean DeepFM+DIN speedup over torch-CPU reference)",
                "value": round(details["deepfm"]["examples_per_sec"], 1),
                "unit": "examples/s/chip",
                "vs_baseline": round(geo, 2),
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
