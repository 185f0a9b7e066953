"""Probe: compact whole-run LR kernel vs the r3 wide whole-epoch kernel.

Times both fast_fit modes on the real ml-100k LR training batch (bench.py
shapes: B=69049, 100 epochs). Single-sync checksum timing per CLAUDE.md r4.

Run SOLO on an idle host (TPU relay timing skews under CPU contention).
Writes LR_COMPACT_PROBE.json.
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
import jax.numpy as jnp  # noqa: E402

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    build_model,
)
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402

import bench  # noqa: E402

EPOCHS = 100


def main():
    data = MovieLens100K(DEFAULT_DATA)
    cfg = PRESETS["lr"]
    model = build_model(cfg, data)
    batch, y, _ = bench._train_batch(data, "lr")
    n = int(y.shape[0])
    out = {}

    for mode in ("wide", "compact"):
        @jax.jit
        def run(key, mode=mode):
            params = model.init(key)
            p, losses = model.fast_fit(
                params, batch, y, EPOCHS, cfg.learning_rate, mode=mode
            )
            checksum = sum(
                jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(p)
            )
            return losses[-1] + 0.0 * checksum

        t0 = time.perf_counter()
        final = float(run(jax.random.PRNGKey(0)))  # compile + warm
        compile_s = time.perf_counter() - t0
        dt = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            final = float(run(jax.random.PRNGKey(0)))
            dt = min(dt, time.perf_counter() - t0)
        out[mode] = {
            "sec_total": dt,
            "ms_per_epoch": dt / EPOCHS * 1e3,
            "examples_per_sec": n * EPOCHS / dt,
            "final_loss": final,
            "first_call_s": compile_s,
        }
        print(mode, out[mode], flush=True)

    out["speedup_compact_vs_wide"] = (
        out["wide"]["sec_total"] / out["compact"]["sec_total"]
    )
    with open("LR_COMPACT_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
