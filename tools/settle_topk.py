"""Settle the ml-100k fused-top-k contradiction (VERDICT r3 next #4).

KERNEL_BENCH.json (r3) recorded the fused Pallas serving top-k WINNING at
1.14x on ml-100k, while serving.py's docstring (and the r2-era measurement it
cited) said it LOSES at 0.93x. This re-measures XLA vs fused vs two-stage at
the ml-100k shape with 5 independent timeit repetitions on an idle host and
writes the full noise band into KERNEL_BENCH.json under
``serving_topk_ml100k_repeats`` so the default policy can follow the
reproducible winner (or be declared a noise-band tie).

Run solo on an idle host: python tools/settle_topk.py
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

from deeplearningrecommendationsystem_tpu.ops.pallas import (  # noqa: E402
    topk_serve_matmul,
    topk_two_stage,
)

REPEATS = 5
ITERS = 20


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    U, I, D, k = 943, 1682, 64, 50
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    P = jax.random.normal(k1, (U, D))
    Q = jax.random.normal(k2, (I, D))
    seen = jax.random.uniform(k3, (U, I)) < 0.05

    xla = jax.jit(lambda P, Q, s: jax.lax.top_k(jnp.where(s, -1e30, P @ Q.T), k))
    fused = jax.jit(
        lambda P, Q, s: topk_serve_matmul(P, Q, s, k=k, tile=256, chunk=512)
    )
    two = jax.jit(lambda P, Q, s: topk_two_stage(P, Q, s, k=k))

    print("compiling xla path...", flush=True)
    xv, xi = xla(P, Q, seen)
    jax.block_until_ready(xi)
    print("compiling fused kernel...", flush=True)
    pv, pi = fused(P, Q, seen)
    jax.block_until_ready(pi)
    print("compiling two-stage...", flush=True)
    jax.block_until_ready(two(P, Q, seen))
    assert jnp.array_equal(xi, pi), "fused indices mismatch"

    rows = {"xla_ms": [], "fused_ms": [], "two_stage_ms": []}
    for r in range(REPEATS):
        rows["xla_ms"].append(timeit(xla, P, Q, seen) * 1e3)
        rows["fused_ms"].append(timeit(fused, P, Q, seen) * 1e3)
        rows["two_stage_ms"].append(timeit(two, P, Q, seen) * 1e3)
        print(
            f"rep {r}: xla {rows['xla_ms'][-1]:.3f} ms  "
            f"fused {rows['fused_ms'][-1]:.3f} ms  "
            f"two-stage {rows['two_stage_ms'][-1]:.3f} ms",
            flush=True,
        )

    best = {name: min(v) for name, v in rows.items()}
    med = {name: sorted(v)[len(v) // 2] for name, v in rows.items()}
    summary = {
        "shape": [U, I, D, k],
        "repeats": REPEATS,
        "iters_per_repeat": ITERS,
        "all_ms": rows,
        "best_ms": best,
        "median_ms": med,
        "fused_speedup_best": best["xla_ms"] / best["fused_ms"],
        "fused_speedup_median": med["xla_ms"] / med["fused_ms"],
        "winner_best": min(best, key=best.get),
        "winner_median": min(med, key=med.get),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "KERNEL_BENCH.json")
    with open(path) as f:
        results = json.load(f)
    results["serving_topk_ml100k_repeats"] = summary
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
