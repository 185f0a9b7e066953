"""Serving benchmark: full-catalog scoring + top-k for all users.

Compares this framework's tiled on-device catalog scorer against the
measured reference serving loop (tools/measure_reference_serving.py:
DeepFM ~22 s, MF ~53 ms on CPU for all 943 users). Writes SERVING_BENCH.json.
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

from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA  # noqa: E402
from deeplearningrecommendationsystem_tpu.eval.recommend import top_k_unseen  # noqa: E402
from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC  # noqa: E402
from deeplearningrecommendationsystem_tpu.models import (  # noqa: E402
    DeepFM,
    DIN,
    MatrixFactorization,
    ServingContext,
)

REFERENCE_S = {"deepfm": 22.0, "mf": 0.0526}  # measured torch-CPU serving


def timeit(fn, iters=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    ctx = ServingContext(
        user_features=jnp.asarray(data.user_features),
        item_features=jnp.asarray(data.item_features),
        history=jnp.asarray(data.history_matrix(data.data, 10)),
    )
    seen = jnp.asarray(data.seen_mask(data.train))
    results = {}

    for name, model in (
        ("deepfm", DeepFM(ML100K_SPEC)),
        ("mf", MatrixFactorization(943, 1682, 64)),
        ("din", DIN(1682, 64)),
    ):
        params = model.init(jax.random.PRNGKey(0))
        fn = jax.jit(lambda p=params, m=model: top_k_unseen(m.score_catalog(p, ctx), seen, 50))
        dt = timeit(fn)
        entry = {"seconds_all_users": dt, "users_per_sec": 943 / dt}
        if name in REFERENCE_S:
            entry["speedup_vs_reference"] = REFERENCE_S[name] / dt
        results[name] = entry
        print(name, json.dumps(entry))

    with open("SERVING_BENCH.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
