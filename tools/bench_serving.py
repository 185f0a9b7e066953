"""Serving benchmark: full-catalog scoring + top-k for all users.

Compares this framework's tiled on-device catalog scorer against the
measured reference serving loop (tools/measure_reference_serving.py, same
host, recorded in BASELINE_MEASURED.json). Writes SERVING_BENCH.json.

DIN caveat: the reference scores each user's FULL unpadded history
(model/din.py:55-66; mean length ~106 on ml-100k), while this framework
serves with a fixed masked window. We report hist_len=10 (the training-time
semantics, what our quality campaign used) AND hist_len=128 (covers ~75% of
users' full histories -- the closer-to-equal-work comparison).
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

def _reference_seconds():
    """Same-host torch-CPU serving times (tools/measure_reference_serving.py)."""
    try:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BASELINE_MEASURED.json")) as f:
            serving = json.load(f).get("serving", {})
        return {
            k.replace("_serving_all_users_s", ""): v for k, v in serving.items()
        }
    except FileNotFoundError:
        return {}


REFERENCE_S = _reference_seconds()


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

    ctx128 = ServingContext(
        user_features=ctx.user_features,
        item_features=ctx.item_features,
        history=jnp.asarray(data.history_matrix(data.data, 128)),
    )

    for name, model, c in (
        ("deepfm", DeepFM(ML100K_SPEC), ctx),
        ("mf", MatrixFactorization(943, 1682, 64), ctx),
        ("din", DIN(1682, 64), ctx),
        ("din_hist128", DIN(1682, 64), ctx128),
    ):
        params = model.init(jax.random.PRNGKey(0))
        fn = jax.jit(
            lambda p=params, m=model, c=c: top_k_unseen(m.score_catalog(p, c), seen, 50)
        )
        dt = timeit(fn)
        entry = {"seconds_all_users": dt, "users_per_sec": 943 / dt}
        ref_key = name.split("_")[0]
        if ref_key in REFERENCE_S:
            entry["speedup_vs_reference"] = REFERENCE_S[ref_key] / dt
        results[name] = entry
        print(name, json.dumps(entry))

    results["notes"] = {
        "reference_seconds_same_host": REFERENCE_S,
        "din": "reference scores FULL per-user histories (mean ~106); "
        "din = hist_len 10 (training semantics), din_hist128 = closer-to-"
        "equal-work window",
    }
    with open("SERVING_BENCH.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
