"""Serving benchmark: full-catalog scoring + top-k for all users.

Compares this framework's tiled on-device catalog scorer against the
measured reference serving loop (tools/measure_reference_serving.py, same
host, recorded in BASELINE_MEASURED.json). Writes SERVING_BENCH.json.

DIN rows: ``din`` = fixed hist_len-10 window (training-time semantics);
``din_full`` = the reference's exact semantics -- every user's COMPLETE
variable-length history through the bucketed scorer
(models/base.py::catalog_scores_full_history), the apples-to-apples row
against the reference's 485 s loop. ``mf_pallas_topk`` = the fused
score+mask+top-k kernel (ops/pallas/serving_topk.py).
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
    AutoRec,
    DeepFM,
    DIN,
    MatrixFactorization,
    NeuralCF,
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


def _scoped_call(model, ctx, fn):
    from deeplearningrecommendationsystem_tpu.serving import onehot_serving_scope

    with onehot_serving_scope(model, ctx):
        return fn()


def timeit(fn, iters=10, repeats=5):
    """Per-row repeat/spread record (VERDICT r4 weak #7: ms-scale serving
    rows move ~±25% between relay windows -- record the spread instead of
    shipping a single-window best). Each repeat times a group of ``iters``
    calls with ONE trailing block (per-call syncs cost ~30 ms on this relay,
    CLAUDE.md r4); the row quotes the MEDIAN of the repeats."""
    out = fn()
    jax.block_until_ready(out)  # warm / compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    med = times[len(times) // 2]
    return {
        "median_s": med,
        "min_s": times[0],
        "max_s": times[-1],
        "spread_frac": (times[-1] - times[0]) / times[0],
        "repeats": repeats,
        "iters_per_repeat": iters,
    }


def main():
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    ctx = ServingContext(
        user_features=jnp.asarray(data.user_features),
        item_features=jnp.asarray(data.item_features),
        history=jnp.asarray(data.history_matrix(data.data, 10)),
    )
    seen = jnp.asarray(data.seen_mask(data.train))
    results = {}

    padded = data.itemid_matrix(data.data)
    ctx_full = ServingContext(
        user_features=ctx.user_features,
        item_features=ctx.item_features,
        full_histories=[row[row >= 0] for row in padded],
    )
    from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler

    negatives = NegativeSampler(data.seen_mask(data.data), seed=0).sample(150)
    ctx_matrix = ServingContext(
        user_features=ctx.user_features,
        item_features=ctx.item_features,
        rating_matrix=jnp.asarray(data.rating_matrix(negatives)),
    )

    for name, model, c, jit_ok in (
        ("deepfm", DeepFM(ML100K_SPEC), ctx, True),
        ("mf", MatrixFactorization(943, 1682, 64), ctx, True),
        ("neuralcf", NeuralCF(943, 1682), ctx, True),
        ("autorec", AutoRec(num_input=1682), ctx_matrix, True),
        ("din", DIN(1682, 64), ctx, True),
        # full-history scorer buckets on host -> time as a python callable
        ("din_full", DIN(1682, 64), ctx_full, False),
    ):
        params = model.init(jax.random.PRNGKey(0))
        from deeplearningrecommendationsystem_tpu.serving import onehot_serving_scope

        fn = lambda p=params, m=model, c=c: top_k_unseen(m.score_catalog(p, c), seen, 50)  # noqa: E731
        with onehot_serving_scope(model, c):  # measured-winner policy, traces here
            if jit_ok:
                fn = jax.jit(fn).lower().compile()
            else:
                # host-bucketed scorer: programs trace per call; keep the
                # scope live by re-entering inside the timed callable
                inner = fn
                fn = lambda m=model, c=c, f=inner: _scoped_call(m, c, f)  # noqa: E731
        rec = (
            timeit(fn, iters=1, repeats=3)
            if name == "din_full"  # host-bucketed, ~2 s/call
            else timeit(fn)
        )
        dt = rec["median_s"]
        entry = {"seconds_all_users": dt, "users_per_sec": 943 / dt, **rec}
        ref_key = name.split("_")[0]
        if ref_key in REFERENCE_S:
            entry["speedup_vs_reference"] = REFERENCE_S[ref_key] / dt
        results[name] = entry
        print(name, json.dumps(entry), flush=True)

    # fused Pallas score+mask+top-k on the MF factors (the default TPU
    # Recommender path, serving.py)
    if jax.default_backend() == "tpu":
        from deeplearningrecommendationsystem_tpu.ops.pallas import topk_serve_matmul

        mf = MatrixFactorization(943, 1682, 64)
        params = mf.init(jax.random.PRNGKey(0))
        fn = jax.jit(
            lambda: topk_serve_matmul(params["user"], params["item"], seen, k=50)
        )
        rec = timeit(fn)
        dt = rec["median_s"]
        results["mf_pallas_topk"] = {
            "seconds_all_users": dt,
            "users_per_sec": 943 / dt,
            "speedup_vs_reference": REFERENCE_S.get("mf", 0) / dt if "mf" in REFERENCE_S else None,
            **rec,
        }
        print("mf_pallas_topk", json.dumps(results["mf_pallas_topk"]), flush=True)

    results["notes"] = {
        "reference_seconds_same_host": REFERENCE_S,
        "din": "din = hist_len-10 window (training semantics); din_full = the "
        "reference's exact full-variable-history semantics (bucketed scorer), "
        "compare to the reference's 485 s python loop",
    }
    with open("SERVING_BENCH.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
