"""Probe: one-hot-matmul gathers on the SERVING path (catalog scorers).

The catalog scorers run the forward under ``lax.map`` -- the same in-scan
native-gather emitter that cost MF/FFM training 1.4-1.8x
(MF_LAYOUT_PROBE.json / ONEHOT_FWD_PROBE.json). This times full-catalog
scoring + top-k for all users with and without the
``onehot_gather_fwd`` trace context (forward-only; no backward in serving).
Writes ONEHOT_SERVING_PROBE.json. Run SOLO.
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
    AFM,
    DCN,
    DeepCrossing,
    DeepFM,
    DIN,
    FFM,
    NeuralCF,
    NFM,
    PNN,
    ServingContext,
    WideDeep,
)
from deeplearningrecommendationsystem_tpu.parallel.ep import onehot_gather_fwd  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ONEHOT_SERVING_PROBE.json")


def timeit(fn, iters=10, repeats=5):
    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def main():
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    ctx = ServingContext(
        user_features=jnp.asarray(data.user_features),
        item_features=jnp.asarray(data.item_features),
        history=jnp.asarray(data.history_matrix(data.data, 10)),
    )
    seen = jnp.asarray(data.seen_mask(data.train))
    try:
        out = json.load(open(OUT))
    except FileNotFoundError:
        out = {}

    if "din_full" in (sys.argv[1:] or ["deepfm", "neuralcf", "din", "din_full"]):
        # the reference-semantics full-variable-history scorer (the 2.2 s
        # serving row): host-bucketed, so time as a python callable with the
        # trace context live across the in-bucket lax.map programs
        padded = data.itemid_matrix(data.data)
        ctx_full = ServingContext(
            user_features=ctx.user_features,
            item_features=ctx.item_features,
            full_histories=[row[row >= 0] for row in padded],
        )
        model = DIN(1682, 64)
        params = model.init(jax.random.PRNGKey(0))
        row = {}
        for onehot in (False, True):
            def score():
                return top_k_unseen(
                    model.score_catalog(params, ctx_full), seen, 50
                )

            if onehot:
                with onehot_gather_fwd():
                    row["onehot_s"] = timeit(score, iters=1, repeats=3)
            else:
                row["default_s"] = timeit(score, iters=1, repeats=3)
        row["speedup"] = row["default_s"] / row["onehot_s"]
        out["din_full"] = row
        print("din_full", row, flush=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    only = sys.argv[1:] or ["deepfm", "neuralcf", "din", "din_full"]
    for name, model in (
        ("deepfm", DeepFM(ML100K_SPEC)),
        ("neuralcf", NeuralCF(943, 1682)),
        ("din", DIN(1682, 64)),
        ("ffm", FFM(ML100K_SPEC)),
        ("widedeep", WideDeep(ML100K_SPEC)),
        ("nfm", NFM(ML100K_SPEC)),
        ("pnn", PNN(ML100K_SPEC)),
        ("deepcrossing", DeepCrossing(ML100K_SPEC)),
        ("deepcross", DCN(ML100K_SPEC)),
        ("afm", AFM(ML100K_SPEC)),
    ):
        if name not in only:
            continue
        params = model.init(jax.random.PRNGKey(0))
        row = {}
        for onehot in (False, True):
            def score(p=params, m=model):
                return top_k_unseen(m.score_catalog(p, ctx), seen, 50)

            if onehot:
                with onehot_gather_fwd():
                    fn = jax.jit(score).lower().compile()
            else:
                fn = jax.jit(score).lower().compile()
            row["onehot_s" if onehot else "default_s"] = timeit(fn)
        row["speedup"] = row["default_s"] / row["onehot_s"]
        out[name] = row
        print(name, row, flush=True)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({k: v["speedup"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
