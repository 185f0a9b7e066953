"""Quickstart: train a model, evaluate it, and serve recommendations.

    python examples/quickstart.py [--model deepfm] [--epochs 30]

Walks the full API surface: data pipeline -> negative sampling -> compiled
full-batch training -> pointwise + ranking metrics -> persistent Recommender.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import DEFAULT_DATA, run_experiment  # noqa: E402
from deeplearningrecommendationsystem_tpu.models import ServingContext  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import build_model  # noqa: E402
from deeplearningrecommendationsystem_tpu.serving import Recommender  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deepfm", choices=sorted(PRESETS))
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    # 1) one call runs the whole reference-equivalent pipeline
    cfg = PRESETS[args.model].replace(epochs=args.epochs)
    data = MovieLens100K(DEFAULT_DATA, seed=0)
    result = run_experiment(cfg, data=data)

    print(f"== {args.model} after {args.epochs} epochs ==")
    final = result.final_metrics()
    print(f"test AUC (reference def): {final['test_auc']:.4f}")
    print(f"test AUC (true ranking): {final['test_auc_raw']:.4f}")
    print(f"test recall@{cfg.k}: {result.ranking['test']['recall']:.4f}")
    print(f"throughput: {result.examples_per_sec:,.0f} examples/s")

    # 2) persistent serving: exclude already-seen items, query top-10s
    ctx = ServingContext(
        user_features=jnp.asarray(data.user_features),
        item_features=jnp.asarray(data.item_features),
        history=jnp.asarray(data.history_matrix(data.data, cfg.hist_len)),
        rating_matrix=None,
    )
    model = build_model(cfg, data)
    rec = Recommender(model, result.params, ctx, seen=data.seen_mask(data.train))
    top10 = rec.top_k(10, users=[0, 1, 2])
    for u, items in zip([0, 1, 2], top10):
        print(f"user {u}: top-10 unseen items -> {items.tolist()}")


if __name__ == "__main__":
    main()
