"""Quality validation of the fused training kernels at reference epochs.

Trains DIN (f32 XLA / bf16 XLA / bf16 fused-head) and AFM (f32 XLA /
f32 fused-attention) with reference hyperparameters and records final quality
-- the done-criterion for shipping the kernels as bench defaults is fused
quality within seed variance of the XLA path it replaces. Writes
FUSED_QUALITY.json.

    python tools/run_fused_quality.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data.movielens import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    run_experiment,
)

OUT = "FUSED_QUALITY.json"


def summarize(res):
    f = res.final_metrics()
    return {
        "test_auc": f["test_auc"],
        "test_auc_raw": f["test_auc_raw"],
        "train_loss": f["train_loss"],
        "test_recall@50": res.ranking["test"]["recall"],
        "test_ndcg@50": res.ranking["test"]["ndcg"],
        "train_time_s": res.train_time_s,
    }


VARIANTS = {
    "din": [
        ("f32_xla", {}),
        ("bf16_xla", {"compute_dtype": "bfloat16"}),
        (
            "bf16_fused",
            {
                "compute_dtype": "bfloat16",
                "model_kwargs": {"fused_head": True, "matmul_gather_bwd": True},
            },
        ),
    ],
    "afm": [
        ("f32_xla", {}),
        ("f32_fused", {"model_kwargs": {"fused_attention": True}}),
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["din", "afm"])
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    try:
        with open(OUT) as fh:
            results = json.load(fh)
    except FileNotFoundError:
        results = {}

    data = MovieLens100K(DEFAULT_DATA, seed=args.seed)
    for name in args.models:
        row = results.get(name, {})
        for tag, ov in VARIANTS[name]:
            overrides = dict(ov)
            overrides["seed"] = args.seed
            if args.epochs:
                overrides["epochs"] = args.epochs
            if "model_kwargs" in overrides:
                overrides["model_kwargs"] = dict(
                    PRESETS[name].model_kwargs, **overrides["model_kwargs"]
                )
            if PRESETS[name].family == "seq":
                overrides["full_history_serving"] = False
            cfg = PRESETS[name].replace(**overrides)
            res = run_experiment(cfg, data=data)
            row[tag] = summarize(res)
            print(name, tag, row[tag], flush=True)
        results[name] = row
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
