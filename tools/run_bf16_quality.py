"""bf16-vs-f32 quality + speed comparison at reference hyperparameters.

Trains each preset twice (pure f32 and compute_dtype=bfloat16 with f32
master weights; selective-precision terms per model -- DeepFM's FM sum-square
and NFM's bi-interaction stay f32, models/deepfm.py / models/nfm.py) and
records final quality + throughput. Writes BF16_QUALITY.json, read by
bench.py's COMPUTE_DTYPE policy and docs/performance.md.

    python tools/run_bf16_quality.py --models din deepfm widedeep nfm pnn
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

OUT = "BF16_QUALITY.json"


def summarize(res):
    f = res.final_metrics()
    return {
        "test_auc": f["test_auc"],
        "test_auc_raw": f["test_auc_raw"],
        "train_loss": f["train_loss"],
        "test_recall@50": res.ranking["test"]["recall"],
        "test_ndcg@50": res.ranking["test"]["ndcg"],
        "examples_per_sec": res.examples_per_sec,
        "train_time_s": res.train_time_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models", nargs="+", default=["din", "deepfm", "widedeep", "nfm", "pnn"]
    )
    ap.add_argument("--epochs", type=int, help="override (default: preset epochs)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    try:
        with open(OUT) as fh:
            results = json.load(fh)
        if "model" in results:  # migrate the round-1 single-model format
            results = {results["model"]: {"legacy": results}}
    except FileNotFoundError:
        results = {}

    data = MovieLens100K(DEFAULT_DATA, seed=args.seed)
    for name in args.models:
        row = {}
        for dtype in (None, "bfloat16"):
            overrides = {"compute_dtype": dtype, "seed": args.seed}
            if args.epochs:
                overrides["epochs"] = args.epochs
            # seq serving is irrelevant to the precision comparison; use the
            # fast fixed-window path
            if PRESETS[name].family == "seq":
                overrides["full_history_serving"] = False
            cfg = PRESETS[name].replace(**overrides)
            res = run_experiment(cfg, data=data)
            row[dtype or "float32"] = summarize(res)
            print(name, dtype or "float32", row[dtype or "float32"], flush=True)
        row["speedup_bf16"] = (
            row["bfloat16"]["examples_per_sec"] / row["float32"]["examples_per_sec"]
        )
        row["auc_raw_delta"] = (
            row["bfloat16"]["test_auc_raw"] - row["float32"]["test_auc_raw"]
        )
        results[name] = row
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=2)
        print(
            f"{name}: bf16 {row['speedup_bf16']:.2f}x speed, "
            f"auc_raw delta {row['auc_raw_delta']:+.4f}",
            flush=True,
        )
    print("wrote", OUT)


if __name__ == "__main__":
    main()
