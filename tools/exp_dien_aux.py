"""DIEN extension experiment: AUGRU + auxiliary loss vs the parity DIEN.

VERDICT r1 #9 done-criterion: DIEN(use_augru, aux) >= parity DIEN auc_raw on
ml-100k. Trains both at the reference hyperparameters (200 epochs) and writes
AUX_EXPERIMENT.json.

    python tools/exp_dien_aux.py [--aux-weight 0.5]
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


def summarize(res):
    f = res.final_metrics()
    return {
        "test_auc": f["test_auc"],
        "test_auc_raw": f["test_auc_raw"],
        "valid_auc_raw": f["valid_auc_raw"],
        "test_recall@50": res.ranking["test"]["recall"],
        "test_ndcg@50": res.ranking["test"]["ndcg"],
        "train_time_s": res.train_time_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aux-weight", type=float, default=0.5)
    ap.add_argument(
        "--sweep", type=float, nargs="*", default=None,
        help="additional aux weights to sweep (quality only)",
    )
    ap.add_argument("--epochs", type=int, help="override (default 200)")
    ap.add_argument(
        "--warm", action="store_true",
        help="run each config twice and report the SECOND train time "
        "(first run pays the whole-scan compile; the ≤2x-of-parity "
        "train-cost criterion is about steady-state, not compile)",
    )
    args = ap.parse_args()

    data = MovieLens100K(DEFAULT_DATA, seed=0)
    results = {"aux_weight": args.aux_weight}
    base = PRESETS["dien"]
    if args.epochs:
        base = base.replace(epochs=args.epochs)
    # fixed-window serving for a same-cost comparison of the training change
    base = base.replace(full_history_serving=False)

    def run_one(cfg):
        res = run_experiment(cfg, data=data)
        row = summarize(res)
        if args.warm:
            warm = run_experiment(cfg, data=data)
            row["train_time_s"] = warm.train_time_s
        return row

    aux_cfg = lambda w: base.replace(  # noqa: E731
        aux_weight=w, model_kwargs=dict(base.model_kwargs, use_augru=True)
    )
    for name, cfg in (
        ("parity", base),
        ("augru_aux", aux_cfg(args.aux_weight)),
    ):
        results[name] = run_one(cfg)
        print(name, results[name], flush=True)

    for w in args.sweep or ():
        results.setdefault("sweep", {})[str(w)] = run_one(aux_cfg(w))
        print("sweep", w, results["sweep"][str(w)], flush=True)

    results["auc_raw_delta"] = (
        results["augru_aux"]["test_auc_raw"] - results["parity"]["test_auc_raw"]
    )
    results["train_time_ratio"] = (
        results["augru_aux"]["train_time_s"] / results["parity"]["train_time_s"]
    )
    with open("AUX_EXPERIMENT.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote AUX_EXPERIMENT.json; delta:", results["auc_raw_delta"],
          "time ratio:", results["train_time_ratio"])


if __name__ == "__main__":
    main()
