"""Quality campaign: run every model preset end-to-end, record final metrics.

Writes PARITY.json incrementally ({model: {final pointwise metrics, ranking
valid/test, examples/s, train seconds}}) so partial runs are preserved.

    python tools/run_parity.py                 # all presets, preset epochs
    python tools/run_parity.py --models mf lr  # subset
    python tools/run_parity.py --epochs 20     # quick pass
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

enable_compilation_cache()

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS  # noqa: E402
from deeplearningrecommendationsystem_tpu.data import MovieLens100K  # noqa: E402
from deeplearningrecommendationsystem_tpu.experiments import (  # noqa: E402
    DEFAULT_DATA,
    run_experiment,
)

OUT = "PARITY.json"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=sorted(PRESETS))
    ap.add_argument("--epochs", type=int, help="override preset epochs (quick mode)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    try:
        with open(OUT) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}

    data = MovieLens100K(DEFAULT_DATA, seed=args.seed)
    for name in args.models:
        cfg = PRESETS[name].replace(seed=args.seed)
        if args.epochs:
            cfg = cfg.replace(epochs=args.epochs)
        t0 = time.time()
        print(f"=== {name} (epochs={cfg.epochs}) ===", flush=True)
        try:
            res = run_experiment(cfg, data=data)
            results[name] = {
                "epochs": cfg.epochs,
                "final": res.final_metrics(),
                "ranking": res.ranking,
                "examples_per_sec": res.examples_per_sec,
                "train_time_s": res.train_time_s,
                "wall_s": time.time() - t0,
            }
            f = res.final_metrics()
            print(
                f"  test_auc={f.get('test_auc'):.4f} test_auc_raw={f.get('test_auc_raw'):.4f} "
                f"recall@50={res.ranking['test']['recall']:.4f} "
                f"ndcg@50={res.ranking['test']['ndcg']:.4f} "
                f"({res.examples_per_sec:,.0f} ex/s)",
                flush=True,
            )
        except Exception:
            results[name] = {"error": traceback.format_exc()[-2000:]}
            print(f"  FAILED:\n{traceback.format_exc()[-800:]}", flush=True)
        with open(OUT, "w") as fh:
            json.dump(results, fh, indent=2)
    print("done ->", OUT)


if __name__ == "__main__":
    main()
