"""CLI for the classic-CF scripts (UserCF / ItemCF / GDCF).

The reference ships these as three standalone repo-root scripts with
hardcoded absolute Windows paths (UserCF_Final.py:11, ItemCF_Final.py:11,
GDCF_Final.py:13). Here they share one entry point over the same u?.base /
u?.test folds:

    python -m deeplearningrecommendationsystem_tpu.cli.cf usercf
    python -m deeplearningrecommendationsystem_tpu.cli.cf itemcf --neighbors 10 --top-n 20
    python -m deeplearningrecommendationsystem_tpu.cli.cf gdcf --fold u1 --plot curves.png

Defaults match each reference script: UserCF/ItemCF use fold ``ua``, 10
neighbors, top-20 recs (UserCF_Final.py:30,57); GDCF uses fold ``u1``,
embedding 100, Adam lr=0.01, 10 iterations, Recall/Precision/F1@50 per
iteration plus the training-curve figure (GDCF_Final.py:26-28,66,99-117).
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.cf import (
    cf_eval,
    gdcf_train,
    item_cf_recommend,
    load_base_test,
    user_cf_recommend,
)
from deeplearningrecommendationsystem_tpu.runtime.cache import enable_compilation_cache

DEFAULT_DATA = "/root/reference/dataset_example/ml-100k"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="classic CF (UserCF / ItemCF / GDCF)")
    ap.add_argument("algo", choices=["usercf", "itemcf", "gdcf"])
    ap.add_argument("--data", default=DEFAULT_DATA, help="path to ml-100k")
    ap.add_argument("--fold", help="u1..u5 / ua / ub (default: ua, gdcf: u1)")
    ap.add_argument("--neighbors", type=int, default=10, help="neighborhood size")
    ap.add_argument("--top-n", type=int, default=20, help="recommendations per user")
    ap.add_argument("--embedding-size", type=int, default=100, help="gdcf factors")
    ap.add_argument("--lr", type=float, default=0.01, help="gdcf Adam lr")
    ap.add_argument("--iterations", type=int, default=10, help="gdcf iterations")
    ap.add_argument("--k", type=int, default=50, help="gdcf ranking cutoff")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", action="store_true", help="emit a JSON summary")
    ap.add_argument(
        "--plot",
        metavar="PATH",
        help="gdcf: save the training-curve figure (GDCF_Final.py:99-117) to PATH",
    )
    args = ap.parse_args(argv)

    enable_compilation_cache()
    fold = args.fold or ("u1" if args.algo == "gdcf" else "ua")
    matrix, test_lists = load_base_test(args.data, fold)
    m = jnp.asarray(matrix)

    if args.algo == "gdcf":
        history, _ = gdcf_train(
            m,
            embedding_size=args.embedding_size,
            learning_rate=args.lr,
            iterations=args.iterations,
            top_k=args.k,
            seed=args.seed,
        )
        losses = np.asarray(history["loss"])
        recalls, precisions, f1s = [], [], []
        for it in range(args.iterations):
            r, p, f1 = cf_eval(np.asarray(history["rec"][it]), test_lists)
            recalls.append(r)
            precisions.append(p)
            f1s.append(f1)
            if not args.json:
                print(
                    f"iter {it + 1:3d}  loss={losses[it]:.4f}  "
                    f"recall@{args.k}={r:.4f}  precision@{args.k}={p:.4f}  f1={f1:.4f}"
                )
        if args.plot:
            from deeplearningrecommendationsystem_tpu.runtime.plotting import plot_history

            plot_history(
                {
                    "loss": losses,
                    f"recall@{args.k}": np.asarray(recalls),
                    f"precision@{args.k}": np.asarray(precisions),
                    "f1": np.asarray(f1s),
                },
                args.plot,
                title=f"GDCF ({fold})",
            )
            if not args.json:
                print(f"saved training curves to {args.plot}")
        summary = {
            "algo": "gdcf",
            "fold": fold,
            "loss": losses.tolist(),
            "recall": recalls[-1],
            "precision": precisions[-1],
            "f1": f1s[-1],
        }
    else:
        recommend = user_cf_recommend if args.algo == "usercf" else item_cf_recommend
        rec = np.asarray(recommend(m, k_neighbors=args.neighbors, top_n=args.top_n))
        recall, precision, f1 = cf_eval(rec, test_lists)
        summary = {
            "algo": args.algo,
            "fold": fold,
            "recall": recall,
            "precision": precision,
            "f1": f1,
        }
        if not args.json:
            print(
                f"{args.algo} ({fold}, k={args.neighbors}, top-{args.top_n}): "
                f"recall={recall:.4f}  precision={precision:.4f}  f1={f1:.4f}"
            )

    if args.json:
        print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
