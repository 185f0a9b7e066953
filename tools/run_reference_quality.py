"""Run the reference's own training pipelines to completion on CPU and
record final quality (pointwise metrics + ranking@50) for parity comparison.

Drives the reference's modules (imported from /root/reference) exactly as its
entry scripts do, but collects metrics instead of printing them. Appends to
REFERENCE_QUALITY.json. Slow (CPU, full epochs) -- run a model subset:

    python tools/run_reference_quality.py --models mf lr deepfm
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import torch  # noqa: E402
from sklearn.metrics import roc_auc_score  # noqa: E402

DATA = "/root/reference/dataset_example/ml-100k"
OUT = "REFERENCE_QUALITY.json"


def pointwise(y, p):
    from evaluator.evaluator import Evaluator

    m = Evaluator.eval(y, p)
    y_np = y.cpu().numpy()
    p_np = p.cpu().detach().numpy()
    return {
        "accuracy": m[0], "precision": m[1], "recall": m[2], "f1": m[3],
        "auc": m[4], "auc_raw": float(roc_auc_score(y_np, p_np)),
    }


def ranking_eval(real, rec, k=50):
    from evaluator.ranking import Ranking

    r = Ranking(real, rec, k)
    precision, recall, f1 = r.precision_recall_f1()
    return {
        "precision": precision, "recall": recall, "f1": f1,
        "map": float(r.mapk()), "ndcg": float(r.mean_ndcg()), "mrr": float(r.mrr()),
    }


def run_mf(epochs=100):
    from data.reader import MovieLens100K
    from model.mf import MatrixFactorization
    from sampler.sampler import Sampler
    from trainer.trainer import Trainer

    data = MovieLens100K(DATA)
    tu, ti, tr = data.train_interaction()
    vu, vi, vr = data.valid_interaction()
    su, si, sr = data.test_interaction()
    excluded = set(zip(tu.numpy(), ti.numpy())) | set(zip(vu.numpy(), vi.numpy())) | set(
        zip(su.numpy(), si.numpy())
    )
    def neg(n):
        a, b, c = Sampler().negative_sampling(data.num_users, data.num_items, excluded, n)
        return a, b, c
    na, nb, nc = neg(180)
    u = torch.cat([tu, na]); i = torch.cat([ti, nb]); r = torch.cat([tr.float(), nc])
    va, vb, vc = neg(60)
    u2 = torch.cat([vu, va]); i2 = torch.cat([vi, vb]); r2 = torch.cat([vr.float(), vc])
    sa, sb, sc = neg(60)
    u3 = torch.cat([su, sa]); i3 = torch.cat([si, sb]); r3 = torch.cat([sr.float(), sc])
    model = MatrixFactorization(data.num_users, data.num_items, 64)
    t = Trainer(model, torch.nn.BCELoss(),
                torch.optim.Adam(model.parameters(), lr=0.01, weight_decay=1e-5))
    for _ in range(epochs):
        t.train_loop(u, i, train_rating=r)
    with torch.no_grad():
        p_t = model(u, i); p_v = model(u2, i2); p_s = model(u3, i3)
    final = {f"test_{k}": v for k, v in pointwise(r3, p_s).items()}
    final.update({f"valid_{k}": v for k, v in pointwise(r2, p_v).items()})
    final.update({f"train_{k}": v for k, v in pointwise(r, p_t).items()})

    rec = model.recommendation(data.num_users, data.num_items)
    train_df = pd.DataFrame({"user_id": tu.numpy(), "item_id": ti.numpy()})
    valid_df = pd.DataFrame({"user_id": vu.numpy(), "item_id": vi.numpy()})
    test_df = pd.DataFrame({"user_id": su.numpy(), "item_id": si.numpy()})
    tr_real = data.itemid_matrix(train_df)
    va_real = data.itemid_matrix(valid_df)
    te_real = data.itemid_matrix(test_df)
    te_roc = data.remove_itemid(data.remove_itemid(rec, tr_real), va_real)
    va_roc = data.remove_itemid(data.remove_itemid(rec, tr_real), te_real)
    return final, {"valid": ranking_eval(va_real, va_roc), "test": ranking_eval(te_real, te_roc),
                   "valid@10": ranking_eval(va_real, va_roc, k=10), "test@10": ranking_eval(te_real, te_roc, k=10)}


def run_feature(model_name, epochs, n_neg, make_model, lr, wd):
    from data.reader import MovieLens100K
    from sampler.sampler import Sampler
    from trainer.trainer import Trainer

    data = MovieLens100K(DATA)
    train_set = set(zip(data.train["user_id"], data.train["item_id"]))
    valid_set = set(zip(data.valid["user_id"], data.valid["item_id"]))
    test_set = set(zip(data.test["user_id"], data.test["item_id"]))
    excluded = train_set | valid_set | test_set

    def build(split, n):
        negd = Sampler().negative_sampling2(data.num_users, data.num_items, excluded, n)
        comb = pd.concat([split, negd], axis=0).reset_index(drop=True)
        feat = data.feature(comb)
        rating = torch.tensor(feat.iloc[:, 2].values, dtype=torch.float32).unsqueeze(1)
        feat = feat.drop(columns=["rating"])
        return torch.tensor(feat.values, dtype=torch.float32), rating

    xt, yt = build(data.train, n_neg[0])
    xv, yv = build(data.valid, n_neg[1])
    xs, ys = build(data.test, n_neg[2])
    model = make_model(data)
    t = Trainer(model, torch.nn.BCELoss(),
                torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd))
    for _ in range(epochs):
        t.train_loop(xt, train_rating=yt)
    with torch.no_grad():
        p_t = model(xt); p_v = model(xv); p_s = model(xs)
    final = {f"test_{k}": v for k, v in pointwise(ys, p_s).items()}
    final.update({f"valid_{k}": v for k, v in pointwise(yv, p_v).items()})
    final.update({f"train_{k}": v for k, v in pointwise(yt, p_t).items()})

    rec = model.recommendation(data.num_users, data.user_item(), data.num_items)
    tr_real = data.itemid_matrix(data.train)
    va_real = data.itemid_matrix(data.valid)
    te_real = data.itemid_matrix(data.test)
    te_roc = data.remove_itemid(data.remove_itemid(rec, tr_real), va_real)
    va_roc = data.remove_itemid(data.remove_itemid(rec, tr_real), te_real)
    return final, {"valid": ranking_eval(va_real, va_roc), "test": ranking_eval(te_real, te_roc),
                   "valid@10": ranking_eval(va_real, va_roc, k=10), "test@10": ranking_eval(te_real, te_roc, k=10)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["mf", "lr", "deepfm"])
    ap.add_argument("--epochs", type=int, help="override epochs")
    args = ap.parse_args()

    try:
        with open(OUT) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}

    for name in args.models:
        t0 = time.time()
        print(f"=== reference {name} ===", flush=True)
        try:
            if name == "mf":
                final, rank = run_mf(args.epochs or 100)
            elif name == "lr":
                from model.lr import LogisticRegression

                final, rank = run_feature(
                    "lr", args.epochs or 100, (10, 10, 10),
                    lambda d: LogisticRegression(d.num_users, d.num_items, 43), 0.05, 0.0,
                )
            elif name == "deepfm":
                from model.deepfm import DeepFM

                final, rank = run_feature(
                    "deepfm", args.epochs or 200, (30, 10, 10),
                    lambda d: DeepFM(d.num_users, d.num_items, [512, 256, 128, 1], 128),
                    1e-3, 1e-5,
                )
            elif name == "widedeep":
                from model.widedeep import WideDeep

                final, rank = run_feature(
                    "widedeep", args.epochs or 100, (30, 10, 10),
                    lambda d: WideDeep(d.num_users, d.num_items, [512, 256, 128, 1], 128),
                    1e-3, 1e-5,
                )
            else:
                print("  unknown model, skipping")
                continue
            results[name] = {"final": final, "ranking": rank, "wall_s": time.time() - t0}
            print(
                f"  test_auc={final['test_auc']:.4f} auc_raw={final['test_auc_raw']:.4f} "
                f"R@50={rank['test']['recall']:.4f} NDCG@50={rank['test']['ndcg']:.4f} "
                f"({time.time()-t0:.0f}s)", flush=True,
            )
        except Exception as e:
            import traceback

            results[name] = {"error": traceback.format_exc()[-1000:]}
            print("  FAILED", e, flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    print("done ->", OUT)


if __name__ == "__main__":
    main()
