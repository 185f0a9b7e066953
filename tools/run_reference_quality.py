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
SMOKE = False
EMPTY = {"valid": {}, "test": {}, "valid@10": {}, "test@10": {}}


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


def run_pair(make_model, epochs, negs, lr, wd, ratings_2d=False):
    """ID-pair pipeline shared by scripts/mf.py and scripts/neuralcf.py.

    ``ratings_2d``: neuralcf's script unsqueezes ratings to [B, 1]
    (scripts/neuralcf.py:37) to match the model's 2-D output; mf keeps [B].
    """
    from data.reader import MovieLens100K
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
    na, nb, nc = neg(negs[0])
    u = torch.cat([tu, na]); i = torch.cat([ti, nb]); r = torch.cat([tr.float(), nc])
    va, vb, vc = neg(negs[1])
    u2 = torch.cat([vu, va]); i2 = torch.cat([vi, vb]); r2 = torch.cat([vr.float(), vc])
    sa, sb, sc = neg(negs[2])
    u3 = torch.cat([su, sa]); i3 = torch.cat([si, sb]); r3 = torch.cat([sr.float(), sc])
    if ratings_2d:
        r, r2, r3 = r.unsqueeze(1), r2.unsqueeze(1), r3.unsqueeze(1)
    model = make_model(data)
    t = Trainer(model, torch.nn.BCELoss(),
                torch.optim.Adam(model.parameters(), lr=lr, weight_decay=wd))
    for _ in range(epochs):
        t.train_loop(u, i, train_rating=r)
    with torch.no_grad():
        p_t = model(u, i); p_v = model(u2, i2); p_s = model(u3, i3)
    final = {f"test_{k}": v for k, v in pointwise(r3, p_s).items()}
    final.update({f"valid_{k}": v for k, v in pointwise(r2, p_v).items()})
    final.update({f"train_{k}": v for k, v in pointwise(r, p_t).items()})

    if SMOKE:
        return final, EMPTY
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

    if SMOKE:
        return final, EMPTY
    rec = model.recommendation(data.num_users, data.user_item(), data.num_items)
    tr_real = data.itemid_matrix(data.train)
    va_real = data.itemid_matrix(data.valid)
    te_real = data.itemid_matrix(data.test)
    te_roc = data.remove_itemid(data.remove_itemid(rec, tr_real), va_real)
    va_roc = data.remove_itemid(data.remove_itemid(rec, tr_real), te_real)
    return final, {"valid": ranking_eval(va_real, va_roc), "test": ranking_eval(te_real, te_roc),
                   "valid@10": ranking_eval(va_real, va_roc, k=10), "test@10": ranking_eval(te_real, te_roc, k=10)}


def run_autorec(item_major, epochs=100):
    """Replicates scripts/autorec.py (and i-autorec.py when item_major)."""
    from sklearn.model_selection import train_test_split

    from data.reader import MovieLens100K
    from model.autorec import AutoRec
    from sampler.sampler import Sampler
    from trainer.trainer import Trainer

    data = MovieLens100K(DATA)
    excluded = set(zip(data.data["user_id"], data.data["item_id"]))
    negative = Sampler().negative_sampling2(data.num_users, data.num_items, excluded, 150)
    combined = pd.concat([data.data, negative], axis=0).reset_index(drop=True)
    if item_major:
        matrix = combined.pivot_table(index="item_id", columns="user_id",
                                      values="rating", fill_value=0.5)
        model = AutoRec(data.num_users, 256)
    else:
        matrix = combined.pivot_table(index="user_id", columns="item_id",
                                      values="rating", fill_value=0.5)
        model = AutoRec(data.num_items, 256)
    train_valid, test = train_test_split(matrix, test_size=0.2, random_state=42)
    train, valid = train_test_split(train_valid, test_size=0.25, random_state=42)
    train = torch.tensor(train.values, dtype=torch.float32)
    valid = torch.tensor(valid.values, dtype=torch.float32)
    test = torch.tensor(test.values, dtype=torch.float32)
    train_mask = train != 0.5
    valid_mask = valid != 0.5
    test_mask = test != 0.5
    t = Trainer(model, torch.nn.BCELoss(),
                torch.optim.Adam(model.parameters(), lr=0.005, weight_decay=1e-5))
    for _ in range(epochs):
        t.train_loop2(train, train_mask)

    def masked_pointwise(x, mask):
        with torch.no_grad():
            p = model(x)
        return pointwise(x[mask], p[mask])

    final = {f"test_{k}": v for k, v in masked_pointwise(test, test_mask).items()}
    final.update({f"valid_{k}": v for k, v in masked_pointwise(valid, valid_mask).items()})
    final.update({f"train_{k}": v for k, v in masked_pointwise(train, train_mask).items()})

    if SMOKE:
        return final, EMPTY
    real_list = data.itemid_matrix(data.data)
    tv_real, te_real = train_test_split(real_list, test_size=0.2, random_state=42)
    tr_real, va_real = train_test_split(tv_real, test_size=0.25, random_state=42)
    full = torch.tensor(matrix.values, dtype=torch.float32)
    with torch.no_grad():
        if item_major:
            roc = model.i_recommendation(full, data.num_items).T
        else:
            roc = model.recommendation(full, data.num_items)
    tv_roc, te_roc = train_test_split(roc, test_size=0.2, random_state=42)
    tr_roc, va_roc = train_test_split(tv_roc, test_size=0.25, random_state=42)
    return final, {"valid": ranking_eval(va_real, va_roc), "test": ranking_eval(te_real, te_roc),
                   "valid@10": ranking_eval(va_real, va_roc, k=10), "test@10": ranking_eval(te_real, te_roc, k=10)}


def run_seq(dien, epochs=200, hist_len=10):
    """Replicates scripts/din.py / scripts/dien.py, incl. full-variable-history
    serving (model.recommendation with each user's complete unpadded history,
    /root/reference/model/din.py:55-66)."""
    from data.reader import MovieLens100K
    from sampler.sampler import Sampler
    from trainer.trainer import Trainer

    data = MovieLens100K(DATA)
    train_set = set(zip(data.train["user_id"], data.train["item_id"]))
    valid_set = set(zip(data.valid["user_id"], data.valid["item_id"]))
    test_set = set(zip(data.test["user_id"], data.test["item_id"]))
    excluded = train_set | valid_set | test_set

    def pad_or_truncate(history, n):
        history = list(history)
        return history[:n] if len(history) >= n else [0] * (n - len(history)) + history

    def build(split, n_neg):
        negd = Sampler().negative_sampling2(data.num_users, data.num_items, excluded, n_neg)
        comb = pd.concat([split, negd], axis=0).reset_index(drop=True)
        hist_list = data.itemid_matrix(split)
        hist_list = np.array([row[row != -1] for row in hist_list], dtype=object)
        hists = np.array([pad_or_truncate(hist_list[u], hist_len) for u in comb["user_id"]])
        hist = torch.tensor(hists, dtype=torch.long)
        target = torch.tensor(comb.iloc[:, 1].values, dtype=torch.long)
        rating = torch.tensor(comb.iloc[:, 2].values, dtype=torch.float32).unsqueeze(1)
        return hist, target, rating

    ht, tt, rt = build(data.train, 30)
    hv, tv, rv = build(data.valid, 10)
    hs, ts, rs = build(data.test, 10)
    if dien:
        from model.dien import DIEN

        model = DIEN(data.num_items, 16)
    else:
        from model.din import DIN

        model = DIN(data.num_items, 64)
    t = Trainer(model, torch.nn.BCELoss(),
                torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5))
    for _ in range(epochs):
        t.train_loop(ht, tt, train_rating=rt)
    with torch.no_grad():
        p_t = model(ht, tt); p_v = model(hv, tv); p_s = model(hs, ts)
    final = {f"test_{k}": v for k, v in pointwise(rs, p_s).items()}
    final.update({f"valid_{k}": v for k, v in pointwise(rv, p_v).items()})
    final.update({f"train_{k}": v for k, v in pointwise(rt, p_t).items()})

    if SMOKE:
        return final, EMPTY
    history_list = data.itemid_matrix(data.data)
    history_list = np.array([row[row != -1] for row in history_list], dtype=object)
    with torch.no_grad():
        rec = model.recommendation(data.num_users, data.num_items, history_list, data.num_items)
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
    ap.add_argument("--out", default=OUT)
    ap.add_argument(
        "--smoke", action="store_true",
        help="plumbing check: 1 epoch, don't write results",
    )
    ap.add_argument(
        "--seed", type=int, default=None,
        help="seed torch/numpy/random for a reproducible variance-band run "
        "(the reference itself never seeds; each unseeded run is a fresh draw)",
    )
    args = ap.parse_args()
    if args.seed is not None:
        import random

        random.seed(args.seed)
        np.random.seed(args.seed)
        torch.manual_seed(args.seed)
    out = args.out
    if args.smoke:
        args.epochs = 1
        global SMOKE
        SMOKE = True

    try:
        with open(out) as f:
            results = json.load(f)
    except FileNotFoundError:
        results = {}

    def feature_runner(name, epochs, negs, make_model, lr=1e-3, wd=1e-5):
        return lambda e: run_feature(name, e or epochs, negs, make_model, lr, wd)

    def _make(modname, clsname):
        def make(d):
            import importlib

            cls = getattr(importlib.import_module(f"model.{modname}"), clsname)
            if modname == "lr":
                return cls(d.num_users, d.num_items, 43)
            if modname == "ffm":
                return cls(43, 32)
            if modname == "widedeep":
                return cls(d.num_users, d.num_items, [512, 256, 128, 1], 128)
            if modname == "deepfm":
                return cls(d.num_users, d.num_items, [512, 256, 128, 1], 128)
            if modname == "nfm":
                return cls(d.num_users, d.num_items, [512, 256, 128, 1], 128)
            if modname == "afm":
                return cls(d.num_users, d.num_items, 128, 64)
            if modname == "pnn":
                return cls(256, [256, 128, 64, 32])
            if modname == "deepcross":
                return cls(d.num_users, d.num_items, 3, [512, 256, 128, 1], 128)
            if modname == "deepcrossing":
                return cls(d.num_users, d.num_items, 32, [256, 128, 64, 32])
            raise KeyError(modname)

        return make

    def pair_runner(epochs, negs, lr, wd, make_model):
        return lambda e: run_pair(make_model, e or epochs, negs, lr, wd)

    def _mf(d):
        from model.mf import MatrixFactorization

        return MatrixFactorization(d.num_users, d.num_items, 64)

    def _neuralcf(d):
        from model.neuralcf import NeuralCF

        return NeuralCF(d.num_users, d.num_items, 256, [512, 256, 128, 64, 32])

    # epochs / negatives / lr / wd per reference script (SURVEY.md §2.4 table)
    RUNNERS = {
        "mf": pair_runner(100, (180, 60, 60), 0.01, 1e-5, _mf),
        "neuralcf": lambda e: run_pair(_neuralcf, e or 50, (60, 20, 20), 1e-3, 1e-5, ratings_2d=True),
        "lr": feature_runner("lr", 100, (10, 10, 10), _make("lr", "LogisticRegression"), 0.05, 0.0),
        "ffm": feature_runner("ffm", 100, (10, 10, 10), _make("ffm", "FFM")),
        "widedeep": feature_runner("widedeep", 100, (30, 10, 10), _make("widedeep", "WideDeep")),
        "deepfm": feature_runner("deepfm", 200, (30, 10, 10), _make("deepfm", "DeepFM")),
        "nfm": feature_runner("nfm", 200, (30, 10, 10), _make("nfm", "NFM")),
        "afm": feature_runner("afm", 300, (30, 10, 10), _make("afm", "AFM")),
        "pnn": feature_runner("pnn", 100, (30, 10, 10), _make("pnn", "PNN")),
        "deepcross": feature_runner("deepcross", 200, (30, 10, 10), _make("deepcross", "DeepCross")),
        "deepcrossing": feature_runner(
            "deepcrossing", 100, (30, 10, 10), _make("deepcrossing", "DeepCrossing")
        ),
        "autorec": lambda e: run_autorec(False, e or 100),
        "i-autorec": lambda e: run_autorec(True, e or 100),
        "din": lambda e: run_seq(False, e or 200),
        "dien": lambda e: run_seq(True, e or 200),
    }

    for name in args.models:
        t0 = time.time()
        print(f"=== reference {name} ===", flush=True)
        try:
            if name in RUNNERS:
                final, rank = RUNNERS[name](args.epochs)
            else:
                print("  unknown model, skipping")
                continue
            results[name] = {"final": final, "ranking": rank, "wall_s": time.time() - t0}
            print(
                f"  test_auc={final['test_auc']:.4f} auc_raw={final['test_auc_raw']:.4f} "
                f"R@50={rank['test'].get('recall', float('nan')):.4f} "
                f"NDCG@50={rank['test'].get('ndcg', float('nan')):.4f} "
                f"({time.time()-t0:.0f}s)", flush=True,
            )
        except Exception as e:
            import traceback

            results[name] = {"error": traceback.format_exc()[-1000:]}
            print("  FAILED", e, flush=True)
        if not args.smoke:
            with open(out, "w") as f:
                json.dump(results, f, indent=2)
    print("done ->", out)


if __name__ == "__main__":
    main()
