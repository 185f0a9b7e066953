"""Measure the PyTorch reference's CPU training throughput + quality.

The reference publishes no numbers (BASELINE.md), so the baseline is
measured by importing the reference modules from /root/reference (read-only)
and driving them with their own Trainer/Sampler exactly as the entry scripts
do. Results land in BASELINE_MEASURED.json for bench.py's ``vs_baseline``.

Usage:
    python tools/measure_reference_baseline.py --models mf deepfm din --epochs 5
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

DATA = "/root/reference/dataset_example/ml-100k"
OUT = "BASELINE_MEASURED.json"


def _load():
    from data.reader import MovieLens100K

    return MovieLens100K(DATA)


def _sample_df(data, n_neg):
    from sampler.sampler import Sampler

    train_set = set(zip(data.train["user_id"], data.train["item_id"]))
    valid_set = set(zip(data.valid["user_id"], data.valid["item_id"]))
    test_set = set(zip(data.test["user_id"], data.test["item_id"]))
    excluded = train_set | valid_set | test_set
    neg = Sampler().negative_sampling2(data.num_users, data.num_items, excluded, n_neg)
    return pd.concat([data.train, neg], axis=0).reset_index(drop=True), excluded


def bench_pair(data, epochs, make_model, n_neg, ratings_2d=False):
    from trainer.trainer import Trainer
    from sampler.sampler import Sampler

    tu, ti, tr = data.train_interaction("cpu")
    excluded = set(zip(tu.numpy(), ti.numpy()))
    nu, ni, nr = Sampler().negative_sampling(data.num_users, data.num_items, excluded, n_neg)
    u = torch.cat([tu, nu])
    i = torch.cat([ti, ni])
    r = torch.cat([tr.float(), nr])
    if ratings_2d:  # neuralcf outputs [B, 1] (scripts/neuralcf.py:37)
        r = r.unsqueeze(1)
    model = make_model(data)
    t = Trainer(model, torch.nn.BCELoss(), torch.optim.Adam(model.parameters(), lr=0.01, weight_decay=1e-5))
    t.train_loop(u, i, train_rating=r)  # warm
    t0 = time.perf_counter()
    for _ in range(epochs):
        t.train_loop(u, i, train_rating=r)
    dt = (time.perf_counter() - t0) / epochs
    return len(r), dt


def bench_autorec(data, epochs, item_major=False):
    """Full-matrix masked loop2 training (scripts/autorec.py:52-58)."""
    from sklearn.model_selection import train_test_split

    from model.autorec import AutoRec
    from sampler.sampler import Sampler
    from trainer.trainer import Trainer

    excluded = set(zip(data.data["user_id"], data.data["item_id"]))
    negative = Sampler().negative_sampling2(data.num_users, data.num_items, excluded, 150)
    combined = pd.concat([data.data, negative], axis=0).reset_index(drop=True)
    idx, col = ("item_id", "user_id") if item_major else ("user_id", "item_id")
    matrix = combined.pivot_table(index=idx, columns=col, values="rating", fill_value=0.5)
    train_valid, _ = train_test_split(matrix, test_size=0.2, random_state=42)
    train, _ = train_test_split(train_valid, test_size=0.25, random_state=42)
    train = torch.tensor(train.values, dtype=torch.float32)
    mask = train != 0.5
    model = AutoRec(train.shape[1], 256)
    t = Trainer(model, torch.nn.BCELoss(),
                torch.optim.Adam(model.parameters(), lr=0.005, weight_decay=1e-5))
    t.train_loop2(train, mask)  # warm
    t0 = time.perf_counter()
    for _ in range(epochs):
        t.train_loop2(train, mask)
    dt = (time.perf_counter() - t0) / epochs
    return train.shape[0], dt


def bench_feature_model(data, epochs, make_model, n_neg=30):
    from trainer.trainer import Trainer

    combined, _ = _sample_df(data, n_neg)
    feat = data.feature(combined)
    rating = torch.tensor(feat.iloc[:, 2].values, dtype=torch.float32).unsqueeze(1)
    feat = feat.drop(columns=["rating"])
    x = torch.tensor(feat.values, dtype=torch.float32)
    model = make_model(data, x)
    t = Trainer(model, torch.nn.BCELoss(), torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5))
    t.train_loop(x, train_rating=rating)  # warm
    t0 = time.perf_counter()
    for _ in range(epochs):
        t.train_loop(x, train_rating=rating)
    dt = (time.perf_counter() - t0) / epochs
    return len(rating), dt


def bench_din(data, epochs, dien=False):
    from trainer.trainer import Trainer

    combined, _ = _sample_df(data, 30)
    hist_len = 10
    hist_list = data.itemid_matrix(data.train)
    hist_list = np.array([row[row != -1] for row in hist_list], dtype=object)

    def pad(h):
        h = list(h)
        return h[:hist_len] if len(h) >= hist_len else [0] * (hist_len - len(h)) + h

    hists = np.array([pad(hist_list[u]) for u in combined["user_id"]])
    hist = torch.tensor(hists, dtype=torch.long)
    target = torch.tensor(combined["item_id"].values, dtype=torch.long)
    rating = torch.tensor(combined["rating"].values, dtype=torch.float32).unsqueeze(1)
    if dien:
        from model.dien import DIEN

        model = DIEN(data.num_items, 16)
    else:
        from model.din import DIN

        model = DIN(data.num_items, 64)
    t = Trainer(model, torch.nn.BCELoss(), torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-5))
    t.train_loop(hist, target, train_rating=rating)
    t0 = time.perf_counter()
    for _ in range(epochs):
        t.train_loop(hist, target, train_rating=rating)
    dt = (time.perf_counter() - t0) / epochs
    return len(rating), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models", nargs="+",
        default=["lr", "mf", "neuralcf", "ffm", "widedeep", "deepfm", "nfm", "afm",
                 "pnn", "deepcross", "deepcrossing", "autorec", "i-autorec", "din", "dien"],
    )
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--threads", type=int, default=0, help="torch CPU threads (0=default)")
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    data = _load()
    results = {}

    def record(name, n, dt):
        results[name] = {
            "examples_per_epoch": n,
            "sec_per_epoch": dt,
            "examples_per_sec": n / dt,
            "torch_threads": torch.get_num_threads(),
        }
        print(f"{name}: {n} ex/epoch, {dt:.3f}s/epoch -> {n/dt:,.0f} ex/s", flush=True)
        # write incrementally so one model's failure can't lose the rest
        try:
            with open(OUT) as f:
                existing = json.load(f)
        except FileNotFoundError:
            existing = {}
        existing.update(results)
        with open(OUT, "w") as f:
            json.dump(existing, f, indent=2)

    def _mf(d):
        from model.mf import MatrixFactorization

        return MatrixFactorization(d.num_users, d.num_items, 64)

    def _neuralcf(d):
        from model.neuralcf import NeuralCF

        return NeuralCF(d.num_users, d.num_items, 256, [512, 256, 128, 64, 32])

    def _feature(modname):
        # ctor args per reference script (SURVEY.md §2.4 table)
        def make(d, x):
            import importlib

            mod = importlib.import_module(f"model.{modname}")
            if modname == "lr":
                return mod.LogisticRegression(d.num_users, d.num_items, 43)
            if modname == "ffm":
                return mod.FFM(43, 32)
            if modname == "widedeep":
                return mod.WideDeep(d.num_users, d.num_items, [512, 256, 128, 1], 128)
            if modname == "deepfm":
                return mod.DeepFM(d.num_users, d.num_items, [512, 256, 128, 1], 128)
            if modname == "nfm":
                return mod.NFM(d.num_users, d.num_items, [512, 256, 128, 1], 128)
            if modname == "afm":
                return mod.AFM(d.num_users, d.num_items, 128, 64)
            if modname == "pnn":
                return mod.PNN(256, [256, 128, 64, 32])
            if modname == "deepcross":
                return mod.DeepCross(d.num_users, d.num_items, 3, [512, 256, 128, 1], 128)
            if modname == "deepcrossing":
                return mod.DeepCrossing(d.num_users, d.num_items, 32, [256, 128, 64, 32])
            raise KeyError(modname)

        return make

    for m in args.models:
      try:
        if m == "mf":
            record("mf", *bench_pair(data, args.epochs, _mf, 180))
        elif m == "neuralcf":
            record("neuralcf", *bench_pair(data, args.epochs, _neuralcf, 60, ratings_2d=True))
        elif m in ("lr", "ffm"):
            record(m, *bench_feature_model(data, args.epochs, _feature(m), n_neg=10))
        elif m in ("widedeep", "deepfm", "nfm", "afm", "pnn", "deepcross", "deepcrossing"):
            record(m, *bench_feature_model(data, args.epochs, _feature(m), n_neg=30))
        elif m == "autorec":
            record("autorec", *bench_autorec(data, args.epochs))
        elif m == "i-autorec":
            record("i-autorec", *bench_autorec(data, args.epochs, item_major=True))
        elif m == "din":
            record("din", *bench_din(data, args.epochs))
        elif m == "dien":
            record("dien", *bench_din(data, args.epochs, dien=True))
        else:
            print(f"unknown model {m}, skipping")
      except Exception as e:
        print(f"{m} FAILED: {e}", flush=True)

    try:
        with open(OUT) as f:
            existing = json.load(f)
    except FileNotFoundError:
        existing = {}
    existing.update(results)
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
