"""Measure the reference's full-catalog serving loop (the #1 hotspot).

The reference's ``model.recommendation`` loops over users in Python,
re-running forward on a catalog-size batch per user (SURVEY.md §3.5). Times
a user subsample and extrapolates to all 943 users. Appends to
BASELINE_MEASURED.json under 'serving'.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import torch  # noqa: E402

DATA = "/root/reference/dataset_example/ml-100k"
OUT = "BASELINE_MEASURED.json"
SAMPLE_USERS = 25


def main():
    from data.reader import MovieLens100K
    from model.deepfm import DeepFM
    from model.mf import MatrixFactorization

    data = MovieLens100K(DATA)
    user_item = data.user_item()
    results = {}

    # DeepFM: per-user Python loop over the full catalog (model/deepfm.py:85-95)
    model = DeepFM(data.num_users, data.num_items, [512, 256, 128, 1], 128)
    model.eval()
    with torch.no_grad():
        t0 = time.perf_counter()
        for i in range(SAMPLE_USERS):
            uv = user_item[user_item["user_id"] == i]
            uv = torch.Tensor(uv.values)
            scores = model.forward(uv)
            torch.topk(scores, 50, dim=0)
        dt = time.perf_counter() - t0
    per_user = dt / SAMPLE_USERS
    results["deepfm_serving_all_users_s"] = per_user * data.num_users
    print(f"deepfm serving: {per_user*1e3:.1f} ms/user -> {per_user*943:.1f}s for all users")

    # DIN: the worst loop -- per user, repeat the FULL unpadded history
    # num_items times and forward a (1682, L, D) batch (model/din.py:55-66,
    # invoked with k=num_items by scripts/din.py:100)
    from model.din import DIN

    din = DIN(data.num_items, 64)
    din.eval()
    hist_list = data.itemid_matrix(data.data)
    hist_list = np.array(
        [row[row != -1] for row in hist_list], dtype=object
    )
    with torch.no_grad():
        t0 = time.perf_counter()
        din.recommendation(SAMPLE_USERS, data.num_items, hist_list, data.num_items)
        dt = time.perf_counter() - t0
    per_user = dt / SAMPLE_USERS
    results["din_serving_all_users_s"] = per_user * data.num_users
    print(f"din serving: {per_user*1e3:.1f} ms/user -> {per_user*943:.1f}s for all users")

    # NeuralCF: per-user Python loop scoring the catalog (model/neuralcf.py:61-72)
    from model.neuralcf import NeuralCF

    ncf = NeuralCF(data.num_users, data.num_items, 256, [512, 256, 128, 64, 32])
    ncf.eval()
    with torch.no_grad():
        t0 = time.perf_counter()
        ncf.recommendation(SAMPLE_USERS, data.num_items)
        dt = time.perf_counter() - t0
    per_user = dt / SAMPLE_USERS
    results["neuralcf_serving_all_users_s"] = per_user * data.num_users
    print(f"neuralcf serving: {per_user*1e3:.1f} ms/user -> {per_user*943:.1f}s for all users")

    # AutoRec: one full-matrix forward + topk (model/autorec.py:16-19)
    from model.autorec import AutoRec

    ar = AutoRec(data.num_items, 256)
    ar.eval()
    matrix = torch.rand(data.num_users, data.num_items)
    with torch.no_grad():
        ar.recommendation(matrix, data.num_items)  # warm
        t0 = time.perf_counter()
        for _ in range(10):
            ar.recommendation(matrix, data.num_items)
        dt = (time.perf_counter() - t0) / 10
    results["autorec_serving_all_users_s"] = dt
    print(f"autorec serving (matmul path): {dt*1e3:.1f} ms for all users")

    # MF: vectorized matmul path (model/mf.py:28-35) -- the reference's best case
    mf = MatrixFactorization(data.num_users, data.num_items, 64)
    mf.eval()
    with torch.no_grad():
        t0 = time.perf_counter()
        for _ in range(10):
            mf.recommendation(data.num_users, data.num_items)
        dt = (time.perf_counter() - t0) / 10
    results["mf_serving_all_users_s"] = dt
    print(f"mf serving (matmul path): {dt*1e3:.1f} ms for all users")

    try:
        with open(OUT) as f:
            existing = json.load(f)
    except FileNotFoundError:
        existing = {}
    existing["serving"] = results
    with open(OUT, "w") as f:
        json.dump(existing, f, indent=2)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
