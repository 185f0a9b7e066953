"""Pointwise metrics vs sklearn oracle (including the binarized-'AUC' quirk)."""

import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.eval.pointwise import pointwise_metrics, true_auc

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import (  # noqa: E402
    accuracy_score,
    f1_score,
    precision_score,
    recall_score,
    roc_auc_score,
)


def test_matches_sklearn_including_quirky_auc():
    rng = np.random.default_rng(0)
    y = (rng.random(500) < 0.6).astype(np.float32)
    p = rng.random(500).astype(np.float32)
    m = {k: float(v) for k, v in pointwise_metrics(y, p).items()}
    pb = (p >= 0.5).astype(int)
    assert m["accuracy"] == pytest.approx(accuracy_score(y, pb), abs=1e-6)
    assert m["precision"] == pytest.approx(precision_score(y, pb), abs=1e-6)
    assert m["recall"] == pytest.approx(recall_score(y, pb), abs=1e-6)
    assert m["f1"] == pytest.approx(f1_score(y, pb), abs=1e-6)
    # the reference's "AUC": roc_auc_score on BINARIZED predictions
    assert m["auc"] == pytest.approx(roc_auc_score(y, pb), abs=1e-6)
    # the true ranking AUC on raw scores
    assert m["auc_raw"] == pytest.approx(roc_auc_score(y, p), abs=1e-5)


def test_true_auc_ties():
    y = np.array([1, 1, 0, 0, 1], dtype=np.float32)
    s = np.array([0.5, 0.5, 0.5, 0.1, 0.9], dtype=np.float32)
    assert float(true_auc(y, s)) == pytest.approx(roc_auc_score(y, s), abs=1e-6)


def test_weighted_equals_masked_subset():
    rng = np.random.default_rng(1)
    y = (rng.random(300) < 0.5).astype(np.float32)
    p = rng.random(300).astype(np.float32)
    mask = rng.random(300) < 0.7
    m_w = pointwise_metrics(y, p, weights=mask.astype(np.float32))
    m_s = pointwise_metrics(y[mask], p[mask])
    for k in m_w:
        assert float(m_w[k]) == pytest.approx(float(m_s[k]), abs=1e-5), k
