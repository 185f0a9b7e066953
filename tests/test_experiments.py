"""End-to-end experiment runs (few epochs) for one model per family."""

import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS
from deeplearningrecommendationsystem_tpu.experiments import run_experiment


def run(name, ml100k, **overrides):
    cfg = PRESETS[name].replace(**overrides)
    return run_experiment(cfg, data=ml100k)


def check_history(res, epochs):
    for key in ("train_loss", "valid_auc", "test_auc"):
        assert key in res.history, key
        assert len(res.history[key]) == epochs
        assert np.isfinite(res.history[key]).all(), key
    for key in ("train_auc_raw", "valid_auc_raw", "test_auc_raw"):
        assert np.isfinite(res.extras[key]), key


def test_mf_end_to_end_learns(ml100k):
    res = run("mf", ml100k, epochs=40, negatives=(20, 10, 10))
    check_history(res, 40)
    # full-batch MF learns fast: loss decreasing, train AUC well above chance
    assert res.history["train_loss"][-1] < res.history["train_loss"][0]
    assert res.extras["train_auc_raw"] > 0.75
    for split in ("valid", "test"):
        r = res.ranking[split]
        assert 0 < r["recall"] <= 1
        assert 0 < r["ndcg"] <= 1
        assert 0 < r["mrr"] <= 1


def test_lr_feature_family(ml100k):
    res = run("lr", ml100k, epochs=10)
    check_history(res, 10)
    assert res.history["train_loss"][-1] < res.history["train_loss"][0]
    assert set(res.ranking) == {"valid", "test", "valid@10", "test@10"}
    # k=10 recall cannot exceed k=50 recall on the same ranking
    assert res.ranking["test@10"]["recall"] <= res.ranking["test"]["recall"]


def test_din_seq_family(ml100k):
    # fixed-window serving here (CPU-fast); full-history serving is
    # oracle-tested in test_full_history.py and integration-tested below
    res = run("din", ml100k, epochs=3, negatives=(5, 3, 3), full_history_serving=False)
    check_history(res, 3)
    assert res.ranking["test"]["recall"] >= 0


@pytest.mark.slow
def test_din_full_history_serving_ml100k(ml100k):
    """Reference-semantics serving (complete variable-length histories,
    model/din.py:55-66) through the whole experiment pipeline."""
    res = run("din", ml100k, epochs=2, negatives=(5, 3, 3))
    assert res.ranking["test"]["recall"] >= 0
    assert np.isfinite(res.history["train_loss"]).all()


def test_autorec_matrix_family(ml100k):
    res = run("autorec", ml100k, epochs=5, global_negatives=20)
    check_history(res, 5)
    assert res.history["train_loss"][-1] < res.history["train_loss"][0]
    assert res.ranking["test"]["ndcg"] > 0


def test_i_autorec_orientation(ml100k):
    res = run("i-autorec", ml100k, epochs=2, global_negatives=10)
    assert res.ranking["test"]["recall"] >= 0


@pytest.mark.slow
def test_neuralcf_short(ml100k):
    res = run("neuralcf", ml100k, epochs=3, negatives=(5, 3, 3))
    check_history(res, 3)


def test_presets_default_to_f32_parity_numerics():
    # quality-parity campaign (PARITY.json) ran in pure f32; presets must not
    # silently switch numerics -- bf16 is opt-in (BF16_QUALITY.json evidence)
    from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS

    for name, cfg in PRESETS.items():
        assert cfg.compute_dtype is None, name
