"""Device-side pointwise classification metrics.

Reproduces the reference evaluator exactly (evaluator/evaluator.py:13-20):
predictions are thresholded at 0.5, then accuracy / precision / recall / F1 /
"AUC". Quirk kept for parity: the reference feeds the *binarized* predictions
to ``roc_auc_score``, so its "AUC" equals (TPR + TNR) / 2 -- balanced
accuracy -- not a ranking AUC (SURVEY.md §2.1). ``auc`` here is that quirky
definition; ``auc_raw`` is the true rank-based AUC on raw scores (weighted,
tie-corrected), an additive capability.

All metrics support an optional weight vector so the AutoRec masked-matrix
path (trainer/trainer.py:81-113) can evaluate rated entries only without
dynamic shapes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def _safe_div(a, b):
    return jnp.where(b > 0, a / jnp.where(b > 0, b, 1.0), 0.0)


def true_auc(
    y_true: jnp.ndarray, scores: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Weighted, tie-corrected probability that a positive outranks a negative.

    AUC = sum_pos [ W_neg(score < s) + 0.5 * W_neg(score = s) ] / (W_pos * W_neg),
    computed with one sort + two searchsorted passes (O(n log n), static shape).
    """
    y = y_true.astype(jnp.float32).ravel()
    s = scores.astype(jnp.float32).ravel()
    w = jnp.ones_like(y) if weights is None else weights.astype(jnp.float32).ravel()
    order = jnp.argsort(s)
    s_sorted = s[order]
    negw_sorted = (w * (1.0 - y))[order]
    prefix = jnp.concatenate([jnp.zeros(1), jnp.cumsum(negw_sorted)])  # [n+1]
    left = jnp.searchsorted(s_sorted, s, side="left")
    right = jnp.searchsorted(s_sorted, s, side="right")
    w_less = prefix[left]
    w_eq = prefix[right] - prefix[left]
    pos_mass = jnp.sum(w * y * (w_less + 0.5 * w_eq))
    w_pos = jnp.sum(w * y)
    w_neg = jnp.sum(w * (1.0 - y))
    return _safe_div(pos_mass, w_pos * w_neg)


def pointwise_metrics(
    y_true: jnp.ndarray,
    probs: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    threshold: float = 0.5,
    include_auc_raw: bool = True,
) -> Dict[str, jnp.ndarray]:
    """accuracy / precision / recall / f1 / auc (reference def) / auc_raw.

    ``include_auc_raw=False`` skips the sort-based true AUC -- the remaining
    metrics are pure elementwise reductions, cheap enough to evaluate every
    epoch inside a ``lax.scan`` (sorts in the scan body blow up TPU compile
    time; the trainer computes auc_raw once on the final params instead).
    """
    y = y_true.astype(jnp.float32).ravel()
    p = probs.astype(jnp.float32).ravel()
    w = jnp.ones_like(y) if weights is None else weights.astype(jnp.float32).ravel()
    pred = (p >= threshold).astype(jnp.float32)

    tp = jnp.sum(w * pred * y)
    fp = jnp.sum(w * pred * (1.0 - y))
    fn = jnp.sum(w * (1.0 - pred) * y)
    tn = jnp.sum(w * (1.0 - pred) * (1.0 - y))

    accuracy = _safe_div(tp + tn, tp + tn + fp + fn)
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    f1 = _safe_div(2.0 * precision * recall, precision + recall)
    tnr = _safe_div(tn, tn + fp)
    auc_binarized = 0.5 * (recall + tnr)  # == roc_auc_score on binarized preds

    out = {
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "auc": auc_binarized,
    }
    if include_auc_raw:
        out["auc_raw"] = true_auc(y, p, w)
    return out
