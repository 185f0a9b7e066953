"""Vectorized top-K ranking metrics (Precision/Recall/F1@k, MAP, NDCG, MRR).

Replaces the reference's per-user Python loops (evaluator/ranking.py:11-150)
with bitmap gathers: membership of each recommended item in the user's actual
set is one ``take_along_axis`` on a scattered [U, I] relevance bitmap, so the
whole evaluation is a handful of fused device ops.

``reference_mode=True`` (default) reproduces the reference's formulas *as
executed on its padded matrices*, including three quirks (SURVEY.md §2.1):

1. recall denominator: the reference takes ``set()`` of each padded actual
   row, so the -1 pad marker counts as one extra "relevant item" for every
   user whose row is padded (ranking.py:27,34);
2. AP denominator: ``len(actual)`` of a padded numpy row is the padded
   width, identical for every user (ranking.py:63);
3. NDCG ideal relevance: computed over the FULL filtered recommendation
   list, where trailing -1 pads of the prediction row match the -1 in the
   actual set and inflate the ideal gain (ranking.py:94-103). The pad count
   per user equals n_seen[u] - min(n_seen) (see docstring of
   ``ranking_metrics``).

``reference_mode=False`` computes the standard clean definitions.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp


@dataclasses.dataclass
class RankingMetrics:
    precision: float
    recall: float
    f1: float
    map: float
    ndcg: float
    mrr: float

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


def ranking_metrics(
    actual: jnp.ndarray,  # [U, La] item ids padded with -1
    rec_full: jnp.ndarray,  # [U, I] full descending ranking (seen at tail)
    k: int,
    n_seen: Optional[jnp.ndarray] = None,  # [U] seen-count used for the pad quirk
    reference_mode: bool = True,
) -> Dict[str, jnp.ndarray]:
    U, I = rec_full.shape
    La = actual.shape[1]

    # relevance bitmap: bitmap[u, i] = 1 iff item i in actual[u]
    safe = jnp.where(actual >= 0, actual, I)  # park pads in an extra column
    bitmap = jnp.zeros((U, I + 1), dtype=jnp.float32)
    bitmap = bitmap.at[jnp.arange(U)[:, None], safe].set(1.0)
    bitmap = bitmap[:, :I]

    hits_full = jnp.take_along_axis(bitmap, rec_full, axis=1)  # [U, I] 0/1
    hits_k = hits_full[:, :k]
    n_real = jnp.sum(actual >= 0, axis=1).astype(jnp.float32)  # [U]
    has_pad = (n_real < La).astype(jnp.float32)

    # --- micro-averaged precision / recall / f1 @k (ranking.py:11-41) ---
    same = jnp.sum(hits_k)
    rec_total = jnp.asarray(U * k, dtype=jnp.float32)
    real_total = jnp.sum(n_real) + (jnp.sum(has_pad) if reference_mode else 0.0)
    precision = same / rec_total
    recall = same / real_total
    f1 = jnp.where(precision + recall > 0, 2 * precision * recall / (precision + recall), 0.0)

    # --- MAP@k (ranking.py:45-72) ---
    positions = jnp.arange(1, k + 1, dtype=jnp.float32)
    prec_at = jnp.cumsum(hits_k, axis=1) / positions
    ap_num = jnp.sum(prec_at * hits_k, axis=1)  # [U]
    if reference_mode:
        ap = ap_num / La  # len() of the padded numpy row, same for every user
    else:
        ap = jnp.where(n_real > 0, ap_num / jnp.maximum(n_real, 1.0), 0.0)
    map_score = jnp.mean(ap)

    # --- NDCG@k with 2^rel - 1 gains; binary rel => gain == rel (ranking.py:76-115) ---
    discounts = 1.0 / jnp.log2(positions + 1.0)  # [k]
    dcg = jnp.sum(hits_k * discounts, axis=1)
    if reference_mode:
        if n_seen is None:
            pads = jnp.zeros((U,), dtype=jnp.float32)
        else:
            pads = (n_seen - jnp.min(n_seen)).astype(jnp.float32)
        ideal_ones = jnp.minimum(n_real + has_pad * pads, float(k))
    else:
        ideal_ones = jnp.minimum(n_real, float(k))
    disc_prefix = jnp.concatenate([jnp.zeros(1), jnp.cumsum(discounts)])  # [k+1]
    idcg = disc_prefix[ideal_ones.astype(jnp.int32)]
    ndcg = jnp.mean(jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-12), 0.0))

    # --- MRR over the full ranking (ranking.py:119-136) ---
    first_hit = jnp.argmax(hits_full, axis=1)
    any_hit = jnp.any(hits_full > 0, axis=1)
    rr = jnp.where(any_hit, 1.0 / (first_hit + 1.0), 0.0)
    mrr = jnp.mean(rr)

    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "map": map_score,
        "ndcg": ndcg,
        "mrr": mrr,
    }
