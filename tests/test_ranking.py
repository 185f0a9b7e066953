"""Ranking metrics vs a literal Python oracle of the reference's formulas.

The oracle mirrors evaluator/ranking.py exactly as it executes on the
reference's padded matrices -- including the -1-pad quirks in recall, AP and
NDCG (see eval/ranking.py docstring). The vectorized device implementation
must agree on randomized instances.
"""

import math

import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.eval.ranking import ranking_metrics
from deeplearningrecommendationsystem_tpu.eval.recommend import full_ranking


def oracle(actual_rows, pred_rows, k):
    """Reference-faithful metrics on padded actual rows + filtered pred rows."""
    same = rec = real = 0
    for a, p in zip(actual_rows, pred_rows):
        pk = p[:k]
        same += len(set(a) & set(pk))
        rec += len(set(pk))
        real += len(set(a))  # includes -1 when the row is padded
    precision, recall = same / rec, same / real
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0

    aps = []
    for a, p in zip(actual_rows, pred_rows):
        pk = p[:k]
        hits, score = 0.0, 0.0
        for i, x in enumerate(pk):
            if x in a:
                hits += 1
                score += hits / (i + 1)
        aps.append(score / len(a))  # len of the PADDED numpy row

    def dcg(rels, k):
        rels = rels[:k]
        return sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(rels))

    ndcgs = []
    for a, p in zip(actual_rows, pred_rows):
        rel = [1 if x in a else 0 for x in p]  # FULL pred row
        d = dcg(rel, k)
        i = dcg(sorted(rel, reverse=True), k)
        ndcgs.append(d / i if i > 0 else 0.0)

    rrs = []
    for a, p in zip(actual_rows, pred_rows):
        rr = 0.0
        for i, x in enumerate(p):
            if x in a:
                rr = 1.0 / (i + 1)
                break
        rrs.append(rr)

    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "map": float(np.mean(aps)),
        "ndcg": float(np.mean(ndcgs)),
        "mrr": float(np.mean(rrs)),
    }


def make_instance(seed, U=7, I=24, k=5):
    rng = np.random.default_rng(seed)
    actual_sets, seen_sets = [], []
    for _ in range(U):
        n_a = rng.integers(1, 6)
        n_s = rng.integers(0, 8)
        perm = rng.permutation(I)
        actual_sets.append(sorted(perm[:n_a].tolist()))
        seen_sets.append(sorted(perm[n_a : n_a + n_s].tolist()))
    la = max(len(a) for a in actual_sets)
    actual = np.full((U, la), -1, dtype=np.int32)
    for u, a in enumerate(actual_sets):
        actual[u, : len(a)] = a
    seen = np.zeros((U, I), dtype=bool)
    for u, s in enumerate(seen_sets):
        seen[u, s] = True
    scores = rng.standard_normal((U, I)).astype(np.float32)
    return actual, seen, scores, k


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_reference_oracle(seed):
    actual, seen, scores, k = make_instance(seed)
    U, I = scores.shape

    rec_full = np.asarray(full_ranking(scores, seen))

    # build the reference-style filtered + padded prediction rows
    pred_rows = []
    for u in range(U):
        row = [i for i in rec_full[u] if not seen[u, i]]
        pred_rows.append(row)
    maxlen = max(len(r) for r in pred_rows)
    pred_rows = [r + [-1] * (maxlen - len(r)) for r in pred_rows]
    actual_rows = [list(actual[u]) for u in range(U)]

    want = oracle(actual_rows, pred_rows, k)
    got = {
        k_: float(v)
        for k_, v in ranking_metrics(
            actual, rec_full, k, n_seen=seen.sum(1), reference_mode=True
        ).items()
    }
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-5), key


def test_standard_mode_sane():
    actual, seen, scores, k = make_instance(9)
    rec_full = np.asarray(full_ranking(scores, seen))
    m = ranking_metrics(actual, rec_full, k, reference_mode=False)
    for v in m.values():
        assert 0.0 <= float(v) <= 1.0


def test_seen_to_tail_equals_full_ranking():
    """One score sort + stable boolean partition == per-split masked re-sort
    over the unseen prefix (the part every metric reads)."""
    import jax.numpy as jnp
    import numpy as np

    from deeplearningrecommendationsystem_tpu.eval.recommend import (
        full_ranking,
        score_ranking,
        seen_to_tail,
    )

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(7, 23)).astype(np.float32))
    seen = jnp.asarray(rng.random((7, 23)) < 0.3)
    a = np.asarray(full_ranking(scores, seen))
    b = np.asarray(seen_to_tail(score_ranking(scores), seen))
    n_unseen = np.asarray((~np.asarray(seen)).sum(1))
    for u in range(7):
        np.testing.assert_array_equal(a[u, : n_unseen[u]], b[u, : n_unseen[u]])
        # tail holds exactly the seen items in both
        assert set(a[u, n_unseen[u]:]) == set(b[u, n_unseen[u]:])
