"""Recommender serving API: top-k, seen exclusion, checkpoint loading."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.models import MatrixFactorization, ServingContext
from deeplearningrecommendationsystem_tpu.runtime.checkpoint import CheckpointManager
from deeplearningrecommendationsystem_tpu.serving import Recommender


def make_ctx(U=30, I=40):
    rng = np.random.default_rng(0)
    return ServingContext(
        user_features=jnp.asarray(rng.random((U, 24), dtype=np.float32)),
        item_features=jnp.asarray(rng.random((I, 19), dtype=np.float32)),
    )


def test_topk_and_seen_exclusion():
    U, I = 30, 40
    model = MatrixFactorization(U, I, 8)
    params = model.init(jax.random.PRNGKey(0))
    seen = np.zeros((U, I), dtype=bool)
    seen[0, :35] = True  # user 0 has seen almost everything
    rec = Recommender(model, params, make_ctx(U, I), seen=seen)
    top = rec.top_k(5)
    assert top.shape == (U, 5)
    assert set(top[0]) <= set(range(35, 40))  # only unseen items for user 0

    subset = rec.top_k(3, users=[2, 7])
    assert subset.shape == (2, 3)
    np.testing.assert_array_equal(subset[0], top[2][:3])

    scores = rec.score(1, [0, 1, 2])
    assert scores.shape == (3,)


def test_from_checkpoint(tmp_path):
    U, I = 30, 40
    model = MatrixFactorization(U, I, 8)
    params = model.init(jax.random.PRNGKey(3))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, params)
    mgr.close()

    rec = Recommender.from_checkpoint(model, str(tmp_path / "ck"), make_ctx(U, I))
    direct = Recommender(model, params, make_ctx(U, I))
    np.testing.assert_allclose(
        np.asarray(rec.scores), np.asarray(direct.scores), atol=1e-6
    )
