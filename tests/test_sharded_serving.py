"""Sharded serving (parallel/serving.py): EP top-k lists == dense lists.

VERDICT r3 next #5: training could leave tables row-sharded, but serving
always unsharded -- at production vocabs a replicated table is exactly what
doesn't fit. These tests prove, on the 8-device virtual CPU mesh, that the
item-sharded local-top-k + candidate-all_gather path produces EXACTLY the
dense ``mask + lax.top_k`` lists (tie order included), end-to-end from a
sparse-EP training run that never unshards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.models import MatrixFactorization
from deeplearningrecommendationsystem_tpu.models.base import ServingContext
from deeplearningrecommendationsystem_tpu.parallel import (
    make_mesh,
    shard_model_tables,
    sharded_catalog_topk,
    sharded_topk,
)
from deeplearningrecommendationsystem_tpu.train import (
    TrainConfig,
    Trainer,
    fit_minibatch_sparse,
)


def _dense_topk(P, Q, num_items, k, seen=None):
    scores = (P @ Q[:num_items].T).astype(jnp.float32)
    if seen is not None:
        scores = jnp.where(seen[:, :num_items].astype(bool), -1e30, scores)
    return jax.lax.top_k(scores, k)


def _ctx(num_users, num_items):
    return ServingContext(
        user_features=jnp.zeros((num_users, 24)),
        item_features=jnp.zeros((num_items, 19)),
    )


@pytest.mark.parametrize("model_axis", [2, 4])
@pytest.mark.parametrize("with_seen", [False, True])
def test_sharded_topk_matches_dense(model_axis, with_seen):
    mesh = make_mesh(data=8 // model_axis, model=model_axis)
    U, I, D, k = 53, 202, 16, 17  # vocab NOT divisible by the axis: pad path
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    Q_dense = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    seen = jnp.asarray(rng.random((U, I)) < 0.1) if with_seen else None

    from deeplearningrecommendationsystem_tpu.parallel import shard_table

    Q = shard_table(Q_dense, mesh)  # pads vocab to the model axis
    v_s, i_s = sharded_topk(P, Q, mesh, I, k, seen=seen)
    v_d, i_d = _dense_topk(P, Q_dense, I, k, seen=seen)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_d))
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_d), rtol=1e-6)


def test_sharded_topk_ties_follow_dense_order():
    # deliberate cross-shard and in-shard score ties: list order must still
    # match lax.top_k's lowest-index rule
    mesh = make_mesh(data=2, model=4)
    U, I, D, k = 4, 32, 4, 8
    P = jnp.ones((U, D), jnp.float32)
    # score(item j) = j % 8: every score value ties across ALL FOUR shards
    # (shards own 8 contiguous ids each), so the final candidate top-k must
    # reproduce the dense lowest-index-first order across shard boundaries
    Q_dense = jnp.asarray(
        (np.arange(I) % 8)[:, None] * np.ones((1, D), np.float32) / D
    )
    from deeplearningrecommendationsystem_tpu.parallel import shard_table

    Q = shard_table(Q_dense, mesh)
    v_s, i_s = sharded_topk(P, Q, mesh, I, k)
    v_d, i_d = _dense_topk(P, Q_dense, I, k)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_d))


def test_sparse_ep_train_then_sharded_serve_end_to_end():
    """Train MF with the sparse-EP trainer, NEVER unshard, serve sharded;
    lists must equal the unsharded-params dense serving path."""
    mesh = make_mesh(data=2, model=4)
    U, I, k = 37, 91, 9
    model = MatrixFactorization(U, I, embedding_dim=8)
    rng_np = np.random.default_rng(3)
    n = 512
    batch = (
        jnp.asarray(rng_np.integers(0, U, n)),
        jnp.asarray(rng_np.integers(0, I, n)),
    )
    y = jnp.asarray((rng_np.random(n) < 0.5).astype(np.float32))
    trainer = Trainer(model, TrainConfig(learning_rate=0.05, epochs=3))

    res_sharded = fit_minibatch_sparse(
        trainer, jax.random.PRNGKey(0), (batch, y), batch_size=128,
        mesh=mesh, unshard=False,
    )
    assert res_sharded.ep_heights, "expected sharded tables + recorded heights"
    res_dense = fit_minibatch_sparse(
        trainer, jax.random.PRNGKey(0), (batch, y), batch_size=128, mesh=mesh,
    )

    ctx = _ctx(U, I)
    seen = jnp.asarray(rng_np.random((U, I)) < 0.15)
    v_s, i_s = sharded_catalog_topk(
        model, res_sharded.params, ctx, mesh, k, seen=seen
    )
    Pd, Qd = model.serving_factors(res_dense.params, ctx)
    v_d, i_d = _dense_topk(Pd, Qd, I, k, seen=seen)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_d))
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_d), rtol=1e-5)

    # request-batch path: a subset of users
    users = jnp.asarray([0, 5, 36])
    v_u, i_u = sharded_catalog_topk(
        model, res_sharded.params, ctx, mesh, k, seen=seen, users=users
    )
    np.testing.assert_array_equal(
        np.asarray(i_u), np.asarray(i_d)[np.asarray(users)]
    )


def test_sharded_recommender_matches_dense_recommender():
    """ShardedRecommender over sharded params == Recommender over the same
    params unsharded (list-for-list)."""
    from deeplearningrecommendationsystem_tpu.serving import (
        Recommender,
        ShardedRecommender,
    )

    mesh = make_mesh(data=2, model=4)
    U, I, k = 30, 70, 7
    model = MatrixFactorization(U, I, embedding_dim=8)
    params_dense = model.init(jax.random.PRNGKey(5))
    params_sharded, _, _ = shard_model_tables(params_dense, mesh)
    ctx = _ctx(U, I)
    seen = np.random.default_rng(9).random((U, I)) < 0.2

    dense = Recommender(model, params_dense, ctx, seen=seen, use_pallas=False)
    sharded = ShardedRecommender(model, params_sharded, ctx, mesh, seen=seen)
    np.testing.assert_array_equal(sharded.top_k(k), dense.top_k(k))
    users = [2, 17, 29]
    np.testing.assert_array_equal(
        sharded.top_k(k, users=users), dense.top_k(k, users=users)
    )


@pytest.mark.parametrize("with_seen", [False, True])
def test_sharded_feature_topk_deepfm_matches_dense(with_seen):
    """General (non-factored) sharded serving, VERDICT r4 next #4: DeepFM's
    joint-MLP scorer over row-sharded tables must produce the dense
    Recommender's lists exactly -- each shard runs the full forward on its
    item block via table substitution, no unshard round-trip."""
    from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC
    from deeplearningrecommendationsystem_tpu.models import DeepFM
    from deeplearningrecommendationsystem_tpu.serving import (
        Recommender,
        ShardedRecommender,
    )

    mesh = make_mesh(data=2, model=4)
    spec = ML100K_SPEC
    U, I, k = spec.num_users, spec.num_items, 10
    model = DeepFM(spec, hidden_units=(16, 8, 1), embedding_dim=8)
    params_dense = model.init(jax.random.PRNGKey(2))
    params_sharded, _, _ = shard_model_tables(params_dense, mesh)

    rng = np.random.default_rng(4)
    ctx = ServingContext(
        user_features=jnp.asarray(rng.random((U, 24), dtype=np.float32)),
        item_features=jnp.asarray((rng.random((I, 19)) < 0.3).astype(np.float32)),
    )
    seen = (rng.random((U, I)) < 0.1) if with_seen else None

    dense = Recommender(model, params_dense, ctx, seen=seen, use_pallas=False)
    sharded = ShardedRecommender(model, params_sharded, ctx, mesh, seen=seen)
    np.testing.assert_array_equal(sharded.top_k(k), dense.top_k(k))
    users = [0, 17, 599, U - 1]
    np.testing.assert_array_equal(
        sharded.top_k(k, users=users), dense.top_k(k, users=users)
    )


def test_sharded_catalog_topk_rejects_sequence_models():
    from deeplearningrecommendationsystem_tpu.models import DIN

    mesh = make_mesh(data=2, model=4)
    model = DIN(100, embed_size=8, attention_units=(8, 1), fc_units=(8, 1))
    params = model.init(jax.random.PRNGKey(0))
    ctx = _ctx(10, 100)
    with pytest.raises(NotImplementedError, match="unshard"):
        sharded_catalog_topk(model, params, ctx, mesh, 5)


def test_fullbatch_trainer_keep_sharded():
    """Trainer.fit(unshard_params=False) leaves padded sharded tables and
    records heights; the sharded serving path on them matches the default
    unsharded run's lists."""
    mesh = make_mesh(data=2, model=4)
    U, I, k = 24, 50, 5
    model = MatrixFactorization(U, I, embedding_dim=8)
    rng_np = np.random.default_rng(7)
    n = 256
    batch = (
        jnp.asarray(rng_np.integers(0, U, n)),
        jnp.asarray(rng_np.integers(0, I, n)),
    )
    y = jnp.asarray((rng_np.random(n) < 0.5).astype(np.float32))

    def fit(unshard):
        tr = Trainer(
            model,
            TrainConfig(
                learning_rate=0.05, epochs=3, track_metrics=False,
                mesh=mesh, unshard_params=unshard,
            ),
        )
        return tr.fit(jax.random.PRNGKey(0), (batch, y))

    res_keep, res_unshard = fit(False), fit(True)
    assert res_keep.ep_heights and res_unshard.ep_heights is None
    assert res_keep.params["item"].shape[0] % 4 == 0  # padded vocab

    ctx = _ctx(U, I)
    v_s, i_s = sharded_catalog_topk(model, res_keep.params, ctx, mesh, k)
    Pd, Qd = model.serving_factors(res_unshard.params, ctx)
    v_d, i_d = _dense_topk(Pd, Qd, I, k)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_d))
