"""DP + row-sharded embedding on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.models import DeepFM, MatrixFactorization
from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC
from deeplearningrecommendationsystem_tpu.parallel import (
    ShardedEmbedding,
    make_mesh,
    pad_and_shard,
    sharded_gather,
)
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(data=2, model=4)
    assert mesh2.shape == {"data": 2, "model": 4}


def test_sharded_gather_matches_dense():
    mesh = make_mesh(data=2, model=4)
    key = jax.random.PRNGKey(0)
    emb = ShardedEmbedding(vocab=64, dim=16, mesh=mesh)
    table = emb.init(key)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, 37))
    dense = np.asarray(table)[np.asarray(ids)]
    sharded = np.asarray(emb.lookup(table, ids))
    np.testing.assert_allclose(sharded, dense, rtol=1e-6)


def test_sharded_gather_gradients_match_dense():
    mesh = make_mesh(data=1, model=8)
    table = jax.random.normal(jax.random.PRNGKey(1), (40, 8))
    ids = jnp.asarray([0, 5, 5, 39, 12])
    cot = jax.random.normal(jax.random.PRNGKey(2), (5, 8))

    def loss_sharded(t):
        return jnp.sum(sharded_gather(t, ids, mesh) * cot)

    def loss_dense(t):
        return jnp.sum(t[ids] * cot)

    g_s = jax.grad(loss_sharded)(jax.device_put(table))
    g_d = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-6)


def test_gather_scatter_matches_dense_fwd_and_grad():
    from deeplearningrecommendationsystem_tpu.parallel.embedding import (
        sharded_gather_scatter,
        shard_table,
    )

    mesh = make_mesh(data=2, model=4)
    table = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 64, 40))  # 40 % 4 == 0
    cot = jax.random.normal(jax.random.PRNGKey(2), (40, 16))
    sharded = shard_table(table, mesh)

    out = np.asarray(sharded_gather_scatter(sharded, ids, mesh))
    np.testing.assert_allclose(out, np.asarray(table)[np.asarray(ids)], rtol=1e-6)

    def loss_scatter(t):
        return jnp.sum(sharded_gather_scatter(t, ids, mesh) * cot)

    def loss_dense(t):
        return jnp.sum(t[ids] * cot)

    g_s = jax.grad(loss_scatter)(sharded)
    g_d = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-6)


def test_sharded_embedding_scatter_strategy():
    mesh = make_mesh(data=2, model=4)
    emb = ShardedEmbedding(vocab=64, dim=16, mesh=mesh, strategy="scatter")
    table = emb.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, 40))
    np.testing.assert_allclose(
        np.asarray(emb.lookup(table, ids)),
        np.asarray(table)[np.asarray(ids)],
        rtol=1e-6,
    )


def test_gather_scatter_equals_psum_path():
    from deeplearningrecommendationsystem_tpu.parallel.embedding import (
        sharded_gather_scatter,
        shard_table,
    )

    mesh = make_mesh(data=1, model=8)
    table = jax.random.normal(jax.random.PRNGKey(4), (48, 8))
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 48, 64))
    sharded = shard_table(table, mesh)
    a = np.asarray(sharded_gather(sharded, ids, mesh))
    b = np.asarray(sharded_gather_scatter(sharded, ids, mesh))
    np.testing.assert_array_equal(a, b)


def test_dp_training_matches_single_device(ml100k):
    """A DP-sharded full-batch step must reproduce the unsharded run."""
    mesh = make_mesh(data=8, model=1)
    U, I = ml100k.num_users, ml100k.num_items
    model = MatrixFactorization(U, I, 8)
    trainer = Trainer(model, TrainConfig(learning_rate=0.01, epochs=5))

    n = 1003  # deliberately not divisible by 8
    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.integers(0, U, n))
    items = jnp.asarray(rng.integers(0, I, n))
    y = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))

    res_single = trainer.fit(jax.random.PRNGKey(0), ((users, items), y))

    batch, labels, weights = pad_and_shard((users, items), y, mesh)
    res_dp = trainer.fit(
        jax.random.PRNGKey(0), (batch, labels), weights={"train": weights}
    )

    np.testing.assert_allclose(
        np.asarray(res_single.history["train_loss"]),
        np.asarray(res_dp.history["train_loss"]),
        rtol=2e-5,
    )
    for a, b in zip(jax.tree.leaves(res_single.params), jax.tree.leaves(res_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_deepfm_step_under_2d_mesh(ml100k):
    """DeepFM full train step jits and runs under a (data=4, model=2) mesh."""
    mesh = make_mesh(data=4, model=2)
    model = DeepFM(ML100K_SPEC, hidden_units=(16, 8, 1), embedding_dim=8)
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, epochs=2))
    X = jnp.asarray(ml100k.feature_matrix(ml100k.valid)[:512])
    y = jnp.ones((512,), dtype=jnp.float32)
    batch, labels, weights = pad_and_shard(X, y, mesh)
    res = trainer.fit(jax.random.PRNGKey(0), (batch, labels), weights={"train": weights})
    assert np.isfinite(np.asarray(res.history["train_loss"])).all()


def test_shard_table_pads_non_divisible_vocab():
    from deeplearningrecommendationsystem_tpu.parallel import shard_table

    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(3)
    vocab, dim = 943, 16  # ml-100k user vocab: not divisible by 4
    table = jnp.asarray(rng.normal(size=(vocab, dim)).astype(np.float32))
    sharded = shard_table(table, mesh)
    assert sharded.shape[0] == 944  # padded up to the model axis
    np.testing.assert_allclose(np.asarray(sharded)[:vocab], np.asarray(table))
    np.testing.assert_allclose(np.asarray(sharded)[vocab:], 0.0)

    ids = jnp.asarray(rng.integers(0, vocab, 51))
    got = np.asarray(sharded_gather(sharded, ids, mesh))
    np.testing.assert_allclose(got, np.asarray(table)[np.asarray(ids)], rtol=1e-6)

    # gradient flows only into real rows; pad rows stay zero
    def loss(t):
        return jnp.sum(sharded_gather(t, ids, mesh) ** 2)

    g = np.asarray(jax.grad(loss)(sharded))
    np.testing.assert_allclose(g[vocab:], 0.0)
    dense_g = np.zeros((vocab, dim), np.float32)
    np.add.at(dense_g, np.asarray(ids), 2 * np.asarray(table)[np.asarray(ids)])
    np.testing.assert_allclose(g[:vocab], dense_g, rtol=1e-5)
