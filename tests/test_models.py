"""Model zoo: shapes, differentiability, and catalog-scoring consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC
from deeplearningrecommendationsystem_tpu.models import (
    AFM,
    AutoRec,
    DCN,
    DeepCrossing,
    DeepFM,
    DIEN,
    DIN,
    FFM,
    LogisticRegression,
    MatrixFactorization,
    NeuralCF,
    NFM,
    PNN,
    ServingContext,
    WideDeep,
)

SPEC = ML100K_SPEC
U, I = SPEC.num_users, SPEC.num_items


def tiny_feature_models():
    return [
        LogisticRegression(SPEC),
        WideDeep(SPEC, hidden_units=(16, 8, 1), embedding_dim=8),
        DeepFM(SPEC, hidden_units=(16, 8, 1), embedding_dim=8),
        NFM(SPEC, hidden_units=(16, 8, 1), embedding_dim=8),
        AFM(SPEC, embedding_dim=8, attention_dim=4),
        PNN(SPEC, embedding_dim=8, hidden_units=(16, 8)),
        PNN(SPEC, embedding_dim=8, hidden_units=(16, 8), mode="out"),
        DeepCrossing(SPEC, embedding_dim=8, hidden_units=(16, 8)),
        DCN(SPEC, cross_layers=2, deep_hidden_units=(16, 1), embedding_dim=8),
        FFM(SPEC, num_vector=8),
    ]


def fake_feature_batch(rng, n=32):
    u = rng.integers(0, U, n)
    i = rng.integers(0, I, n)
    age = rng.random(n)[:, None].astype(np.float32)
    gender = np.eye(2, dtype=np.float32)[rng.integers(0, 2, n)]
    occ = np.eye(21, dtype=np.float32)[rng.integers(0, 21, n)]
    genre = (rng.random((n, 19)) < 0.2).astype(np.float32)
    return np.concatenate(
        [u[:, None].astype(np.float32), i[:, None].astype(np.float32), age, gender, occ, genre],
        axis=1,
    )


@pytest.mark.parametrize("model", tiny_feature_models(), ids=lambda m: type(m).__name__ + getattr(m, "mode", ""))
def test_feature_models_forward_and_grad(model):
    rng = np.random.default_rng(0)
    x = jnp.asarray(fake_feature_batch(rng))
    params = model.init(jax.random.PRNGKey(0))
    logits = model.apply(params, x)
    assert logits.shape == (32,)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(p):
        return jnp.mean(model.apply(p, x) ** 2)

    grads = jax.grad(loss)(params)
    leaf_norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(leaf_norms))
    assert max(leaf_norms) > 0


def test_pair_models():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.integers(0, U, 64))
    i = jnp.asarray(rng.integers(0, I, 64))
    for model in [
        MatrixFactorization(U, I, 8),
        NeuralCF(U, I, mf_dim=8, layers=(16, 8)),
    ]:
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, (u, i))
        assert out.shape == (64,)


def test_seq_models():
    rng = np.random.default_rng(0)
    hist = jnp.asarray(rng.integers(0, I, (16, 10)))
    target = jnp.asarray(rng.integers(0, I, 16))
    for model in [
        DIN(I, embed_size=8, attention_units=(16, 1), fc_units=(16, 1)),
        DIN(I, embed_size=8, attention_units=(16, 1), fc_units=(16, 1), mask_padding=True),
        DIEN(I, embed_size=8, attention_units=(16, 1), fc_units=(16, 1)),
        DIEN(I, embed_size=8, attention_units=(16, 1), fc_units=(16, 1), use_augru=True),
    ]:
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, (hist, target))
        assert out.shape == (16,)
        assert np.isfinite(np.asarray(out)).all()


def test_din_indirect_hist_equivalent():
    """indirect_hist training batch format: forward values EXACTLY equal the
    standard path (the history embedding is the same gather composed), and
    gradients match up to the one-hot-matmul summation regrouping."""
    rng = np.random.default_rng(1)
    U, L, B = 12, 10, 64
    hist_u = jnp.asarray(rng.integers(0, I, (U, L)))
    uidx = jnp.asarray(rng.integers(0, U, B))
    target = jnp.asarray(rng.integers(0, I, B))
    kw = dict(embed_size=8, attention_units=(16, 1), fc_units=(16, 1))
    std = DIN(I, **kw)
    ind = DIN(I, indirect_hist=True, **kw)
    params = std.init(jax.random.PRNGKey(0))
    out_std = std.apply(params, (hist_u[uidx], target))
    out_ind = ind.apply(params, (hist_u, uidx, target))
    np.testing.assert_array_equal(np.asarray(out_std), np.asarray(out_ind))
    # mask_padding consistency (mask derives from the same [B, L] ids)
    std_m = DIN(I, mask_padding=True, **kw)
    ind_m = DIN(I, mask_padding=True, indirect_hist=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(std_m.apply(params, (hist_u[uidx], target))),
        np.asarray(ind_m.apply(params, (hist_u, uidx, target))),
    )
    # a 2-tuple batch falls back to the standard path
    np.testing.assert_array_equal(
        np.asarray(ind.apply(params, (hist_u[uidx], target))),
        np.asarray(out_std),
    )

    cot = jnp.asarray(rng.normal(size=B).astype(np.float32))
    g_std = jax.grad(lambda p: jnp.sum(std.apply(p, (hist_u[uidx], target)) * cot))(
        params
    )
    g_ind = jax.grad(lambda p: jnp.sum(ind.apply(p, (hist_u, uidx, target)) * cot))(
        params
    )
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_ind)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_dien_indirect_hist_equivalent():
    """DIEN port of DIN's per-user history dedup (VERDICT r4 #2): forward
    values EXACTLY equal the standard path; gradients match up to the
    one-hot-matmul summation regrouping; the aux-loss batch (2-D third
    element) still routes through the standard path."""
    rng = np.random.default_rng(3)
    U_, L, B = 12, 10, 64
    hist_u = jnp.asarray(rng.integers(0, I, (U_, L)))
    uidx = jnp.asarray(rng.integers(0, U_, B))
    target = jnp.asarray(rng.integers(0, I, B))
    kw = dict(embed_size=8, attention_units=(16, 1), fc_units=(16, 1))
    std = DIEN(I, **kw)
    ind = DIEN(I, indirect_hist=True, **kw)
    params = std.init(jax.random.PRNGKey(0))
    out_std = std.apply(params, (hist_u[uidx], target))
    out_ind = ind.apply(params, (hist_u, uidx, target))
    np.testing.assert_array_equal(np.asarray(out_std), np.asarray(out_ind))
    # a 2-tuple batch falls back to the standard path
    np.testing.assert_array_equal(
        np.asarray(ind.apply(params, (hist_u[uidx], target))), np.asarray(out_std)
    )
    # gradients: identical math, regrouped table-cotangent summation
    cot = jnp.asarray(rng.normal(size=B).astype(np.float32))
    g_std = jax.grad(lambda p: jnp.sum(std.apply(p, (hist_u[uidx], target)) * cot))(
        params
    )
    g_ind = jax.grad(lambda p: jnp.sum(ind.apply(p, (hist_u, uidx, target)) * cot))(
        params
    )
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_ind)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
    # aux-loss batches: standard 3-tuple (neg_hist 2-D) is NOT misrouted,
    # and the indirect 4-tuple matches it exactly
    neg_hist = jnp.asarray(rng.integers(0, I, (B, L)))
    l_std, a_std = std.apply_with_aux(params, (hist_u[uidx], target, neg_hist))
    l_ind, a_ind = ind.apply_with_aux(params, (hist_u, uidx, target, neg_hist))
    l_pass, a_pass = ind.apply_with_aux(params, (hist_u[uidx], target, neg_hist))
    np.testing.assert_array_equal(np.asarray(l_std), np.asarray(l_ind))
    np.testing.assert_array_equal(np.asarray(a_std), np.asarray(a_ind))
    np.testing.assert_array_equal(np.asarray(l_std), np.asarray(l_pass))


def test_mf_onehot_epoch_equivalent():
    """r5 layout-probe winner: the [D, B]-orientation one-hot epoch must
    produce the gather path's forward values (one-hot rows extract exact
    floats) and matching gradients."""
    rng = np.random.default_rng(5)
    B = 128
    users = jnp.asarray(rng.integers(0, U, B))
    items = jnp.asarray(rng.integers(0, I, B))
    std = MatrixFactorization(U, I, 16)
    oh = MatrixFactorization(U, I, 16, onehot_epoch=True)
    params = std.init(jax.random.PRNGKey(0))
    out_std = std.apply(params, (users, items))
    out_oh = oh.apply(params, (users, items))
    np.testing.assert_allclose(
        np.asarray(out_std), np.asarray(out_oh), rtol=1e-6, atol=1e-7
    )
    cot = jnp.asarray(rng.normal(size=B).astype(np.float32))
    g_std = jax.grad(lambda p: jnp.sum(std.apply(p, (users, items)) * cot))(params)
    g_oh = jax.grad(lambda p: jnp.sum(oh.apply(p, (users, items)) * cot))(params)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_oh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # EP routing wins over the one-hot path (sharded tables need collectives)
    from deeplearningrecommendationsystem_tpu.parallel import (
        make_mesh,
        shard_model_tables,
    )
    from deeplearningrecommendationsystem_tpu.parallel.ep import (
        embedding_partitioning,
    )

    mesh = make_mesh(data=2, model=4)
    sharded, cfg_ep, _ = shard_model_tables(params, mesh)
    with embedding_partitioning(cfg_ep):
        out_ep = oh.apply(sharded, (users, items))
    np.testing.assert_allclose(
        np.asarray(out_std), np.asarray(out_ep), rtol=1e-6, atol=1e-7
    )


def test_gather_onehot_matches_native():
    """ops/embedding.gather_onehot == table[ids] exactly, fwd and bwd."""
    from deeplearningrecommendationsystem_tpu.ops.embedding import gather_onehot

    rng = np.random.default_rng(6)
    table = jnp.asarray(rng.normal(size=(57, 9)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 57, (4, 11)))
    np.testing.assert_array_equal(
        np.asarray(gather_onehot(table, ids)), np.asarray(table[ids])
    )
    cot = jnp.asarray(rng.normal(size=(4, 11, 9)).astype(np.float32))
    g_oh = jax.grad(lambda t: jnp.sum(gather_onehot(t, ids) * cot))(table)
    g_nat = jax.grad(lambda t: jnp.sum(t[ids] * cot))(table)
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_nat), rtol=1e-5,
                               atol=1e-6)


def test_autorec():
    model = AutoRec(num_input=I, hidden_units=16)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((8, I), dtype=np.float32))
    out = model.apply(params, x)
    assert out.shape == (8, I)


def test_catalog_scores_match_direct_apply(ml100k):
    """Tiled catalog scorer must agree with a direct forward on built rows."""
    ctx = ServingContext(
        user_features=jnp.asarray(ml100k.user_features),
        item_features=jnp.asarray(ml100k.item_features),
    )
    model = DeepFM(SPEC, hidden_units=(16, 8, 1), embedding_dim=8)
    params = model.init(jax.random.PRNGKey(1))
    scores = np.asarray(model.score_catalog(params, ctx))
    assert scores.shape == (U, I)

    rng = np.random.default_rng(2)
    for _ in range(5):
        u, i = int(rng.integers(0, U)), int(rng.integers(0, I))
        row = np.concatenate(
            [[u, i], ml100k.user_features[u], ml100k.item_features[i]]
        ).astype(np.float32)[None, :]
        direct = float(model.apply(params, jnp.asarray(row))[0])
        assert scores[u, i] == pytest.approx(direct, abs=1e-4)


def test_catalog_scores_pair_and_history(ml100k):
    mf = MatrixFactorization(U, I, 8)
    p = mf.init(jax.random.PRNGKey(0))
    ctx = ServingContext(
        user_features=jnp.asarray(ml100k.user_features),
        item_features=jnp.asarray(ml100k.item_features),
    )
    s = np.asarray(mf.score_catalog(p, ctx))
    direct = float(mf.apply(p, (jnp.asarray([3]), jnp.asarray([7])))[0])
    assert s[3, 7] == pytest.approx(direct, abs=1e-5)

    ncf = NeuralCF(U, I, mf_dim=8, layers=(16, 8))
    p = ncf.init(jax.random.PRNGKey(0))
    s = np.asarray(ncf.score_catalog(p, ctx))
    direct = float(ncf.apply(p, (jnp.asarray([10]), jnp.asarray([42])))[0])
    assert s[10, 42] == pytest.approx(direct, abs=1e-4)

    hist = jnp.asarray(ml100k.history_matrix(ml100k.train, 10))
    din = DIN(I, embed_size=8, attention_units=(16, 1), fc_units=(16, 1))
    p = din.init(jax.random.PRNGKey(0))
    ctx_h = ServingContext(ctx.user_features, ctx.item_features, history=hist)
    s = np.asarray(din.score_catalog(p, ctx_h))
    assert s.shape == (U, I)
    direct = float(din.apply(p, (hist[5][None, :], jnp.asarray([99])))[0])
    assert s[5, 99] == pytest.approx(direct, abs=1e-4)
