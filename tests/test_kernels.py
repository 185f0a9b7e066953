"""Pallas kernels vs XLA reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.ops.attention import (
    afm_attention,
    attention_pool,
)
from deeplearningrecommendationsystem_tpu.ops.interactions import pairwise_products
from deeplearningrecommendationsystem_tpu.ops.linear import mlp_init
from deeplearningrecommendationsystem_tpu.ops.pallas import (
    afm_attention_pool_pallas,
    din_attention_pool_pallas,
    gather_rows_pallas,
)


def test_din_attention_kernel_matches_xla():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    B, L, D = 100, 10, 64  # B deliberately not a block multiple
    hist = jax.random.normal(k1, (B, L, D))
    tgt = jax.random.normal(k2, (B, D))
    att = mlp_init(k3, (3 * D, 128, 64, 1))

    want = attention_pool(att, hist, tgt)
    got = din_attention_pool_pallas(hist, tgt, att, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_afm_attention_kernel_matches_xla():
    rng = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    B, F, D, A = 70, 6, 32, 16
    fields = jax.random.normal(k1, (B, F, D))
    w = jax.random.normal(k2, (D, A))
    b = jax.random.normal(k3, (A,))
    h = jax.random.normal(k4, (A, 1))

    want = afm_attention(w, b, h, pairwise_products(fields))
    got = afm_attention_pool_pallas(fields, w, b, h, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_afm_fused_attention_gradients_match_xla():
    """Training kernel (custom VJP): grads w.r.t. fields AND attention params
    match the XLA path, with a ragged last block."""
    from deeplearningrecommendationsystem_tpu.ops.pallas.afm_attention import (
        afm_attention_pool_fused,
    )

    rng = jax.random.PRNGKey(5)
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    B, F, D, A = 70, 6, 32, 16
    fields = jax.random.normal(k1, (B, F, D))
    w = jax.random.normal(k2, (D, A))
    b = jax.random.normal(k3, (A,))
    h = jax.random.normal(k4, (A, 1))
    cot = jax.random.normal(k5, (B, D))

    def loss(pool_fn, fields, w, b, h):
        return jnp.sum(pool_fn(fields, w, b, h) * cot)

    xla_pool = lambda f, w_, b_, h_: afm_attention(  # noqa: E731
        w_, b_, h_, pairwise_products(f)
    )
    fused_pool = lambda f, w_, b_, h_: afm_attention_pool_fused(  # noqa: E731
        f, w_, b_, h_, 16, True
    )
    v_want, g_want = jax.value_and_grad(
        lambda *a: loss(xla_pool, *a), argnums=(0, 1, 2, 3)
    )(fields, w, b, h)
    v_got, g_got = jax.value_and_grad(
        lambda *a: loss(fused_pool, *a), argnums=(0, 1, 2, 3)
    )(fields, w, b, h)
    np.testing.assert_allclose(float(v_got), float(v_want), rtol=1e-5)
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-5
        )


def test_afm_model_fused_flag_matches_default():
    """AFM(fused_attention=True) forward + grads == default AFM."""
    import functools

    import deeplearningrecommendationsystem_tpu.ops.pallas.afm_attention as mod
    from deeplearningrecommendationsystem_tpu.models import AFM

    base = AFM(embedding_dim=32, attention_dim=16)
    fused = AFM(embedding_dim=32, attention_dim=16, fused_attention=True)
    params = base.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = np.zeros((40, 45), np.float32)
    x[:, 0] = rng.integers(0, 943, 40)
    x[:, 1] = rng.integers(0, 1682, 40)
    x[:, 2] = rng.random(40)
    x[np.arange(40), 3 + rng.integers(0, 2, 40)] = 1
    x[np.arange(40), 5 + rng.integers(0, 21, 40)] = 1
    x[np.arange(40), 26 + rng.integers(0, 19, 40)] = 1
    x = jnp.asarray(x)
    y = jnp.asarray((rng.random(40) < 0.5).astype(np.float32))

    orig = mod.afm_attention_pool_fused
    # positional binding: custom_vjp with nondiff_argnums rejects kwargs
    mod.afm_attention_pool_fused = lambda f, w, b, h: orig(f, w, b, h, 16, True)
    try:
        def loss(m, p):
            lg = m.apply(p, x)
            return jnp.mean(
                jnp.maximum(lg, 0) - lg * y + jnp.log1p(jnp.exp(-jnp.abs(lg)))
            )

        v1, g1 = jax.value_and_grad(lambda p: loss(base, p))(params)
        v2, g2 = jax.value_and_grad(lambda p: loss(fused, p))(params)
    finally:
        mod.afm_attention_pool_fused = orig
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_gather_kernel_matches_take():
    rng = jax.random.PRNGKey(2)
    table = jax.random.normal(rng, (500, 128))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 500, 300), dtype=jnp.int32)
    want = table[ids]
    got = gather_rows_pallas(table, ids, block_rows=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_decomposed_din_attention_equals_literal_concat():
    """ops/attention.py's decomposition == the literal [h, h-t, t] concat MLP."""
    from deeplearningrecommendationsystem_tpu.ops.linear import mlp

    rng = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(rng, 3)
    B, L, D = 17, 10, 32
    hist = jax.random.normal(k1, (B, L, D))
    tgt = jax.random.normal(k2, (B, D))
    att = mlp_init(k3, (3 * D, 64, 32, 1))

    target = jnp.broadcast_to(tgt[:, None, :], hist.shape)
    feats = jnp.concatenate([hist, hist - target, target], axis=-1)
    want = jax.nn.softmax(mlp(att, feats)[..., 0], axis=-1)

    from deeplearningrecommendationsystem_tpu.ops.attention import din_attention_weights

    got = din_attention_weights(att, hist, tgt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_serving_topk_matmul_matches_lax_topk():
    """Fused score+mask+top-k == matmul -> mask -> lax.top_k, exactly
    (values AND tie-broken indices), incl. non-aligned U/I padding."""
    from deeplearningrecommendationsystem_tpu.ops.pallas import topk_serve_matmul

    rng = np.random.default_rng(1)
    U, I, D, k = 70, 300, 16, 10
    P = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    Q = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    seen = jnp.asarray(rng.random((U, I)) < 0.3)
    want_v, want_i = jax.lax.top_k(jnp.where(seen, -1e30, P @ Q.T), k)
    got_v, got_i = topk_serve_matmul(P, Q, seen, k=k, tile=16, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_serving_topk_scores_variant_and_ties():
    from deeplearningrecommendationsystem_tpu.ops.pallas import topk_scores_pallas

    rng = np.random.default_rng(2)
    U, I, k = 33, 400, 7
    # quantized scores force ties -> exercises first-lane tie-breaking
    scores = jnp.asarray(np.round(rng.normal(size=(U, I)) * 2).astype(np.float32))
    seen = jnp.asarray(rng.random((U, I)) < 0.2)
    want_v, want_i = jax.lax.top_k(jnp.where(seen, -1e30, scores), k)
    got_v, got_i = topk_scores_pallas(scores, seen, k=k, tile=16, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


def test_serving_topk_lr_factorization(ml100k):
    """LR's rank-1 serving_factors reproduce its catalog scores."""
    from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC
    from deeplearningrecommendationsystem_tpu.models import LogisticRegression
    from deeplearningrecommendationsystem_tpu.models.base import ServingContext

    model = LogisticRegression(ML100K_SPEC)
    params = model.init(jax.random.PRNGKey(0))
    ctx = ServingContext(
        user_features=jnp.asarray(ml100k.user_features),
        item_features=jnp.asarray(ml100k.item_features),
    )
    P, Q = model.serving_factors(params, ctx)
    np.testing.assert_allclose(
        np.asarray(P @ Q.T),
        np.asarray(model.score_catalog(params, ctx)),
        atol=1e-4,
    )


def test_gather_matmul_bwd_grads_match_scatter():
    """One-hot-matmul backward == the gather's native scatter-add gradient."""
    from deeplearningrecommendationsystem_tpu.ops.embedding import gather_matmul_bwd

    rng = np.random.default_rng(3)
    V, D = 37, 8
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, (11, 5)))  # [B, L] with repeats
    cot = jnp.asarray(rng.normal(size=(11, 5, D)).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(gather_matmul_bwd(table, ids)), np.asarray(table[ids]), atol=0
    )
    g_mm = jax.grad(lambda t: jnp.sum(gather_matmul_bwd(t, ids) * cot))(table)
    g_sc = jax.grad(lambda t: jnp.sum(t[ids] * cot))(table)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_sc), atol=1e-5)


def test_lr_matmul_gather_bwd_matches_default():
    """LogisticRegression(matmul_gather_bwd=True): same logits, same grads
    (the flag only swaps the bias-table scatter for a one-hot matmul)."""
    from deeplearningrecommendationsystem_tpu.models import LogisticRegression

    base = LogisticRegression()
    fast = LogisticRegression(matmul_gather_bwd=True)
    params = base.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = np.zeros((50, 45), np.float32)
    x[:, 0] = rng.integers(0, 943, 50)
    x[:, 1] = rng.integers(0, 1682, 50)
    x[:, 2:] = rng.random((50, 43))
    x = jnp.asarray(x)
    y = jnp.asarray((rng.random(50) < 0.5).astype(np.float32))

    def loss(m, p):
        lg = m.apply(p, x)
        return jnp.mean(
            jnp.maximum(lg, 0) - lg * y + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        )

    v1, g1 = jax.value_and_grad(lambda p: loss(base, p))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(fast, p))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lr_wide_input_matches_default():
    """LogisticRegression(wide_input=True) on widen(x): same logits and same
    param grads as the gather formulation (one-hot matmul == table[ids])."""
    from deeplearningrecommendationsystem_tpu.models import LogisticRegression

    base = LogisticRegression()
    wide = LogisticRegression(wide_input=True)
    params = base.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(4)
    x = np.zeros((60, 45), np.float32)
    x[:, 0] = rng.integers(0, 943, 60)
    x[:, 1] = rng.integers(0, 1682, 60)
    x[:, 2:] = rng.random((60, 43))
    x = jnp.asarray(x)
    xw = wide.widen(x)
    y = jnp.asarray((rng.random(60) < 0.5).astype(np.float32))

    np.testing.assert_allclose(
        np.asarray(wide.apply(params, xw)),
        np.asarray(base.apply(params, x)),
        atol=1e-6,
    )

    def loss(m, p, b):
        lg = m.apply(p, b)
        return jnp.mean(
            jnp.maximum(lg, 0) - lg * y + jnp.log1p(jnp.exp(-jnp.abs(lg)))
        )

    g1 = jax.grad(lambda p: loss(base, p, x))(params)
    g2 = jax.grad(lambda p: loss(wide, p, xw))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("mode", ["wide", "compact"])
def test_lr_fast_fit_matches_trainer(mode):
    """Fused LR training kernels (interpret mode): loss curve and final
    params match the generic Trainer's Adam/BCE to float tolerance -- both
    the r3 whole-epoch wide kernel and the r4 whole-run compact kernel
    (in-VMEM one-hot build, ops/pallas/lr_epoch.py)."""
    from deeplearningrecommendationsystem_tpu.models import LogisticRegression
    from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer

    model = LogisticRegression()
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(5)
    B = 90  # ragged vs the 64-row test block
    x = np.zeros((B, 45), np.float32)
    x[:, 0] = rng.integers(0, 943, B)
    x[:, 1] = rng.integers(0, 1682, B)
    x[:, 2:] = rng.random((B, 43))
    x = jnp.asarray(x)
    y = jnp.asarray((rng.random(B) < 0.5).astype(np.float32))

    tr = Trainer(model, TrainConfig(learning_rate=0.05, epochs=6, track_metrics=False))
    want = tr.fit(jax.random.PRNGKey(0), (x, y), params=jax.tree.map(jnp.copy, params))

    import deeplearningrecommendationsystem_tpu.ops.pallas.lr_epoch as lre

    name = {"wide": "lr_fullbatch_train", "compact": "lr_fullbatch_train_compact"}[mode]
    orig = getattr(lre, name)
    setattr(lre, name,
            lambda *a, **k: orig(*a, **{**k, "block_rows": 64, "interpret": True}))
    try:
        got_params, losses = model.fast_fit(
            params, x, y, epochs=6, learning_rate=0.05, mode=mode
        )
    finally:
        setattr(lre, name, orig)

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want.history["train_loss"]), rtol=1e-5
    )
    for key in ("user_bias", "item_bias"):
        np.testing.assert_allclose(
            np.asarray(got_params[key]), np.asarray(want.params[key]), atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(got_params["wide"]["w"]), np.asarray(want.params["wide"]["w"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got_params["wide"]["b"]), np.asarray(want.params["wide"]["b"]),
        atol=1e-5,
    )


def test_onehot_grad_kernel_matches_scatter_add():
    """Pallas in-VMEM-mask embedding backward (ops/pallas/onehot_grad.py,
    interpret mode): equals a scatter-add of cotangent rows for ragged N,
    D=1 bias tables, and bf16 cotangents."""
    from deeplearningrecommendationsystem_tpu.ops.pallas.onehot_grad import (
        onehot_grad,
    )

    rng = np.random.default_rng(7)
    for N, V, D, dtype in [
        (530, 1682, 16, np.float32),  # ragged vs the block size
        (256, 943, 1, np.float32),  # bias table
        (200, 100, 32, "bfloat16"),  # bf16 cotangents, f32 accumulation
    ]:
        ids = rng.integers(0, V, N)
        g32 = rng.standard_normal((N, D)).astype(np.float32)
        g = jnp.asarray(g32, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
        want = np.zeros((V, D), np.float32)
        np.add.at(want, ids, np.asarray(g, np.float32))
        got = onehot_grad(jnp.asarray(ids), g, V, block_rows=128, interpret=True)
        assert got.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(got), want, atol=1e-2 if dtype == "bfloat16" else 1e-4
        )


def test_mf_fused_kernel_matches_trainer(monkeypatch):
    """Whole-run fused MF kernel (ops/pallas/mf_epoch.py, interpret mode,
    f32): loss curve and final factor tables match the generic Trainer's
    Adam + weight decay to float tolerance. (Retired as a default route --
    measured loser at MF shapes, MF_FUSED_PROBE.json -- but the semantics
    stay oracle-locked.)"""
    from deeplearningrecommendationsystem_tpu.models import MatrixFactorization
    from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer
    import deeplearningrecommendationsystem_tpu.ops.pallas.mf_epoch as mfe

    rng = np.random.default_rng(0)
    U, I, D, B = 50, 81, 16, 300
    model = MatrixFactorization(U, I, D)
    params = model.init(jax.random.PRNGKey(2))
    batch = (jnp.asarray(rng.integers(0, U, B)),
             jnp.asarray(rng.integers(0, I, B)))
    y = jnp.asarray((rng.random(B) < 0.5).astype(np.float32))

    tr = Trainer(model, TrainConfig(learning_rate=0.01, weight_decay=1e-5,
                                    epochs=6, track_metrics=False,
                                    matmul_gather_bwd=True))
    want = tr.fit(jax.random.PRNGKey(0), (batch, y),
                  params=jax.tree.map(jnp.copy, params))

    monkeypatch.setattr(
        mfe, "mf_fullbatch_train",
        lambda *a, _o=mfe.mf_fullbatch_train, **k:
        _o(*a, **{**k, "block_rows": 64, "interpret": True}),
    )
    got, losses = model.fast_fit(
        jax.tree.map(jnp.copy, params), batch, y, 6, 0.01,
        weight_decay=1e-5, compute_dtype="float32",
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want.history["train_loss"]), rtol=2e-5
    )
    for k in ("user", "item"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want.params[k]), atol=2e-5
        )


def test_gather_mm_pallas_matches_native(monkeypatch):
    """Pallas mask-matmul gather (ops/pallas/gather_mm.py, interpret mode):
    forward bit-equal to table[ids] (incl. bf16 + 2D ids), backward equal to
    scatter-add."""
    import deeplearningrecommendationsystem_tpu.ops.pallas.gather_mm as gmm

    monkeypatch.setattr(
        gmm, "gather_mm_fwd_pallas",
        lambda table, ids, _o=gmm.gather_mm_fwd_pallas:
        _o(table, ids, block_rows=64, interpret=True),
    )
    monkeypatch.setattr(
        gmm, "onehot_grad",
        lambda ids, g, vocab, _o=gmm.onehot_grad:
        _o(ids, g, vocab, block_rows=64, interpret=True),
    )
    rng = np.random.default_rng(3)
    for V, D, N, dt in [(943, 64, 530, jnp.float32), (100, 16, 90, jnp.bfloat16)]:
        table = jnp.asarray(rng.standard_normal((V, D)), dt)
        ids = jnp.asarray(rng.integers(0, V, N))
        np.testing.assert_array_equal(
            np.asarray(gmm.gather_rows_mm_pallas(table, ids)),
            np.asarray(table[ids]),
        )
        gp = jax.grad(
            lambda t: jnp.sum(
                jnp.sin(gmm.gather_rows_mm_pallas(t, ids).astype(jnp.float32))
            )
        )(table)
        gx = jax.grad(
            lambda t: jnp.sum(jnp.sin(t[ids].astype(jnp.float32)))
        )(table)
        np.testing.assert_allclose(
            np.asarray(gp, np.float32), np.asarray(gx, np.float32),
            atol=3e-2 if dt == jnp.bfloat16 else 1e-5,
        )


def test_matmul_gather_backward_context_matches_default():
    """TrainConfig.matmul_gather_bwd: identical loss curve + final params to
    the scatter-backward default (the context only swaps the gather's VJP)."""
    from deeplearningrecommendationsystem_tpu.models import MatrixFactorization
    from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.integers(0, 50, 256)),
        jnp.asarray(rng.integers(0, 80, 256)),
    )
    y = jnp.asarray((rng.random(256) < 0.5).astype(np.float32))
    model = MatrixFactorization(50, 80, embedding_dim=16)
    fits = {}
    for flag in (False, True):
        tr = Trainer(
            model,
            TrainConfig(epochs=5, track_metrics=False, matmul_gather_bwd=flag),
        )
        fits[flag] = tr.fit(jax.random.PRNGKey(0), (batch, y))
    np.testing.assert_allclose(
        np.asarray(fits[False].history["train_loss"]),
        np.asarray(fits[True].history["train_loss"]),
        rtol=1e-6,
    )
    for a, b in zip(
        jax.tree.leaves(fits[False].params), jax.tree.leaves(fits[True].params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_topk_two_stage_exact_and_ties():
    """Group-max dominance: two-stage top-k == lax.top_k values; with
    distinct scores the indices match exactly too."""
    from deeplearningrecommendationsystem_tpu.ops.pallas import topk_two_stage

    rng = np.random.default_rng(5)
    U, I, D, k = 37, 1000, 16, 13
    P = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    Q = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))
    seen = jnp.asarray(rng.random((U, I)) < 0.1)
    wv, wi = jax.lax.top_k(jnp.where(seen, -1e30, P @ Q.T), k)
    gv, gi = topk_two_stage(P, Q, seen, k=k, group=64)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    # ties: returned indices must SCORE the returned values
    Pq = jnp.asarray(np.round(np.asarray(P)).astype(np.float32))
    Qq = jnp.asarray(np.round(np.asarray(Q)).astype(np.float32))
    sc = jnp.where(seen, -1e30, Pq @ Qq.T)
    wv, _ = jax.lax.top_k(sc, k)
    gv, gi = topk_two_stage(Pq, Qq, seen, k=k, group=64)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv), atol=0)
    got_scores = np.asarray(sc)[np.arange(U)[:, None], np.asarray(gi)]
    np.testing.assert_allclose(got_scores, np.asarray(gv), atol=0)


def test_trainer_onehot_gather_route_matches_default():
    """TrainConfig.onehot_gather (r5, ONEHOT_FWD_PROBE winners' route): the
    one-hot-matmul forward gathers must train identically to the default
    route -- same loss trajectory to regrouping tolerance, same params."""
    from deeplearningrecommendationsystem_tpu.models import FFM
    from deeplearningrecommendationsystem_tpu.features import ML100K_SPEC

    rng = np.random.default_rng(11)
    B = 256
    x = np.zeros((B, ML100K_SPEC.width), np.float32)
    x[:, 0] = rng.integers(0, ML100K_SPEC.num_users, B)
    x[:, 1] = rng.integers(0, ML100K_SPEC.num_items, B)
    x[:, 2] = rng.random(B)
    x[np.arange(B), 3 + rng.integers(0, 2, B)] = 1.0
    x[np.arange(B), 5 + rng.integers(0, 21, B)] = 1.0
    x[:, 26:] = rng.random((B, 19)) < 0.2
    x = jnp.asarray(x)
    y = jnp.asarray((rng.random(B) < 0.5).astype(np.float32))
    model = FFM(ML100K_SPEC, num_vector=8)

    from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer

    def fit(onehot):
        tr = Trainer(
            model,
            TrainConfig(
                learning_rate=0.01, epochs=4, track_metrics=False,
                matmul_gather_bwd=not onehot, onehot_gather=onehot,
            ),
        )
        return tr.fit(jax.random.PRNGKey(3), (x, y))

    res_d, res_o = fit(False), fit(True)
    np.testing.assert_allclose(
        np.asarray(res_d.history["train_loss"]),
        np.asarray(res_o.history["train_loss"]),
        rtol=2e-5, atol=1e-6,
    )
    for a, b in zip(jax.tree.leaves(res_d.params), jax.tree.leaves(res_o.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5)
