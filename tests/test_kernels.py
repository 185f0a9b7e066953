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
