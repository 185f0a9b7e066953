"""Fused DIN head kernel (ops/pallas/din_head.py) vs the XLA path.

The kernel must be a drop-in for attention_pool + mlp (the differentiable
training head, reference model/din.py:14-29,39-51): same logits, same
gradients w.r.t. embeddings AND both MLPs' params -- including when the batch
does not divide the block size (padded-row masking) and when inputs are bf16.
Runs in Pallas interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplearningrecommendationsystem_tpu.models import DIN
from deeplearningrecommendationsystem_tpu.ops.attention import attention_pool
from deeplearningrecommendationsystem_tpu.ops.linear import mlp
from deeplearningrecommendationsystem_tpu.ops.pallas.din_head import din_head_fused


def _setup(B=70, L=10, D=64, seed=0):
    model = DIN(num_items=200, embed_size=D)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    hist_e = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    target_e = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    return params, hist_e, target_e


def _xla_head(att, fc, hist_e, target_e):
    pooled = attention_pool(att, hist_e, target_e)
    x = jnp.concatenate([pooled, target_e], axis=-1)
    return mlp(fc, x)[:, 0]


def test_forward_matches_xla_including_ragged_last_block():
    params, hist_e, target_e = _setup(B=70)  # 70 = 2x32 + 6: ragged block
    want = _xla_head(params["att"], params["fc"], hist_e, target_e)
    got = din_head_fused(
        params["att"], params["fc"], hist_e, target_e,
        block_rows=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    params, hist_e, target_e = _setup(B=96)
    cot = jnp.asarray(
        np.random.default_rng(7).normal(size=(96,)).astype(np.float32)
    )

    def loss(fn, att, fc, h, t):
        return jnp.sum(fn(att, fc, h, t) * cot)

    fused = lambda a, f, h, t: din_head_fused(  # noqa: E731
        a, f, h, t, block_rows=32, interpret=True
    )
    g_got = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2, 3))(
        params["att"], params["fc"], hist_e, target_e
    )
    g_want = jax.grad(lambda *a: loss(_xla_head, *a), argnums=(0, 1, 2, 3))(
        params["att"], params["fc"], hist_e, target_e
    )
    for got, want in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_want)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-5
        )


def test_padded_rows_do_not_pollute_weight_grads():
    """Same weight grads whether B=64 (exact blocks) or the same 64 rows are
    evaluated as part of a ragged grid -- i.e. padding contributes zero."""
    params, hist_e, target_e = _setup(B=64)

    def wgrads(block_rows):
        f = lambda att, fc: jnp.sum(  # noqa: E731
            din_head_fused(att, fc, hist_e, target_e,
                           block_rows=block_rows, interpret=True)
        )
        return jax.grad(f, argnums=(0, 1))(params["att"], params["fc"])

    exact = wgrads(32)     # 64 = 2 full blocks
    ragged = wgrads(48)    # 64 = 48 + 16: last block half-padded
    # different block groupings reassociate the f32 accumulation, so allow
    # rounding-level drift; pollution by garbage rows would be orders larger
    for a, b in zip(jax.tree.leaves(exact), jax.tree.leaves(ragged)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6
        )


def test_bf16_inputs_supported():
    params, hist_e, target_e = _setup(B=32)
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t,
    )
    p16 = cast(params)
    got = din_head_fused(
        p16["att"], p16["fc"], cast(hist_e), cast(target_e),
        block_rows=32, interpret=True,
    )
    assert got.dtype == jnp.bfloat16
    want = _xla_head(params["att"], params["fc"], hist_e, target_e)
    # f32 in-kernel accumulation: bf16 only on load/store
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_din_model_fused_flag_end_to_end_gradients():
    """DIN(fused_head=True) trains: value+grad finite and close to the
    default path on a real (hist ids, target ids) batch."""
    model = DIN(num_items=100, embed_size=64)
    fused = DIN(num_items=100, embed_size=64, fused_head=True)
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    batch = (
        jnp.asarray(rng.integers(0, 100, (40, 10))),
        jnp.asarray(rng.integers(0, 100, 40)),
    )
    y = jnp.asarray((rng.random(40) < 0.5).astype(np.float32))

    import deeplearningrecommendationsystem_tpu.ops.pallas.din_head as dh
    import functools

    orig = dh.din_head_fused
    dh.din_head_fused = functools.partial(orig, interpret=True, block_rows=32)
    try:
        def loss(m, p):
            logits = m.apply(p, batch)
            return jnp.mean(
                jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )

        v1, g1 = jax.value_and_grad(lambda p: loss(model, p))(params)
        v2, g2 = jax.value_and_grad(lambda p: loss(fused, p))(params)
    finally:
        dh.din_head_fused = orig
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)
