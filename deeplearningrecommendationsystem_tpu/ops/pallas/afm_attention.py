"""Fused AFM pairwise-product attention pooling as a Pallas kernel.

The XLA path (ops/interactions.pairwise_products + ops/attention.afm_attention)
materializes the [B, P, D] pair-product tensor (P = F(F-1)/2 = 15) and its
[B, P, A] attention activations in HBM. This kernel tiles rows, forms each
pair product in VMEM, scores it immediately, and writes only the pooled
[TB, D] result -- the [B, P, D] tensor never exists in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(num_fields: int):
    pairs = [(i, j) for i in range(num_fields) for j in range(i + 1, num_fields)]

    def kernel(e_ref, w_ref, b_ref, h_ref, out_ref):
        TB, F, D = e_ref.shape
        e = e_ref[:]  # [TB, F, D]
        w = w_ref[:]  # [D, A]
        b = b_ref[0]  # [A]
        h = h_ref[:]  # [A, 1]

        prods = []
        scores = []
        for i, j in pairs:  # static unroll over the 15 pairs
            c = e[:, i, :] * e[:, j, :]  # [TB, D]
            a = jnp.maximum(
                jnp.dot(c, w, preferred_element_type=jnp.float32) + b[None, :], 0.0
            )
            s = jnp.dot(a, h, preferred_element_type=jnp.float32)  # [TB, 1]
            prods.append(c)
            scores.append(s)
        s = jnp.concatenate(scores, axis=1)  # [TB, P]
        s = s - jnp.max(s, axis=1, keepdims=True)
        wts = jnp.exp(s)
        wts = wts / jnp.sum(wts, axis=1, keepdims=True)
        pooled = jnp.zeros_like(prods[0])
        for p, c in enumerate(prods):
            pooled = pooled + wts[:, p : p + 1] * c
        out_ref[:] = pooled

    return kernel


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def afm_attention_pool_pallas(
    fields: jnp.ndarray,  # [B, F, D] stacked field embeddings
    att_w: jnp.ndarray,  # [D, A]
    att_b: jnp.ndarray,  # [A]
    att_h: jnp.ndarray,  # [A, 1]
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, F, D = fields.shape
    b2d = att_b.reshape(1, -1)
    B_pad = ((B + block_rows - 1) // block_rows) * block_rows
    if B_pad != B:
        fields = jnp.concatenate(
            [fields, jnp.zeros((B_pad - B, F, D), fields.dtype)], axis=0
        )

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_kernel(F),
        out_shape=jax.ShapeDtypeStruct((B_pad, D), fields.dtype),
        grid=(B_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, F, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full(att_w),
            full(b2d),
            full(att_h),
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fields, att_w, b2d, att_h)
    return out[:B]
