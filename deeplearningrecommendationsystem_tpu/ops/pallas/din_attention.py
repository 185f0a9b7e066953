"""Fused DIN activation-unit attention + pooling as a Pallas kernel.

The XLA path (ops/attention.py) materializes [B, L, 3D] concat features and
two [B, L, H] MLP activations in HBM between matmuls; at catalog-serving
batch sizes (B = users x items ~ 1.6M rows) that's gigabytes of HBM traffic.
This kernel tiles over rows and keeps every intermediate in VMEM: one HBM
read of the tile's history/target embeddings, one write of the pooled [TB, D]
output.

Math identities exploited:
* the first attention layer over concat([h, h - t, t]) @ W1 decomposes as
  h @ (W1_a + W1_b) + t @ (W1_c - W1_b) (split W1 into its three D-row
  blocks), so the concat is never built and the target term is computed once
  per row instead of once per (row, position);
* the final layer's bias shifts every position's score equally and cancels in
  the softmax, so it is dropped.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(hist_ref, tgt_ref, wh_ref, wt_ref, b1_ref, w2_ref, b2_ref, w3_ref, out_ref):
    TB, L, D = hist_ref.shape
    hist = hist_ref[:]  # [TB, L, D]
    tgt = tgt_ref[:]  # [TB, D]

    hist2d = hist.reshape(TB * L, D)
    # layer 1: fused concat-decomposition, target term broadcast over L
    x1 = jnp.dot(hist2d, wh_ref[:], preferred_element_type=jnp.float32)
    t1 = jnp.dot(tgt, wt_ref[:], preferred_element_type=jnp.float32)  # [TB, H1]
    x1 = x1.reshape(TB, L, -1) + t1[:, None, :] + b1_ref[0][None, None, :]
    x1 = jnp.maximum(x1, 0.0)
    H1 = x1.shape[-1]
    # layer 2
    x2 = jnp.dot(x1.reshape(TB * L, H1), w2_ref[:], preferred_element_type=jnp.float32)
    x2 = jnp.maximum(x2 + b2_ref[0][None, :], 0.0)  # [TB*L, H2]
    # layer 3 -> scores [TB, L] (bias dropped: softmax-invariant)
    s = jnp.dot(x2, w3_ref[:], preferred_element_type=jnp.float32)
    s = s.reshape(TB, L)
    # softmax over L + weighted pool (L is tiny: VPU elementwise + reduce)
    s = s - jnp.max(s, axis=1, keepdims=True)
    w = jnp.exp(s)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    out_ref[:] = jnp.sum(w[:, :, None] * hist, axis=1)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def din_attention_pool_pallas(
    hist_embed: jnp.ndarray,  # [B, L, D]
    target_embed: jnp.ndarray,  # [B, D]
    att_mlp: List[dict],  # 3 linear layers: 3D->H1->H2->1
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    B, L, D = hist_embed.shape
    w1, w2, w3 = att_mlp[0]["w"], att_mlp[1]["w"], att_mlp[2]["w"]
    b1, b2 = att_mlp[0]["b"], att_mlp[1]["b"]
    assert w1.shape[0] == 3 * D, "attention layer 1 must take [h, h-t, t]"
    # concat decomposition: rows [0:D] act on h, [D:2D] on (h-t), [2D:3D] on t
    wh = w1[:D] + w1[D : 2 * D]
    wt = w1[2 * D :] - w1[D : 2 * D]
    b1 = b1.reshape(1, -1)
    b2 = b2.reshape(1, -1)

    B_pad = ((B + block_rows - 1) // block_rows) * block_rows
    if B_pad != B:
        pad = B_pad - B
        hist_embed = jnp.concatenate(
            [hist_embed, jnp.zeros((pad, L, D), hist_embed.dtype)], axis=0
        )
        target_embed = jnp.concatenate(
            [target_embed, jnp.zeros((pad, D), target_embed.dtype)], axis=0
        )

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B_pad, D), hist_embed.dtype),
        grid=(B_pad // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full(wh),
            full(wt),
            full(b1),
            full(w2),
            full(b2),
            full(w3),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(hist_embed, target_embed, wh, wt, b1, w2, b2, w3)
    return out[:B]
