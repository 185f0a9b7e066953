"""Fused DIN activation-unit attention + pooling as a Pallas kernel.

RETIRED -- measured loser: 0.28x vs XLA at the ml-100k serving shape
(KERNEL_BENCH.json::din_attention). Kept as a measurement artifact and as the
starting point for shapes where fusion could win (long histories, wide
embeddings); NOT routed by any default path -- do not re-enable without a new
winning measurement on the target shape.

Benchmark verdict (tools/bench_kernels.py, v5e, [107k, 10, 64] f32): after
porting this kernel's concat-decomposition identity back into the XLA path
(ops/attention.py), XLA runs the op in ~2.3 ms vs ~7.4 ms for the best of
three Pallas formulations tried (per-position matmuls; flat [TB*L, D] via
in-kernel reshape -- relayout-bound; concat-of-slices along rows). The
L=10 / D=64 shape leaves the MXU underfed per tile and Mosaic relayouts eat
the fusion win, so the XLA path is the default and this kernel stays opt-in
(`DIN(pallas_serving=True)`) as the starting point for shapes where fusion
does win (longer histories, wider embeddings).

Layout notes (why the kernel is written per-position):
* slicing position l gives clean [TB, D] tiles; reshaping [TB, L, D] ->
  [TB*L, D] inside the kernel forces Mosaic relayouts that cost more than the
  matmuls themselves (measured 14x slower than XLA);
* per-position scores are staged into columns of a [TB, 16] VMEM scratch so
  the softmax reduces across lanes, not across a 10-wide trailing dim.

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

_SCORE_COLS = 16  # scores scratch lane count (>= L, multiple of 8)


def _kernel(hist_ref, tgt_ref, wh_ref, wt_ref, b1_ref, w2_ref, b2_ref, w3_ref, out_ref, s_ref):
    TB, L, D = hist_ref.shape
    # target contribution + layer-1 bias, once per row
    t1 = (
        jnp.dot(tgt_ref[:], wt_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[0][None, :]
    )  # [TB, H1]

    for l in range(L):  # static unroll over history positions
        h_l = hist_ref[:, l, :]  # [TB, D]
        x1 = jnp.maximum(
            jnp.dot(h_l, wh_ref[:], preferred_element_type=jnp.float32) + t1, 0.0
        )
        x2 = jnp.maximum(
            jnp.dot(x1, w2_ref[:], preferred_element_type=jnp.float32)
            + b2_ref[0][None, :],
            0.0,
        )
        s_ref[:, l : l + 1] = jnp.dot(x2, w3_ref[:], preferred_element_type=jnp.float32)

    # softmax over the L used columns of the [TB, 16] scratch
    col = jax.lax.broadcasted_iota(jnp.int32, (TB, _SCORE_COLS), 1)
    s = jnp.where(col < L, s_ref[:], -1e30)
    s = s - jnp.max(s, axis=1, keepdims=True)
    w = jnp.exp(s)
    w = w / jnp.sum(w, axis=1, keepdims=True)

    acc = w[:, 0:1] * hist_ref[:, 0, :]
    for l in range(1, L):
        acc = acc + w[:, l : l + 1] * hist_ref[:, l, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def din_attention_pool_pallas(
    hist_embed: jnp.ndarray,  # [B, L, D]
    target_embed: jnp.ndarray,  # [B, D]
    att_mlp: List[dict],  # 3 linear layers: 3D->H1->H2->1
    block_rows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    B, L, D = hist_embed.shape
    assert L <= _SCORE_COLS, f"history length {L} > score scratch {_SCORE_COLS}"
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
        scratch_shapes=[pltpu.VMEM((block_rows, _SCORE_COLS), jnp.float32)],
        interpret=interpret,
    )(hist_embed, target_embed, wh, wt, b1, w2, b2, w3)
    return out[:B]
