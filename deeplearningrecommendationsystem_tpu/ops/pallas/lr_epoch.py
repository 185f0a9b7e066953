"""Whole-epoch fused LR training kernel: forward + BCE gradient + weight
gradient + torch-grade Adam in ONE Pallas call per full-batch epoch.

Why: LR's per-epoch math is trivial (~12 MFLOP) but the XLA scan body still
splits into many small fusions whose launch gaps dominate -- the measured
floor is ~3 ms/epoch (tools profile, r3) against <1 ms of HBM traffic. This
kernel streams the [B, F] design matrix through VMEM once per epoch,
accumulates the weight gradient in a VMEM scratch across the sequential
grid, and applies the Adam update in-kernel at the last block. One kernel
per epoch, zero interior fusion boundaries.

Semantics are the trainer's exactly (train/trainer.py + train/optim.py):
mean sigmoid-BCE-with-logits, pre-update loss recorded per epoch, torch
Adam (b1=.9, b2=.999, eps=1e-8, bias correction by global step). The model
is score = X_aug @ w where X_aug = [user one-hot, item one-hot, dense, 1]
-- identical parameters/updates to the gather formulation (models/lr.py
``wide_input`` notes; the trailing ones-column folds the linear bias in).
Reference analogue: model/lr.py:24-25 + scripts/lr.py:53-59.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 256


def _epoch_kernel(
    t_ref, x_ref, y_ref, w_ref, m_ref, v_ref,
    w_out, m_out, v_out, loss_out, dw_out,
    *, n_valid: int, block_rows: int, lr: float,
    b1: float, b2: float, eps: float,
):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    valid = rows + i * block_rows < n_valid

    # mask padded rows at LOAD (never multiply-mask later: out-of-bounds
    # reads may be NaN and NaN * 0 == NaN, poisoning dw through the dot)
    x = jnp.where(valid, x_ref[:], 0.0)  # [R, F]
    y = jnp.where(valid, y_ref[:], 0.0)  # [R, 1]
    w = w_ref[:]  # [F, 1]
    z = jax.lax.dot(x, w, preferred_element_type=jnp.float32)  # [R, 1]
    z = jnp.where(valid, z, 0.0)
    # mean BCE-with-logits and its gradient (pre-update loss, as the
    # reference records it)
    bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    bce = jnp.where(valid, bce, 0.0)
    g_out = jnp.where(valid, (jax.nn.sigmoid(z) - y) / n_valid, 0.0)

    dw_blk = jax.lax.dot_general(
        x, g_out, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [F, 1]

    # the gradient accumulator is an OUTPUT block (constant index), not a
    # scratch: outputs persist across sequential grid steps everywhere,
    # scratch does not persist in interpret mode
    @pl.when(i == 0)
    def _():
        dw_out[:] = dw_blk
        loss_out[0, 0] = jnp.sum(bce) / n_valid

    @pl.when(i > 0)
    def _():
        dw_out[:] = dw_out[:] + dw_blk
        loss_out[0, 0] = loss_out[0, 0] + jnp.sum(bce) / n_valid

    @pl.when(i == nblk - 1)
    def _():
        t = t_ref[0, 0].astype(jnp.float32)
        dw = dw_out[:]
        m = b1 * m_ref[:] + (1.0 - b1) * dw
        v = b2 * v_ref[:] + (1.0 - b2) * dw * dw
        # b**t as exp(t*log b): Mosaic has no powf lowering
        import math

        m_hat = m / (1.0 - jnp.exp(t * math.log(b1)))
        v_hat = v / (1.0 - jnp.exp(t * math.log(b2)))
        w_out[:] = w - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        m_out[:] = m
        v_out[:] = v


def lr_fullbatch_train(
    x_aug: jnp.ndarray,  # [B, F] f32 design matrix incl. trailing ones col
    y: jnp.ndarray,  # [B] f32 labels
    w0: jnp.ndarray,  # [F, 1] f32 initial weights (pad rows zero)
    epochs: int,
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
):
    """Train ``epochs`` full-batch Adam epochs; returns (w_final, losses).

    The epoch kernel runs under a ``lax.scan`` carrying (w, m, v); each epoch
    is exactly one fused device kernel.
    """
    B, F = x_aug.shape
    grid = (pl.cdiv(B, block_rows),)
    y2 = y.reshape(B, 1).astype(jnp.float32)

    call = pl.pallas_call(
        functools.partial(
            _epoch_kernel, n_valid=B, block_rows=block_rows,
            lr=learning_rate, b1=b1, b2=b2, eps=eps,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((F, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((F, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F, 1), jnp.float32),
            jax.ShapeDtypeStruct((F, 1), jnp.float32),
            jax.ShapeDtypeStruct((F, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((F, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )

    def epoch(carry, t):
        w, m, v = carry
        w2, m2, v2, loss, _ = call(t.reshape(1, 1), x_aug, y2, w, m, v)
        return (w2, m2, v2), loss[0, 0]

    init = (w0, jnp.zeros_like(w0), jnp.zeros_like(w0))
    (w, _, _), losses = jax.lax.scan(
        epoch, init, jnp.arange(1, epochs + 1, dtype=jnp.int32)
    )
    return w, losses


# ---------------------------------------------------------------------------
# Compact whole-RUN kernel: the id one-hots never touch HBM at all.
#
# The wide kernel above streams the materialized [B, F] design matrix from
# HBM every epoch (~742 MB/epoch at ml-100k) -- measured 1.34 ms/epoch, i.e.
# pinned at the HBM stream. But the one-hot blocks are a function of two int32
# ids per row: this kernel streams only [B] uid + [B] iid + the [B, 44] dense
# block (~36 MB/epoch, 20x less) and rebuilds each one-hot contribution
# in-VMEM with an iota==id compare mask. The whole multi-epoch run is ONE
# pallas_call with grid (epochs, row_blocks): weights/Adam moments live in
# constant-index output blocks that persist across the sequential TPU grid,
# so there are no per-epoch launches either.
#
# Weight layout is segment-padded to lane multiples:
#   [user | pad]  [item | pad]  [dense + ones-col | pad]   (each 128-aligned)
# stored as ONE [1, F2] row so every slice is a 128-aligned lane slice and
# the gradient re-assembles by lane-concat of offset-0 pieces (Mosaic concat
# rules, CLAUDE.md r3). Padded lanes see zero grad forever -> Adam keeps them
# exactly zero, same argument as the wide kernel's padded tail.
#
# Semantics are unchanged: mean sigmoid-BCE, pre-update loss per epoch, torch
# Adam. Reference analogue: model/lr.py:24-25 + scripts/lr.py:53-59.
# ---------------------------------------------------------------------------

def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def _compact_kernel(
    uid_ref, iid_ref, d_ref, y_ref, wu0_ref, wi0_ref, wd0_ref,
    wu_out, mu_out, vu_out, wi_out, mi_out, vi_out,
    wd_out, md_out, vd_out, loss_out, dwu_out, dwi_out, dwd_out,
    *, n_valid: int, block_rows: int,
    lr: float, b1: float, b2: float, eps: float,
):
    # Mosaic layout rule (CLAUDE.md r3/r4): broadcasting or reducing a
    # nonzero-offset LANE SLICE fails ("Invalid input layout"), so the three
    # weight segments travel as separate offset-0 refs, never as slices of
    # one packed [1, F2] row.
    e = pl.program_id(0)
    i = pl.program_id(1)
    nblk = pl.num_programs(1)

    segs = (
        (wu0_ref, wu_out, mu_out, vu_out, dwu_out),
        (wi0_ref, wi_out, mi_out, vi_out, dwi_out),
        (wd0_ref, wd_out, md_out, vd_out, dwd_out),
    )

    @pl.when((e == 0) & (i == 0))
    def _():
        for w0_ref, w_out, m_out, v_out, _dw in segs:
            w_out[:] = w0_ref[:]
            m_out[:] = jnp.zeros_like(m_out[:])
            v_out[:] = jnp.zeros_like(v_out[:])

    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    valid = rows + i * block_rows < n_valid
    # ids of padded rows -> -1 (match nothing); dense/labels -> 0
    uid = jnp.where(valid, uid_ref[:], -1)  # [R, 1] int32
    iid = jnp.where(valid, iid_ref[:], -1)
    d = jnp.where(valid, d_ref[:], 0.0)  # [R, Dp]
    y = jnp.where(valid, y_ref[:], 0.0)  # [R, 1]

    u_pad = wu_out.shape[1]
    i_pad = wi_out.shape[1]
    mu = (jax.lax.broadcasted_iota(jnp.int32, (block_rows, u_pad), 1)
          == uid).astype(jnp.float32)  # [R, Up] -- never leaves VMEM
    mi = (jax.lax.broadcasted_iota(jnp.int32, (block_rows, i_pad), 1)
          == iid).astype(jnp.float32)  # [R, Ip]

    z = (
        jnp.sum(mu * wu_out[:], axis=1, keepdims=True)
        + jnp.sum(mi * wi_out[:], axis=1, keepdims=True)
        + jnp.sum(d * wd_out[:], axis=1, keepdims=True)
    )  # [R, 1]
    z = jnp.where(valid, z, 0.0)
    bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    bce = jnp.where(valid, bce, 0.0)
    g = jnp.where(valid, (jax.nn.sigmoid(z) - y) / n_valid, 0.0)  # [R, 1]

    blocks = (
        jnp.sum(mu * g, axis=0, keepdims=True),  # [1, Up]
        jnp.sum(mi * g, axis=0, keepdims=True),  # [1, Ip]
        jnp.sum(d * g, axis=0, keepdims=True),  # [1, Dp]
    )

    @pl.when(i == 0)
    def _():
        for (_w0, _w, _m, _v, dw_out), blk in zip(segs, blocks):
            dw_out[:] = blk
        loss_out[e, 0] = jnp.sum(bce) / n_valid

    @pl.when(i > 0)
    def _():
        for (_w0, _w, _m, _v, dw_out), blk in zip(segs, blocks):
            dw_out[:] = dw_out[:] + blk
        loss_out[e, 0] = loss_out[e, 0] + jnp.sum(bce) / n_valid

    @pl.when(i == nblk - 1)
    def _():
        import math

        t = (e + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(t * math.log(b1))
        bc2 = 1.0 - jnp.exp(t * math.log(b2))
        for _w0, w_out, m_out, v_out, dw_out in segs:
            dw = dw_out[:]
            m = b1 * m_out[:] + (1.0 - b1) * dw
            v = b2 * v_out[:] + (1.0 - b2) * dw * dw
            w_out[:] = w_out[:] - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            m_out[:] = m
            v_out[:] = v


def lr_fullbatch_train_compact(
    uid: jnp.ndarray,  # [B] int32 user ids
    iid: jnp.ndarray,  # [B] int32 item ids
    dense_aug: jnp.ndarray,  # [B, Dp] f32: dense cols + ones col, lane-padded
    y: jnp.ndarray,  # [B] f32 labels
    w0: jnp.ndarray,  # [1, F2] f32 segment-padded initial weights
    epochs: int,
    learning_rate: float,
    u_pad: int,
    i_pad: int,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_rows: int = 1024,  # measured best on v5e (0.613 ms/epoch at
    # ml-100k; 256/512/2048 gave 0.73/0.62/0.64 -- LR_COMPACT_PROBE.json)
    interpret: bool = False,
):
    """Train ``epochs`` full-batch Adam epochs in ONE pallas_call.

    Returns ``(w_final [1, F2], losses [epochs])``.
    """
    B = uid.shape[0]
    d_pad = dense_aug.shape[1]
    F2 = u_pad + i_pad + d_pad
    assert w0.shape == (1, F2), (w0.shape, F2)
    nblk = pl.cdiv(B, block_rows)
    grid = (epochs, nblk)
    uid2 = uid.reshape(B, 1).astype(jnp.int32)
    iid2 = iid.reshape(B, 1).astype(jnp.int32)
    y2 = y.reshape(B, 1).astype(jnp.float32)
    wu0 = w0[:, :u_pad]
    wi0 = w0[:, u_pad : u_pad + i_pad]
    wd0 = w0[:, u_pad + i_pad :]

    row = lambda e, i: (i, 0)  # noqa: E731  re-streamed every epoch
    const = lambda e, i: (0, 0)  # noqa: E731  persists across the whole grid

    def seg_specs():
        return [
            pl.BlockSpec((1, u_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i_pad), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), const, memory_space=pltpu.VMEM),
        ]

    def seg_shapes():
        return [
            jax.ShapeDtypeStruct((1, u_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, i_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
        ]

    su, si, sd = seg_specs()
    hu, hi, hd = seg_shapes()
    outs = pl.pallas_call(
        functools.partial(
            _compact_kernel, n_valid=B, block_rows=block_rows,
            lr=learning_rate, b1=b1, b2=b2, eps=eps,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d_pad), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), row, memory_space=pltpu.VMEM),
            su, si, sd,
        ],
        out_specs=[
            # (w, m, v) per segment, then per-epoch losses, then the three
            # gradient accumulators
            su, su, su, si, si, si, sd, sd, sd,
            pl.BlockSpec((epochs, 1), const, memory_space=pltpu.SMEM),
            su, si, sd,
        ],
        out_shape=[
            hu, hu, hu, hi, hi, hi, hd, hd, hd,
            jax.ShapeDtypeStruct((epochs, 1), jnp.float32),
            hu, hi, hd,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(uid2, iid2, dense_aug, y2, wu0, wi0, wd0)
    wu, _, _, wi, _, _, wd, _, _, losses = outs[:10]
    w = jnp.concatenate([wu, wi, wd], axis=1)
    return w, losses[:, 0]
