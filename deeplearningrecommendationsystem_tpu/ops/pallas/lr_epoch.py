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
