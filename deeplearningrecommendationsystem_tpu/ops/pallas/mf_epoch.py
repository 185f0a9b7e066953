"""RETIRED -- measured loser at MF shapes (2.68 bf16 / 2.41 f32 vs the XLA
scan path's 1.95 ms/epoch, MF_FUSED_PROBE.json): with D=64 the mask-matmuls
use half the MXU's output lanes and the [R, 1688]+[R, 944] in-VMEM mask
builds cost more than what the single fused call saves; unlike LR (whose
design matrix was pure one-hot and whose math is a matvec), MF's XLA path
is already dot-bound, not launch/gather-bound enough. Not wired into any
default path; kept as an oracle-tested artifact (tests/test_kernels.py)
and the template for future fused trainers at shapes where it wins.

Whole-RUN fused MF training kernel: every epoch's gathers, loss, one-hot
backward and torch-Adam update in ONE ``pallas_call`` for the entire run.

Why a single kernel: the r4 MF device trace pins the XLA scan body at
1.64 ms/epoch -- 0.85 ms of forward row-gathers (v5e has no gather hardware;
~12x off HBM bandwidth) + 0.70 ms of one-hot-backward VPU convolution
fusions -- and the same math as in-VMEM mask-matmuls is ~0.03 ms per
direction. Routing per-op Pallas kernels loses anyway (an in-scan
pallas_call costs ~0.3-0.5 ms fixed, PALLAS_GATHER_PROBE.json), so the
whole multi-epoch run is ONE call with grid (epochs, row_blocks), exactly
like the LR compact kernel (lr_epoch.py):

* both factor tables + Adam moments live in constant-index f32 output
  blocks that persist across the sequential TPU grid (master weights);
* per block, the one-hot masks ``iota == id`` are built in-VMEM in the
  compute dtype and used twice: ``mask @ table`` (forward gather on the
  MXU) and ``mask^T @ (g * other_emb)`` (backward scatter, f32
  accumulation);
* the last row-block of each epoch applies torch Adam (classic L2 added to
  the gradient before the moments, bias correction by epoch count --
  train/optim.py::torch_adam) and records the PRE-update epoch loss.

Semantics mirror Trainer.fit with compute_dtype: params cast to the compute
dtype for the forward/backward, f32 master weights updated by Adam. The f32
variant is oracle-tested against the generic Trainer (tests/test_kernels);
both dtype variants reach the trainer's final loss on the real ml-100k run
(MF_FUSED_PROBE.json: 0.142503 vs 0.142509).

Reference analogue: model/mf.py:10-35 + scripts/mf.py:60-80 (full-batch
Adam epochs over sampled pairs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def _kernel(
    uid_ref, iid_ref, y_ref, pu0_ref, pi0_ref,
    pu_out, mu_out, vu_out, pi_out, mi_out, vi_out,
    loss_out, du_out, di_out,
    *, n_valid: int, block_rows: int, lr: float, wd: float,
    b1: float, b2: float, eps: float, compute_dtype,
):
    e = pl.program_id(0)
    i = pl.program_id(1)
    nblk = pl.num_programs(1)

    segs = (
        (pu0_ref, pu_out, mu_out, vu_out, du_out),
        (pi0_ref, pi_out, mi_out, vi_out, di_out),
    )

    @pl.when((e == 0) & (i == 0))
    def _():
        for p0_ref, p_out, m_out, v_out, _d in segs:
            p_out[:] = p0_ref[:]
            m_out[:] = jnp.zeros_like(m_out[:])
            v_out[:] = jnp.zeros_like(v_out[:])

    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    valid = rows + i * block_rows < n_valid
    uid = jnp.where(valid, uid_ref[:], -1)  # padded rows match nothing
    iid = jnp.where(valid, iid_ref[:], -1)
    y = jnp.where(valid, y_ref[:], 0.0)  # [R, 1] f32

    u_pad = pu_out.shape[0]
    i_pad = pi_out.shape[0]
    cd = compute_dtype
    mask_u = (jax.lax.broadcasted_iota(jnp.int32, (block_rows, u_pad), 1)
              == uid).astype(cd)  # [R, Up] -- built once, used fwd AND bwd
    mask_i = (jax.lax.broadcasted_iota(jnp.int32, (block_rows, i_pad), 1)
              == iid).astype(cd)

    pu_c = pu_out[:].astype(cd)  # [Up, D] compute-dtype view of the masters
    pi_c = pi_out[:].astype(cd)
    u_emb = jax.lax.dot(mask_u, pu_c, preferred_element_type=jnp.float32)
    i_emb = jax.lax.dot(mask_i, pi_c, preferred_element_type=jnp.float32)

    z = jnp.sum(u_emb * i_emb, axis=1, keepdims=True)  # [R, 1] f32
    z = jnp.where(valid, z, 0.0)
    bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    bce = jnp.where(valid, bce, 0.0)
    g = jnp.where(valid, (jax.nn.sigmoid(z) - y) / n_valid, 0.0)  # [R, 1]

    du_blk = jax.lax.dot_general(
        mask_u, (g * i_emb).astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Up, D] f32
    di_blk = jax.lax.dot_general(
        mask_i, (g * u_emb).astype(cd), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _():
        du_out[:] = du_blk
        di_out[:] = di_blk
        loss_out[e, 0] = jnp.sum(bce) / n_valid

    @pl.when(i > 0)
    def _():
        du_out[:] = du_out[:] + du_blk
        di_out[:] = di_out[:] + di_blk
        loss_out[e, 0] = loss_out[e, 0] + jnp.sum(bce) / n_valid

    @pl.when(i == nblk - 1)
    def _():
        t = (e + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(t * math.log(b1))
        bc2 = 1.0 - jnp.exp(t * math.log(b2))
        for _p0, p_out, m_out, v_out, d_out in segs:
            # torch Adam: classic L2 joins the gradient BEFORE the moments
            dw = d_out[:] + wd * p_out[:]
            m = b1 * m_out[:] + (1.0 - b1) * dw
            v = b2 * v_out[:] + (1.0 - b2) * dw * dw
            p_out[:] = p_out[:] - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            m_out[:] = m
            v_out[:] = v


def mf_fullbatch_train(
    uid: jnp.ndarray,  # [B] int32
    iid: jnp.ndarray,  # [B] int32
    y: jnp.ndarray,  # [B] f32
    pu0: jnp.ndarray,  # [U, D] f32 master user factors
    pi0: jnp.ndarray,  # [I, D] f32 master item factors
    epochs: int,
    learning_rate: float,
    weight_decay: float = 0.0,
    compute_dtype: str = "bfloat16",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_rows: int = 1024,
    interpret: bool = False,
):
    """Train ``epochs`` full-batch Adam epochs in ONE pallas_call.

    Returns ``(pu [U, D], pi [I, D], losses [epochs])``.
    """
    B = uid.shape[0]
    U, D = pu0.shape
    I = pi0.shape[0]
    u_pad, i_pad = _round_up(U, 8), _round_up(I, 8)
    pu0p = jnp.pad(pu0, ((0, u_pad - U), (0, 0)))
    pi0p = jnp.pad(pi0, ((0, i_pad - I), (0, 0)))
    nblk = pl.cdiv(B, block_rows)
    cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    row = lambda e, i: (i, 0)  # noqa: E731
    const = lambda e, i: (0, 0)  # noqa: E731

    su = pl.BlockSpec((u_pad, D), const, memory_space=pltpu.VMEM)
    si = pl.BlockSpec((i_pad, D), const, memory_space=pltpu.VMEM)
    hu = jax.ShapeDtypeStruct((u_pad, D), jnp.float32)
    hi = jax.ShapeDtypeStruct((i_pad, D), jnp.float32)

    outs = pl.pallas_call(
        functools.partial(
            _kernel, n_valid=B, block_rows=block_rows,
            lr=learning_rate, wd=weight_decay, b1=b1, b2=b2, eps=eps,
            compute_dtype=cd,
        ),
        grid=(epochs, nblk),
        in_specs=[
            pl.BlockSpec((block_rows, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), row, memory_space=pltpu.VMEM),
            su, si,
        ],
        out_specs=[
            su, su, su, si, si, si,
            pl.BlockSpec((epochs, 1), const, memory_space=pltpu.SMEM),
            su, si,
        ],
        out_shape=[
            hu, hu, hu, hi, hi, hi,
            jax.ShapeDtypeStruct((epochs, 1), jnp.float32),
            hu, hi,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        uid.reshape(B, 1).astype(jnp.int32),
        iid.reshape(B, 1).astype(jnp.int32),
        y.reshape(B, 1).astype(jnp.float32),
        pu0p, pi0p,
    )
    pu, _, _, pi, _, _, losses = outs[:7]
    return pu[:U], pi[:I], losses[:, 0]
