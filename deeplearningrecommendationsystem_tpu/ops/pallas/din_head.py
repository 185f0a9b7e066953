"""Fused DIN head: activation-unit MLP -> softmax -> pool -> final MLP,
forward AND backward as Pallas TPU kernels (custom VJP).

Why: DIN training is HBM-bound (DIN_PROFILE.json: the no-embedding ablation
runs at ~4% MFU). The XLA path materializes every attention intermediate in
HBM -- x1 [B,L,A1], relu'd hiddens, scores -- reading/writing ~5x the history
block per step. This kernel keeps the whole [R,L,D] history block in VMEM
across the activation unit (reference model/din.py:14-20,39-43), the softmax
(:44), the weighted pool (:47) AND the final MLP (:22-29,50-51); HBM traffic
per block is one read of hist/target (+ one write of their grads in the
backward). The backward recomputes the forward in VMEM instead of saving
residuals -- recompute is MXU-cheap, HBM re-reads are not.

Layout/perf notes (v5e Mosaic):
* all L per-position [R, D] slices are concatenated along the ROW axis into
  one [L*R, D] operand, so the whole activation unit is three full-size MXU
  matmuls instead of 10 skinny ones (in-kernel reshape across tiled dims
  relayouts; row-axis concat does not);
* matmul operands stay in the INPUT dtype (bf16 in mixed-precision training)
  with f32 MXU accumulation -- the kernel's bf16 path runs at native MXU
  rate, like XLA's, while softmax/elementwise stay f32;
* scores are re-assembled by concatenating ten [R, 1] row-slices -> [R, L];
* weight grads are accumulated across the sequential TPU grid into
  constant-index f32 output blocks (init at program 0, += after);
* padded rows of the ragged last block are masked with jnp.where (never
  multiply: out-of-bounds VMEM reads may be NaN and NaN * 0 == NaN).

Structure is fixed to the reference's two-hidden-layer nets: attention
(3D -> A1 -> A2 -> 1, model/din.py:14-20) and fc (2D -> F1 -> F2 -> 1,
model/din.py:22-29); all widths are free.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 512
# the backward keeps ~3x more live state ([L*R, A1] grads + dhist block +
# fc activations); keep it under the ~16 MB scoped-VMEM limit on v5e
DEFAULT_BWD_BLOCK_ROWS = 256

_F32 = jnp.float32


def _f32(x):
    return x.astype(_F32)


def _mdot(a, b):
    """a @ b on the MXU in b's dtype with f32 accumulation (the XLA
    mixed-precision convention: bf16 operands, f32 result)."""
    return jax.lax.dot(a.astype(b.dtype), b, preferred_element_type=_F32)


def _cdot(a, b, dtype):
    """Rows-contraction a^T @ b (grad-of-weight matmul), operands cast to the
    compute dtype, f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        (((0,), (0,)), ((), ())),
        preferred_element_type=_F32,
    )


def _row_mask(n_valid: int, block_rows: int, i):
    """[R, 1] bool mask: True for rows that exist in the unpadded batch."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    return rows + i * block_rows < n_valid


def _attention_forward(hist_ref, t, wh, wt, b1, w2, b2, w3, b3, valid):
    """Shared fwd recompute. Returns (h_list, h_cat, z1, z2, r1, r2, w, pooled):
    h_* in input dtype, z/r/w/pooled in f32; z1/z2/r1/r2 are [L*R, .] with
    position l occupying rows [l*R, (l+1)*R).

    The concat-MLP first layer is decomposed (ops/attention.py identity):
    z1_l = h_l @ (W1_a + W1_b) + t @ (W1_c - W1_b) + b1, so the [R, L, 3D]
    concat is never formed.
    """
    R, L = hist_ref.shape[0], hist_ref.shape[1]
    zero = jnp.zeros((), hist_ref.dtype)
    h_list = [jnp.where(valid, hist_ref[:, l, :], zero) for l in range(L)]
    h_cat = jnp.concatenate(h_list, axis=0)  # [L*R, D], input dtype
    t_term = _mdot(t, wt) + b1  # [R, A1] f32
    z1 = _mdot(h_cat, wh) + jnp.concatenate([t_term] * L, axis=0)  # [L*R, A1]
    r1 = jax.nn.relu(z1)
    z2 = _mdot(r1, w2) + b2  # [L*R, A2] f32
    r2 = jax.nn.relu(z2)
    s_all = _mdot(r2, w3) + b3  # [L*R, 1] f32
    scores = jnp.concatenate(
        [s_all[l * R : (l + 1) * R] for l in range(L)], axis=1
    )  # [R, L]
    w = jax.nn.softmax(scores, axis=-1)
    pooled = sum(w[:, l : l + 1] * _f32(h_list[l]) for l in range(L))  # [R, D]
    return h_list, h_cat, z1, z2, r1, r2, w, pooled


def _fc_forward(pooled, t, u1p, u1t, c1, u2, c2, u3, c3):
    """concat([pooled, t]) @ U1 decomposed into pooled @ U1_p + t @ U1_t."""
    f1 = jax.nn.relu(_mdot(pooled, u1p) + _mdot(t, u1t) + c1)  # [R, F1] f32
    f2 = jax.nn.relu(_mdot(f1, u2) + c2)  # [R, F2] f32
    logit = _mdot(f2, u3) + c3  # [R, 1] f32
    return f1, f2, logit


def _biases_f32(b1, b2, b3, c1, c2, c3):
    return tuple(_f32(x[:]) for x in (b1, b2, b3, c1, c2, c3))


def _fwd_kernel(
    hist_ref, tgt_ref, wh, wt, b1, w2, b2, w3, b3, u1p, u1t, c1, u2, c2, u3, c3,
    out_ref, *, n_valid: int, block_rows: int,
):
    i = pl.program_id(0)
    valid = _row_mask(n_valid, block_rows, i)
    t = jnp.where(valid, tgt_ref[:], jnp.zeros((), tgt_ref.dtype))
    b1f, b2f, b3f, c1f, c2f, c3f = _biases_f32(b1, b2, b3, c1, c2, c3)
    *_, pooled = _attention_forward(
        hist_ref, t, wh[:], wt[:], b1f, w2[:], b2f, w3[:], b3f, valid
    )
    _, _, logit = _fc_forward(
        pooled, t, u1p[:], u1t[:], c1f, u2[:], c2f, u3[:], c3f
    )
    out_ref[:] = logit.astype(out_ref.dtype)


def _bwd_kernel(
    hist_ref, tgt_ref, wh_r, wt_r, b1_r, w2_r, b2_r, w3_r, b3_r,
    u1p_r, u1t_r, c1_r, u2_r, c2_r, u3_r, c3_r, g_ref,
    dhist_ref, dtgt_ref, dwh_ref, dwt_ref, db1_ref, dw2_ref, db2_ref,
    dw3_ref, db3_ref, du1p_ref, du1t_ref, dc1_ref, du2_ref, dc2_ref,
    du3_ref, dc3_ref, *, n_valid: int, block_rows: int,
):
    i = pl.program_id(0)
    R = block_rows
    valid = _row_mask(n_valid, R, i)
    t = jnp.where(valid, tgt_ref[:], jnp.zeros((), tgt_ref.dtype))
    wh, wt, w2, w3 = wh_r[:], wt_r[:], w2_r[:], w3_r[:]
    u1p, u1t, u2, u3 = u1p_r[:], u1t_r[:], u2_r[:], u3_r[:]
    b1f, b2f, b3f, c1f, c2f, c3f = _biases_f32(b1_r, b2_r, b3_r, c1_r, c2_r, c3_r)
    dt_comp = wh.dtype  # compute dtype for all matmul operands
    L = hist_ref.shape[1]

    # recompute the forward entirely in VMEM
    h_list, h_cat, z1, z2, r1, r2, w, pooled = _attention_forward(
        hist_ref, t, wh, wt, b1f, w2, b2f, w3, b3f, valid
    )
    f1, f2, _ = _fc_forward(pooled, t, u1p, u1t, c1f, u2, c2f, u3, c3f)

    g = jnp.where(valid, _f32(g_ref[:]), 0.0)  # [R, 1]

    # ---- final MLP backward ----
    du3 = _cdot(f2, g, dt_comp)
    dc3 = jnp.sum(g, axis=0, keepdims=True)
    df2 = _mdot(g, u3.T)
    dzf2 = df2 * (f2 > 0)
    du2 = _cdot(f1, dzf2, dt_comp)
    dc2 = jnp.sum(dzf2, axis=0, keepdims=True)
    df1 = _mdot(dzf2, u2.T)
    dzf1 = df1 * (f1 > 0)
    du1p = _cdot(pooled, dzf1, dt_comp)
    du1t = _cdot(t, dzf1, dt_comp)
    dc1 = jnp.sum(dzf1, axis=0, keepdims=True)
    dpooled = _mdot(dzf1, u1p.T)  # [R, D] f32
    dt_grad = _mdot(dzf1, u1t.T)  # [R, D] f32

    # ---- softmax backward: ds = w * (dw - sum(w * dw)) ----
    dw_cols = jnp.concatenate(
        [
            jnp.sum(dpooled * _f32(h_list[l]), axis=-1, keepdims=True)
            for l in range(L)
        ],
        axis=1,
    )  # [R, L]
    ds = w * (dw_cols - jnp.sum(w * dw_cols, axis=-1, keepdims=True))
    # row-concat of LANE-slices is "offset mismatch on non-concat dimension"
    # in Mosaic; rebuild each column as an offset-0 [R, 1] via a masked
    # reduction first (CLAUDE.md r3 note)
    col = jax.lax.broadcasted_iota(jnp.int32, ds.shape, 1)
    ds_all = jnp.concatenate(
        [
            jnp.sum(jnp.where(col == l, ds, 0.0), axis=1, keepdims=True)
            for l in range(L)
        ],
        axis=0,
    )  # [L*R, 1] f32

    # ---- activation unit backward, batched over positions ----
    dr2 = _mdot(ds_all, w3.T)  # [L*R, A2] f32
    dz2g = dr2 * (z2 > 0)
    dw3 = _cdot(r2, ds_all, dt_comp)
    db3 = jnp.sum(ds_all, axis=0, keepdims=True)
    dw2 = _cdot(r1, dz2g, dt_comp)
    db2 = jnp.sum(dz2g, axis=0, keepdims=True)
    dr1 = _mdot(dz2g, w2.T)  # [L*R, A1] f32
    dz1g = dr1 * (z1 > 0)
    dwh = _cdot(h_cat, dz1g, dt_comp)
    db1 = jnp.sum(dz1g, axis=0, keepdims=True)
    dh_att = _mdot(dz1g, wh.T)  # [L*R, D] f32
    dwt_from = sum(dz1g[l * R : (l + 1) * R] for l in range(L))  # [R, A1]
    dwt = _cdot(t, dwt_from, dt_comp)
    dt_grad = dt_grad + _mdot(dwt_from, wt.T)
    dtgt_ref[:] = dt_grad.astype(dtgt_ref.dtype)
    for l in range(L):
        dh_l = w[:, l : l + 1] * dpooled + dh_att[l * R : (l + 1) * R]
        dhist_ref[:, l, :] = dh_l.astype(dhist_ref.dtype)

    # ---- weight grads: accumulate across the (sequential) grid ----
    accs = (
        (dwh_ref, dwh), (dwt_ref, dwt), (db1_ref, db1), (dw2_ref, dw2),
        (db2_ref, db2), (dw3_ref, dw3), (db3_ref, db3), (du1p_ref, du1p),
        (du1t_ref, du1t), (dc1_ref, dc1), (du2_ref, du2), (dc2_ref, dc2),
        (du3_ref, du3), (dc3_ref, dc3),
    )

    @pl.when(i == 0)
    def _():
        for ref, val in accs:
            ref[:] = val.astype(ref.dtype)

    @pl.when(i > 0)
    def _():
        for ref, val in accs:
            ref[:] = ref[:] + val.astype(ref.dtype)


def _weights_tuple(att_mlp: List[dict], fc_mlp: List[dict], D: int):
    """Flatten + decompose the two MLPs' params for the kernel.

    att first layer W1 [3D, A1] splits into wh = W1_h + W1_(h-t) and
    wt = W1_t - W1_(h-t) (the h/h-t/t concat identity); fc first layer
    U1 [2D, F1] splits into its pooled / target halves.
    """
    assert len(att_mlp) == 3 and len(fc_mlp) == 3, "kernel is 2-hidden-layer"
    w1 = att_mlp[0]["w"]
    assert w1.shape[0] == 3 * D
    wh = w1[:D] + w1[D : 2 * D]
    wt = w1[2 * D :] - w1[D : 2 * D]
    u1 = fc_mlp[0]["w"]
    assert u1.shape[0] == 2 * D
    as2d = lambda b, n: (  # noqa: E731
        b.reshape(1, n) if b is not None else jnp.zeros((1, n), w1.dtype)
    )
    return (
        wh, wt, as2d(att_mlp[0].get("b"), wh.shape[1]),
        att_mlp[1]["w"], as2d(att_mlp[1].get("b"), att_mlp[1]["w"].shape[1]),
        att_mlp[2]["w"], as2d(att_mlp[2].get("b"), 1),
        u1[:D], u1[D:], as2d(fc_mlp[0].get("b"), u1.shape[1]),
        fc_mlp[1]["w"], as2d(fc_mlp[1].get("b"), fc_mlp[1]["w"].shape[1]),
        fc_mlp[2]["w"], as2d(fc_mlp[2].get("b"), 1),
    )


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _call_fwd(hist_e, target_e, weights, block_rows, interpret):
    B, L, D = hist_e.shape
    grid = (pl.cdiv(B, block_rows),)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid=B, block_rows=block_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [_full_spec(w.shape) for w in weights],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1), hist_e.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(hist_e, target_e, *weights)
    return out[:, 0]


def _call_bwd(hist_e, target_e, weights, g, block_rows, interpret):
    B, L, D = hist_e.shape
    grid = (pl.cdiv(B, block_rows),)
    # input grads emitted in f32: Mosaic rejects bf16 sliced stores into the
    # [R, L, D] block ("infer-vector-layout: unsupported shape cast"); the
    # caller casts back (one fused elementwise pass)
    out_shapes = [
        jax.ShapeDtypeStruct(hist_e.shape, jnp.float32),
        jax.ShapeDtypeStruct(target_e.shape, jnp.float32),
    ] + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    out_specs = [
        pl.BlockSpec((block_rows, L, D), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [_full_spec(w.shape) for w in weights]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_valid=B, block_rows=block_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [_full_spec(w.shape) for w in weights] + [
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        # the f32 backward at 256 rows sits ~2% over the default 16 MB
        # scoped-VMEM budget; v5e VMEM has headroom, so raise the cap rather
        # than shrink blocks (128-row blocks halve MXU utilization)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(hist_e, target_e, *weights, g.reshape(B, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _din_head(hist_e, target_e, weights, block_rows, bwd_block_rows, interpret):
    return _call_fwd(hist_e, target_e, weights, block_rows, interpret)


def _din_head_fwd(hist_e, target_e, weights, block_rows, bwd_block_rows, interpret):
    out = _call_fwd(hist_e, target_e, weights, block_rows, interpret)
    return out, (hist_e, target_e, weights)


def _din_head_bwd(block_rows, bwd_block_rows, interpret, res, g):
    hist_e, target_e, weights = res
    outs = _call_bwd(hist_e, target_e, weights, g, bwd_block_rows, interpret)
    dhist = outs[0].astype(hist_e.dtype)
    dtgt = outs[1].astype(target_e.dtype)
    dweights = tuple(
        dw.astype(w.dtype) for dw, w in zip(outs[2:], weights)
    )
    return dhist, dtgt, dweights


_din_head.defvjp(_din_head_fwd, _din_head_bwd)


def din_head_fused(
    att_mlp: List[dict],
    fc_mlp: List[dict],
    hist_e: jnp.ndarray,  # [B, L, D]
    target_e: jnp.ndarray,  # [B, D]
    block_rows: int = DEFAULT_BLOCK_ROWS,
    bwd_block_rows: int = DEFAULT_BWD_BLOCK_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused, differentiable DIN head: logits [B] from embedded history +
    target. Numerically matches attention_pool + mlp (ops/attention.py,
    ops/linear.py) with f32 accumulation; one HBM read of hist_e per pass.
    """
    D = hist_e.shape[-1]
    # the decomposition is differentiable JAX ops OUTSIDE the custom_vjp
    # boundary, so autodiff maps the kernel's dwh/dwt/du1p/du1t cotangents
    # back onto the original concat-layout MLP params automatically
    weights = _weights_tuple(att_mlp, fc_mlp, D)
    return _din_head(
        hist_e, target_e, weights, block_rows, bwd_block_rows, interpret
    )
