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

Layout notes (v5e Mosaic):
* the [R, L, D] history block is sliced per position l -> [R, D] 2D tiles
  (in-kernel reshape across tiled dims forces slow relayouts; per-position
  slices don't);
* scores are assembled by concatenating ten [R, 1] columns -> [R, L] (tiny);
* weight grads are accumulated across the sequential TPU grid into
  constant-index output blocks (init at program 0, += after).

Structure is fixed to the reference's two-hidden-layer nets: attention
(3D -> A1 -> A2 -> 1, model/din.py:14-20) and fc (2D -> F1 -> F2 -> 1,
model/din.py:22-29); all widths are free. Inputs may be bf16 -- compute is
f32 throughout (matmuls accumulate f32 on the MXU), outputs cast back.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 512
# the backward keeps ~3x more live state (h/z1/z2 lists + dhist block + fc
# activations); 512 rows hits 25.6 MB > the 16 MB scoped-VMEM limit on v5e
DEFAULT_BWD_BLOCK_ROWS = 256


def _f32(x):
    return x.astype(jnp.float32)


def _row_mask(n_valid: int, block_rows: int, i):
    """[R, 1] bool mask: True for rows that exist in the unpadded batch.

    Must be applied with jnp.where (NOT multiply): out-of-bounds reads of a
    padded last block are unspecified and may be NaN, and NaN * 0 == NaN.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    return rows + i * block_rows < n_valid


def _masked(ref_slice, valid):
    return jnp.where(valid, _f32(ref_slice), 0.0)


def _attention_forward(hist_ref, t, wh, wt, b1, w2, b2, w3, b3, valid):
    """Shared fwd recompute: returns (h_list, z1_list, z2_list, scores, w, pooled).

    The concat-MLP first layer is decomposed (ops/attention.py identity):
    z1_l = h_l @ (W1_a + W1_b) + t @ (W1_c - W1_b) + b1, so the [R, L, 3D]
    concat is never formed. ``valid`` zeroes padded rows so garbage VMEM
    reads cannot poison softmax or the weight-grad reductions.
    """
    L = hist_ref.shape[1]
    t_term = jax.lax.dot(t, wt, preferred_element_type=jnp.float32) + b1
    h_list, z1_list, z2_list, s_cols = [], [], [], []
    for l in range(L):
        h_l = _masked(hist_ref[:, l, :], valid)  # [R, D]
        z1 = jax.lax.dot(h_l, wh, preferred_element_type=jnp.float32) + t_term
        r1 = jax.nn.relu(z1)
        z2 = jax.lax.dot(r1, w2, preferred_element_type=jnp.float32) + b2
        r2 = jax.nn.relu(z2)
        s = jax.lax.dot(r2, w3, preferred_element_type=jnp.float32) + b3  # [R,1]
        h_list.append(h_l)
        z1_list.append(z1)
        z2_list.append(z2)
        s_cols.append(s)
    scores = jnp.concatenate(s_cols, axis=1)  # [R, L]
    w = jax.nn.softmax(scores, axis=-1)
    pooled = sum(w[:, l : l + 1] * h_list[l] for l in range(L))  # [R, D]
    return h_list, z1_list, z2_list, w, pooled


def _fc_forward(pooled, t, u1p, u1t, c1, u2, c2, u3, c3):
    """concat([pooled, t]) @ U1 decomposed into pooled @ U1_p + t @ U1_t."""
    f1 = jax.nn.relu(
        jax.lax.dot(pooled, u1p, preferred_element_type=jnp.float32)
        + jax.lax.dot(t, u1t, preferred_element_type=jnp.float32)
        + c1
    )
    f2 = jax.nn.relu(jax.lax.dot(f1, u2, preferred_element_type=jnp.float32) + c2)
    logit = jax.lax.dot(f2, u3, preferred_element_type=jnp.float32) + c3
    return f1, f2, logit


def _fwd_kernel(
    hist_ref, tgt_ref, wh, wt, b1, w2, b2, w3, b3, u1p, u1t, c1, u2, c2, u3, c3,
    out_ref, *, n_valid: int, block_rows: int,
):
    i = pl.program_id(0)
    valid = _row_mask(n_valid, block_rows, i)
    t = _masked(tgt_ref[:], valid)
    *_, pooled = _attention_forward(
        hist_ref, t, _f32(wh[:]), _f32(wt[:]), _f32(b1[:]), _f32(w2[:]),
        _f32(b2[:]), _f32(w3[:]), _f32(b3[:]), valid,
    )
    _, _, logit = _fc_forward(
        pooled, t, _f32(u1p[:]), _f32(u1t[:]), _f32(c1[:]), _f32(u2[:]),
        _f32(c2[:]), _f32(u3[:]), _f32(c3[:]),
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
    valid = _row_mask(n_valid, block_rows, i)
    t = _masked(tgt_ref[:], valid)
    wh, wt, b1 = _f32(wh_r[:]), _f32(wt_r[:]), _f32(b1_r[:])
    w2, b2, w3, b3 = _f32(w2_r[:]), _f32(b2_r[:]), _f32(w3_r[:]), _f32(b3_r[:])
    u1p, u1t, c1 = _f32(u1p_r[:]), _f32(u1t_r[:]), _f32(c1_r[:])
    u2, c2, u3, c3 = _f32(u2_r[:]), _f32(c2_r[:]), _f32(u3_r[:]), _f32(c3_r[:])
    L = hist_ref.shape[1]

    # recompute the forward entirely in VMEM
    h_list, z1_list, z2_list, w, pooled = _attention_forward(
        hist_ref, t, wh, wt, b1, w2, b2, w3, b3, valid
    )
    f1, f2, _ = _fc_forward(pooled, t, u1p, u1t, c1, u2, c2, u3, c3)

    cT = lambda a, b: jax.lax.dot_general(  # noqa: E731  contraction over rows
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g = _masked(g_ref[:], valid)  # [R, 1]; padded rows contribute nothing

    # ---- final MLP backward ----
    du3 = cT(f2, g)
    dc3 = jnp.sum(g, axis=0, keepdims=True)
    df2 = jax.lax.dot(g, u3.T, preferred_element_type=jnp.float32)
    dzf2 = df2 * (f2 > 0)
    du2 = cT(f1, dzf2)
    dc2 = jnp.sum(dzf2, axis=0, keepdims=True)
    df1 = jax.lax.dot(dzf2, u2.T, preferred_element_type=jnp.float32)
    dzf1 = df1 * (f1 > 0)
    du1p = cT(pooled, dzf1)
    du1t = cT(t, dzf1)
    dc1 = jnp.sum(dzf1, axis=0, keepdims=True)
    dpooled = jax.lax.dot(dzf1, u1p.T, preferred_element_type=jnp.float32)
    dt = jax.lax.dot(dzf1, u1t.T, preferred_element_type=jnp.float32)  # [R, D]

    # ---- softmax backward: ds = w * (dw - sum(w * dw)) ----
    dw_cols = jnp.concatenate(
        [jnp.sum(dpooled * h_list[l], axis=-1, keepdims=True) for l in range(L)],
        axis=1,
    )  # [R, L]
    ds = w * (dw_cols - jnp.sum(w * dw_cols, axis=-1, keepdims=True))

    # ---- activation unit backward, per position ----
    dwh = jnp.zeros_like(wh)
    dwt_from = jnp.zeros((block_rows, wh.shape[1]), jnp.float32)  # sum_l dz1_l
    db1 = jnp.zeros_like(b1)
    dw2 = jnp.zeros_like(w2)
    db2 = jnp.zeros_like(b2)
    dw3 = jnp.zeros_like(w3)
    db3 = jnp.zeros_like(b3)
    for l in range(L):
        r1 = jax.nn.relu(z1_list[l])
        r2 = jax.nn.relu(z2_list[l])
        dr2 = jax.lax.dot(
            ds[:, l : l + 1], w3.T, preferred_element_type=jnp.float32
        )
        dz2 = dr2 * (z2_list[l] > 0)
        dr1 = jax.lax.dot(dz2, w2.T, preferred_element_type=jnp.float32)
        dz1 = dr1 * (z1_list[l] > 0)
        dw3 += cT(r2, ds[:, l : l + 1])
        db3 += jnp.sum(ds[:, l : l + 1], axis=0, keepdims=True)
        dw2 += cT(r1, dz2)
        db2 += jnp.sum(dz2, axis=0, keepdims=True)
        dwh += cT(h_list[l], dz1)
        dwt_from += dz1
        db1 += jnp.sum(dz1, axis=0, keepdims=True)
        dh_l = w[:, l : l + 1] * dpooled + jax.lax.dot(
            dz1, wh.T, preferred_element_type=jnp.float32
        )
        dhist_ref[:, l, :] = dh_l.astype(dhist_ref.dtype)
    dwt = cT(t, dwt_from)
    dt = dt + jax.lax.dot(dwt_from, wt.T, preferred_element_type=jnp.float32)
    dtgt_ref[:] = dt.astype(dtgt_ref.dtype)

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
