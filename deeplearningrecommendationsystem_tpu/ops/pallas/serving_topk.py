"""Fused catalog-scoring + seen-mask + top-k serving kernel.

The serving hot path (SURVEY.md §3.5; reference model/mf.py:28-35 and the
per-user Python loops of every other ``recommendation``) is: score the whole
catalog, drop seen items, keep the top k. The XLA route materializes the
[U, I] score matrix in HBM and runs ``lax.top_k`` (a sort-family op) over the
full catalog axis. This kernel fuses all three stages in VMEM:

  * grid = (user tiles, item chunks), item chunks innermost;
  * per (tile, chunk): one MXU matmul ``P_tile @ Q_chunk^T`` -> mask seen ->
    merge the chunk into a running per-user top-k buffer held in VMEM scratch
    (scratch persists across the sequential TPU grid, re-initialised at
    chunk 0);
  * the merge is k rounds of (max, first-match index, knock out) over the
    concat [buffer | chunk] lanes -- exact top-k with XLA's tie-breaking
    (lowest index wins);
  * scores never touch HBM: HBM traffic is P + Q + seen + [U, k] out,
    vs the XLA path's additional [U, I] write+read+sort.

Covers every score surface of the form ``P @ Q^T`` (MF directly; LR via its
rank-1 decomposition user_part[u] + item_part[i] = [u_part, 1] @ [1, i_part]^T;
AutoRec's decoder matmul). For models whose pair score is a joint MLP the
matmul stage does not apply; ``topk_scores_pallas`` fuses mask + top-k over a
precomputed score matrix instead.

Benchmark: tools/bench_kernels.py (KERNEL_BENCH.json). Correctness:
tests/test_kernels.py (vs lax.top_k oracle, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # python float: jnp scalars would be captured tracer consts in kernels
_KP = 128  # top-k buffer lanes (k <= _KP; lane-aligned)


def _merge_topk(buf_v_ref, buf_i_ref, scores, ids, k: int):
    """Merge a [T, C] chunk into the [T, _KP] running top-k scratch buffer.

    The per-step winner is blended into the new buffer with a lane one-hot
    (Mosaic has no dynamic-lane-offset vector store), and the buffer refs are
    written once after the loop.
    """
    T = scores.shape[0]
    work_v = jnp.concatenate([buf_v_ref[:], scores], axis=1)  # [T, KP + C]
    work_i = jnp.concatenate([buf_i_ref[:], ids], axis=1)
    W = work_v.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, W), 1)
    lane_kp = jax.lax.broadcasted_iota(jnp.int32, (T, _KP), 1)
    new_v0 = jnp.full((T, _KP), NEG_INF, jnp.float32)
    new_i0 = jnp.zeros((T, _KP), jnp.int32)

    def step(s, carry):
        work_v, new_v, new_i = carry
        m = jnp.max(work_v, axis=1, keepdims=True)  # [T, 1]
        # first lane achieving the max (lax.top_k tie-breaking)
        am = jnp.min(jnp.where(work_v == m, lane, W), axis=1, keepdims=True)
        hit = lane == am  # [T, W] one-hot
        idx = jnp.sum(jnp.where(hit, work_i, 0), axis=1, keepdims=True)
        new_v = jnp.where(lane_kp == s, m, new_v)
        new_i = jnp.where(lane_kp == s, idx, new_i)
        return jnp.where(hit, NEG_INF, work_v), new_v, new_i

    _, new_v, new_i = jax.lax.fori_loop(0, k, step, (work_v, new_v0, new_i0))
    buf_v_ref[:] = new_v
    buf_i_ref[:] = new_i


def _matmul_topk_kernel(p_ref, q_ref, seen_ref, out_v_ref, out_i_ref,
                        buf_v_ref, buf_i_ref, *, k: int, chunk: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        buf_v_ref[:] = jnp.full(buf_v_ref.shape, NEG_INF, buf_v_ref.dtype)
        buf_i_ref[:] = jnp.zeros_like(buf_i_ref)

    scores = jnp.dot(
        p_ref[:], q_ref[:].T, preferred_element_type=jnp.float32
    )  # [T, C]
    scores = jnp.where(seen_ref[:] != 0, NEG_INF, scores)
    T = scores.shape[0]
    ids = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (T, chunk), 1)
    _merge_topk(buf_v_ref, buf_i_ref, scores, ids, k)

    @pl.when(j == nj - 1)
    def _():
        out_v_ref[:] = buf_v_ref[:, :k]
        out_i_ref[:] = buf_i_ref[:, :k]


def _scores_topk_kernel(s_ref, seen_ref, out_v_ref, out_i_ref,
                        buf_v_ref, buf_i_ref, *, k: int, chunk: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        buf_v_ref[:] = jnp.full(buf_v_ref.shape, NEG_INF, buf_v_ref.dtype)
        buf_i_ref[:] = jnp.zeros_like(buf_i_ref)

    scores = jnp.where(seen_ref[:] != 0, NEG_INF, s_ref[:])
    T = scores.shape[0]
    ids = j * chunk + jax.lax.broadcasted_iota(jnp.int32, (T, chunk), 1)
    _merge_topk(buf_v_ref, buf_i_ref, scores, ids, k)

    @pl.when(j == nj - 1)
    def _():
        out_v_ref[:] = buf_v_ref[:, :k]
        out_i_ref[:] = buf_i_ref[:, :k]


def _pad_rows(x, m):
    pad = (-x.shape[0]) % m
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _pad_cols_true(seen, m):
    pad = (-seen.shape[1]) % m
    if pad:
        seen = jnp.concatenate(
            [seen, jnp.ones((seen.shape[0], pad), seen.dtype)], axis=1
        )
    return seen


@functools.partial(jax.jit, static_argnames=("k", "tile", "chunk", "interpret"))
def topk_serve_matmul(
    P: jnp.ndarray,  # [U, D] f32
    Q: jnp.ndarray,  # [I, D] f32
    seen: jnp.ndarray,  # [U, I] bool/int (nonzero = exclude)
    k: int = 50,
    tile: int = 256,
    chunk: int = 512,
    interpret: bool = False,
):
    """(values [U, k], indices [U, k]) of the best unseen items per user."""
    assert k <= _KP, f"k={k} > buffer width {_KP}"
    U, D = P.shape
    I = Q.shape[0]
    tile = min(tile, max(8, U))
    seen8 = seen.astype(jnp.int8)
    Pp = _pad_rows(P, tile)
    Qp = _pad_rows(Q, chunk)
    seen8 = _pad_cols_true(_pad_rows(seen8, tile), chunk)
    # padded-user rows may select anything (sliced off); padded-item columns
    # are marked seen so they can never win
    Up, Ip = Pp.shape[0], Qp.shape[0]

    grid = (Up // tile, Ip // chunk)
    out_v, out_i = pl.pallas_call(
        functools.partial(_matmul_topk_kernel, k=k, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, chunk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Up, k), jnp.float32),
            jax.ShapeDtypeStruct((Up, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, _KP), jnp.float32),
            pltpu.VMEM((tile, _KP), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Up * Ip * D + 4 * k * Up * (Ip + _KP),
            bytes_accessed=Up * D * 4 + Ip * D * 4 + Up * Ip + Up * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Pp, Qp, seen8)
    return out_v[:U], out_i[:U]


@functools.partial(jax.jit, static_argnames=("k", "group"))
def topk_two_stage(
    P: jnp.ndarray,  # [U, D]
    Q: jnp.ndarray,  # [I, D]
    seen: jnp.ndarray,  # [U, I]
    k: int = 50,
    group: int = 128,
):
    """Exact top-k for LARGE catalogs via group-max dominance (pure XLA).

    ``lax.top_k`` over a huge catalog axis is a sort-family op and dominates
    serving at production item counts (measured 45 ms at [2048, 131072] vs
    ~0.2 ms of matmul). Two stages make the sort small:

      1. group maxes: [U, I/group] -- any group holding a true top-k item has
         max >= the kth value, and there are at most k such groups, so the
         top-k groups BY MAX contain every top-k item (exact, up to ties at
         the kth-value boundary);
      2. top-k of the k*group gathered candidates.

    Returns values identical to ``lax.top_k`` of the masked scores; index
    order among EQUAL values at the boundary may differ (ties are broken by
    group rank, then position).
    """
    U, D = P.shape
    I = Q.shape[0]
    scores = jnp.where(seen != 0, NEG_INF, P @ Q.T)  # [U, I] one materialization
    pad = (-I) % group
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((U, pad), NEG_INF, scores.dtype)], axis=1
        )
    G = scores.shape[1] // group
    blocks = scores.reshape(U, G, group)
    gmax = jnp.max(blocks, axis=-1)  # [U, G]
    kg = min(k, G)  # small catalogs may have fewer groups than k
    assert kg * group >= k, f"k={k} exceeds candidate pool {kg}x{group}"
    _, gidx = jax.lax.top_k(gmax, kg)  # [U, kg] winning groups
    cand = jnp.take_along_axis(blocks, gidx[:, :, None], axis=1)  # [U, kg, group]
    vals, within = jax.lax.top_k(cand.reshape(U, kg * group), k)
    g_of = jnp.take_along_axis(gidx, within // group, axis=1)
    idx = g_of * group + within % group
    return vals, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "tile", "chunk", "interpret"))
def topk_scores_pallas(
    scores: jnp.ndarray,  # [U, I] f32 (precomputed)
    seen: jnp.ndarray,  # [U, I]
    k: int = 50,
    tile: int = 256,
    chunk: int = 512,
    interpret: bool = False,
):
    """Fused mask + top-k over a precomputed score matrix."""
    assert k <= _KP
    U, I = scores.shape
    tile = min(tile, max(8, U))
    Sp = _pad_rows(scores, tile)
    pad_i = (-I) % chunk
    if pad_i:
        Sp = jnp.concatenate(
            [Sp, jnp.full((Sp.shape[0], pad_i), NEG_INF, Sp.dtype)], axis=1
        )
    seen8 = _pad_cols_true(_pad_rows(seen.astype(jnp.int8), tile), chunk)
    Up, Ip = Sp.shape

    grid = (Up // tile, Ip // chunk)
    out_v, out_i = pl.pallas_call(
        functools.partial(_scores_topk_kernel, k=k, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, chunk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, chunk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Up, k), jnp.float32),
            jax.ShapeDtypeStruct((Up, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, _KP), jnp.float32),
            pltpu.VMEM((tile, _KP), jnp.int32),
        ],
        interpret=interpret,
    )(Sp, seen8)
    return out_v[:U], out_i[:U]
