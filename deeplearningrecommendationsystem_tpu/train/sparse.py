"""Sparse (lazy) embedding-row optimizer updates for production-scale tables.

The reference's tables are tiny (943/1682 rows) and every script updates them
with dense torch Adam (e.g. scripts/mf.py:66) — fine at ml-100k scale, but a
dense Adam step reads and writes the FULL table plus both moment buffers every
minibatch, so the step cost grows with vocab, not with batch. At production
vocabs (10^6–10^9 rows) that is the difference between an HBM-bound step over
gigabytes and one over megabytes.

This module provides the TPU-native production path: a minibatch step touches
only the rows the batch references.

  * :func:`dedup_rows` — jit-compatible sort-based dedup of a batch of ids,
    summing duplicate per-example row gradients (the mathematical gradient of
    a gather is exactly this segment-sum).
  * :func:`rowwise_adagrad` — the DLRM-standard embedding optimizer: one
    accumulator SCALAR per row (not per element), updated and applied only on
    touched rows.
  * :func:`lazy_adam` — Adam whose moments advance only for touched rows
    (torch.optim.SparseAdam semantics), with the global-step bias correction.

All three operate on ``[B]``-padded unique ids using the table's vocab size as
an out-of-range sentinel: gathers/scatters use ``mode='drop'``/``'fill'`` so
padding rows are no-ops and every shape stays static under ``jit``. Because
``jnp.unique`` returns SORTED UNIQUE ids, every gather/scatter passes
``unique_indices=True, indices_are_sorted=True`` -- without these hints XLA
assumes possible collisions and serializes TPU scatters (measured 92 ms/step
at a 64k batch on a 5.2M-row table; the hints let it vectorize).

Scale benchmark: ``tools/bench_scale_ctr.py`` (dense vs sparse step on a real
chip at multi-million-row vocab). Correctness: ``tests/test_sparse.py``
(NumPy dense-oracle equivalence, duplicate handling, padding no-ops).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


def dedup_rows(
    ids: jnp.ndarray, row_grads: jnp.ndarray, vocab: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge duplicate ids in a batch of per-example row gradients.

    Args:
      ids: ``[B]`` int ids into a ``[vocab, D]`` table (may repeat).
      row_grads: ``[B, D]`` gradient w.r.t. the gathered rows ``table[ids]``.
      vocab: table row count; used as the padding sentinel.

    Returns:
      ``(unique_ids [B], unique_grads [B, D])`` where the tail of
      ``unique_ids`` is padded with ``vocab`` (out of range) and the matching
      ``unique_grads`` rows are zero. ``unique_grads[j]`` is the sum of
      ``row_grads[i]`` over all ``i`` with ``ids[i] == unique_ids[j]`` — the
      exact dense scatter-add gradient, restricted to touched rows.
    """
    # (An explicit argsort + sorted-slot segment-sum variant was benchmarked
    # on the chip: identical runtime to jnp.unique's inverse scatter-add but
    # a 27x longer compile (404 s vs 15 s in-scan) -- the scatter cost is in
    # TPU's scatter lowering itself, not the index order. jnp.unique kept.)
    uids, inv = jnp.unique(
        ids, return_inverse=True, size=ids.shape[0], fill_value=vocab
    )
    ugrads = jnp.zeros((ids.shape[0], row_grads.shape[-1]), row_grads.dtype)
    ugrads = ugrads.at[inv].add(row_grads)
    # jnp.unique pads with fill_value at the END but maps nothing to those
    # slots, so padded rows already hold zeros.
    return uids, ugrads


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RowwiseAdagradState:
    """One accumulator scalar per row (``[vocab]``)."""

    accum: jnp.ndarray

    @classmethod
    def init(cls, vocab: int, init_accum: float = 0.0) -> "RowwiseAdagradState":
        return cls(accum=jnp.full((vocab,), init_accum, jnp.float32))


def rowwise_adagrad(
    table: jnp.ndarray,
    state: RowwiseAdagradState,
    uids: jnp.ndarray,
    ugrads: jnp.ndarray,
    lr: float,
    eps: float = 1e-10,
) -> Tuple[jnp.ndarray, RowwiseAdagradState]:
    """Row-wise AdaGrad on the touched rows only (DLRM's embedding optimizer).

    The accumulator is the running mean-square of each row's gradient
    averaged over the embedding dim — one scalar per row, so optimizer state
    is ``vocab`` floats instead of Adam's ``2 * vocab * D``.
    """
    g2 = jnp.mean(jnp.square(ugrads), axis=-1)  # [B]
    accum_rows = state.accum.at[uids].get(
        mode="fill", fill_value=0.0, unique_indices=True, indices_are_sorted=True
    ) + g2
    accum = state.accum.at[uids].set(
        accum_rows, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    scale = lr / (jnp.sqrt(accum_rows) + eps)  # [B]
    rows = table.at[uids].get(
        mode="fill", fill_value=0.0, unique_indices=True, indices_are_sorted=True
    )
    new_rows = rows - scale[:, None] * ugrads
    table = table.at[uids].set(
        new_rows, mode="drop", unique_indices=True, indices_are_sorted=True
    )
    return table, RowwiseAdagradState(accum=accum)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LazyAdamState:
    """Per-element moments plus the global step count.

    Both moments live in ONE ``[vocab, 2D]`` buffer (m = ``mv[:, :D]``,
    v = ``mv[:, D:]``): v5e has no SparseCore and a 64k-row scatter costs
    tens of ms regardless of row width, so one packed moment scatter instead
    of two separate ones cuts the step's scatter count from 3 to 2
    (SCALE_CTR_BENCH.json: the 3-scatter variant lost to dense Adam 0.87x).
    """

    mv: jnp.ndarray  # [vocab, 2D]: concat(m, v) along the feature axis
    t: jnp.ndarray  # scalar int32

    @classmethod
    def init(cls, vocab: int, dim: int) -> "LazyAdamState":
        return cls(
            mv=jnp.zeros((vocab, 2 * dim), jnp.float32),
            t=jnp.zeros((), jnp.int32),
        )

    @property
    def m(self) -> jnp.ndarray:
        return self.mv[:, : self.mv.shape[1] // 2]

    @property
    def v(self) -> jnp.ndarray:
        return self.mv[:, self.mv.shape[1] // 2 :]


def lazy_adam(
    table: jnp.ndarray,
    state: LazyAdamState,
    uids: jnp.ndarray,
    ugrads: jnp.ndarray,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, LazyAdamState]:
    """Adam restricted to touched rows (torch.optim.SparseAdam semantics).

    Moments of untouched rows do NOT decay — identical to dense Adam on any
    row whose gradient has been zero since its last touch would NOT be, so
    this is a deliberate semantic choice, the standard one for embeddings:
    a row's moments advance only when the row is in the batch. Bias
    correction uses the global step count (as torch SparseAdam does).
    """
    t = state.t + 1
    D = ugrads.shape[-1]
    kw_su = dict(unique_indices=True, indices_are_sorted=True)
    mv_rows = state.mv.at[uids].get(mode="fill", fill_value=0.0, **kw_su)
    m_rows = b1 * mv_rows[:, :D] + (1.0 - b1) * ugrads
    v_rows = b2 * mv_rows[:, D:] + (1.0 - b2) * jnp.square(ugrads)
    tf = t.astype(jnp.float32)
    m_hat = m_rows / (1.0 - b1**tf)
    v_hat = v_rows / (1.0 - b2**tf)
    rows = table.at[uids].get(mode="fill", fill_value=0.0, **kw_su)
    new_rows = rows - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    mv_new = jnp.concatenate([m_rows, v_rows], axis=-1)
    return (
        table.at[uids].set(new_rows, mode="drop", **kw_su),
        LazyAdamState(
            mv=state.mv.at[uids].set(mv_new, mode="drop", **kw_su),
            t=t,
        ),
    )


def sparse_table_update(
    table: jnp.ndarray,
    state,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    lr: float,
    **kw,
):
    """Convenience: dedup a batch's per-example row grads, then apply the
    optimizer matching ``state``'s type. ``ids`` may repeat; shapes static."""
    uids, ugrads = dedup_rows(ids, row_grads, table.shape[0])
    if isinstance(state, RowwiseAdagradState):
        return rowwise_adagrad(table, state, uids, ugrads, lr, **kw)
    if isinstance(state, LazyAdamState):
        return lazy_adam(table, state, uids, ugrads, lr, **kw)
    raise TypeError(f"unknown sparse optimizer state {type(state)!r}")
