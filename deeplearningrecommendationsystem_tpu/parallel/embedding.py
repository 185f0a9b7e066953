"""Row-sharded embedding tables over the 'model' mesh axis.

The reference keeps whole tables on one device (model/mf.py:16-17); at
production vocab sizes a table outgrows one chip's HBM, so rows are sharded
across the model axis and lookups become a collective (SURVEY.md §2.5).

Design (shard_map, masked local gather + psum):
  * each model-shard owns a contiguous row block [V / m, D];
  * for a replicated id batch, every shard gathers the ids it owns (others
    clamp to row 0 and contribute zeros via a mask);
  * one ``psum`` over the model axis assembles the full [B, D] activation --
    bandwidth B*D per step, rides ICI, and the same path is linear so the
    cotangent flows back through psum -> masked scatter-add into local rows.

This is numerically identical to a dense gather on the unsharded table (the
single-chip fast path) -- proven by tests on the 8-device CPU mesh. The
Pallas fused variant (ops/pallas) drops in behind the same API.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS


def _local_gather(table_shard: jnp.ndarray, ids: jnp.ndarray, shard_rows: int):
    """Gather rows this shard owns; zeros for the rest. Runs inside shard_map."""
    shard_idx = jax.lax.axis_index(MODEL_AXIS)
    lo = shard_idx * shard_rows
    local = ids - lo
    owned = (local >= 0) & (local < shard_rows)
    local = jnp.clip(local, 0, shard_rows - 1)
    out = table_shard[local] * owned[:, None].astype(table_shard.dtype)
    return jax.lax.psum(out, MODEL_AXIS)


def shard_table(table: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Row-shard a table over the model axis, zero-padding the vocab to a
    multiple of the axis size (real vocabs -- ml-100k's 943/1682 -- are not
    divisible). Pad rows are never addressed by valid ids, receive zero
    gradient, and must be sliced off (``table[:vocab]``) before any
    full-table matmul (e.g. MF catalog scoring)."""
    m = mesh.shape[MODEL_AXIS]
    vocab = table.shape[0]
    padded = ((vocab + m - 1) // m) * m
    if padded != vocab:
        table = jnp.concatenate(
            [table, jnp.zeros((padded - vocab,) + table.shape[1:], table.dtype)]
        )
    return jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS, None)))


def sharded_gather(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """[B] ids -> [B, D] rows from a table sharded P('model', None)."""
    m = mesh.shape[MODEL_AXIS]
    vocab = table.shape[0]
    assert vocab % m == 0, (
        f"vocab {vocab} not divisible by model axis {m}; pad with shard_table"
    )
    shard_rows = vocab // m
    fn = jax.shard_map(
        partial(_local_gather, shard_rows=shard_rows),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
    )
    return fn(table, ids)


def _local_gather_scatter(table_shard, ids_shard, shard_rows: int):
    """id-exchange variant, runs inside shard_map with batch-sharded ids.

    all_gather the (tiny, int32) id shards so every table shard sees the full
    batch, gather the rows it owns, then ``psum_scatter`` so each device
    receives exactly the [B/m, D] activation block for its own ids. Per-device
    activation traffic is (m-1)/m * B * D — half the bidirectional all-reduce
    of the ``psum`` path — and the output stays batch-sharded over the model
    axis, which composes with treating that axis as extra batch parallelism
    downstream (SURVEY.md §2.5's "all-to-all ID exchange").
    """
    shard_idx = jax.lax.axis_index(MODEL_AXIS)
    ids = jax.lax.all_gather(ids_shard, MODEL_AXIS, tiled=True)  # [B] int32
    lo = shard_idx * shard_rows
    local = ids - lo
    owned = (local >= 0) & (local < shard_rows)
    local = jnp.clip(local, 0, shard_rows - 1)
    contrib = table_shard[local] * owned[:, None].astype(table_shard.dtype)
    return jax.lax.psum_scatter(contrib, MODEL_AXIS, tiled=True)  # [B/m, D]


def sharded_gather_scatter(
    table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh
) -> jnp.ndarray:
    """[B] ids -> [B, D] rows via id all_gather + ``psum_scatter``.

    Same result as :func:`sharded_gather` (tested bit-equal, gradients
    included) at half the per-device activation traffic; requires B divisible
    by the model axis size. The returned global array is sharded
    P('model', None) over the batch dim.
    """
    m = mesh.shape[MODEL_AXIS]
    vocab = table.shape[0]
    assert vocab % m == 0, (
        f"vocab {vocab} not divisible by model axis {m}; pad with shard_table"
    )
    assert ids.shape[0] % m == 0, (
        f"batch {ids.shape[0]} not divisible by model axis {m}"
    )
    fn = jax.shard_map(
        partial(_local_gather_scatter, shard_rows=vocab // m),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS)),
        out_specs=P(MODEL_AXIS, None),
    )
    return fn(table, ids)


@dataclasses.dataclass
class ShardedEmbedding:
    """An embedding table row-sharded over the mesh's model axis.

    On a 1-sized model axis (or mesh=None) this degrades to a plain dense
    gather -- the single-chip fast path.

    ``strategy``: 'psum' (masked gather + all-reduce, replicated output,
    works for any batch size) or 'scatter' (id all_gather + psum_scatter,
    half the activation traffic, batch-sharded output; batch must divide the
    model axis size).
    """

    vocab: int
    dim: int
    mesh: Mesh | None = None
    strategy: str = "psum"

    def init(self, key: jax.Array) -> jnp.ndarray:
        table = embedding_init(key, self.vocab, self.dim)
        if self.mesh is not None and self.mesh.shape[MODEL_AXIS] > 1:
            table = shard_table(table, self.mesh)  # pads vocab to the axis
        return table

    def lookup(self, table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None or self.mesh.shape[MODEL_AXIS] == 1:
            return table[ids]
        if self.strategy == "scatter":
            return sharded_gather_scatter(table, ids, self.mesh)
        return sharded_gather(table, ids, self.mesh)
