"""Embedding row gather with scalar-prefetched ids + double-buffered DMA.

RETIRED -- measured loser: 0.37x vs XLA's gather at [262144 ids, 131072x128
table] (KERNEL_BENCH.json::gather). Kept as a measurement artifact; NOT
routed by any default path (the production embedding paths are the one-hot
matmul backward + the sparse row optimizers) -- do not re-enable without a
new winning measurement on the target shape.

The lookup path of a (row-sharded) embedding table: ids are prefetched into
SMEM before the kernel body runs (PrefetchScalarGridSpec), the table stays in
HBM/ANY, and rows stream into the VMEM output block with N_INFLIGHT DMAs in
flight, N_INFLIGHT rows issued per scalar-core loop branch.
On ml-100k tables XLA's gather is already fine; this kernel is the building
block for the large-vocab EP path where gather locality and DMA pipelining
dominate (SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


N_INFLIGHT = 8  # row DMAs in flight; issue latency dominates a row gather


def _kernel(ids_ref, table_ref, out_ref, sems):
    block = pl.program_id(0)
    TB = out_ref.shape[0]
    base = block * TB

    def get_dma(slot, r):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[base + r]],
            out_ref.at[r],
            sems.at[slot],
        )

    # block_rows is forced to a multiple of N_INFLIGHT, so the pipeline can be
    # unrolled N_INFLIGHT rows per fori_loop iteration with STATIC slot
    # indices and no per-row bounds guard: the scalar core runs one loop
    # branch per N_INFLIGHT rows instead of one per row (DMA issue on the
    # scalar core is the bottleneck of a row gather, not HBM bandwidth).
    for r in range(min(N_INFLIGHT, TB)):  # static prologue
        get_dma(r, r).start()

    n_iter = TB // N_INFLIGHT

    def body(i, _):
        r0 = i * N_INFLIGHT
        for j in range(N_INFLIGHT):  # static unroll
            get_dma(j, r0 + j).wait()
            get_dma(j, r0 + j + N_INFLIGHT).start()
        return 0

    jax.lax.fori_loop(0, n_iter - 1, body, 0)

    # epilogue: drain the last N_INFLIGHT rows (no refill)
    r0 = (n_iter - 1) * N_INFLIGHT
    for j in range(N_INFLIGHT):
        get_dma(j, r0 + j).wait()


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def gather_rows_pallas(
    table: jnp.ndarray,  # [V, D]
    ids: jnp.ndarray,  # [B] int32
    block_rows: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    if block_rows % N_INFLIGHT or block_rows < N_INFLIGHT:
        raise ValueError(f"block_rows must be a multiple of {N_INFLIGHT}")
    B = ids.shape[0]
    D = table.shape[1]
    B_pad = ((B + block_rows - 1) // block_rows) * block_rows
    if B_pad != B:
        ids = jnp.concatenate([ids, jnp.zeros((B_pad - B,), ids.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B_pad // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (block_rows, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N_INFLIGHT,))],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B_pad, D), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(ids.astype(jnp.int32), table)
    return out[:B]
