"""RETIRED as a per-op route -- measured loser in-scan (0.64-0.73x across
mf/ffm/neuralcf, PALLAS_GATHER_PROBE.json): each in-scan pallas_call carries
~0.3-0.5 ms fixed overhead on this stack, so routing 4 gather kernels per
epoch loses even though each kernel is 10-20x faster than XLA's in-loop
lowering in isolation (KERNEL_BENCH.json onehot rows). Not routed by any
default path (TrainConfig.pallas_gather stays False); the winning shape is
ONE fused kernel per epoch/run (see ops/pallas/lr_epoch.py, mf_epoch.py) --
this module's kernels remain the building blocks and the measurement
artifact.

MXU mask-matmul embedding gather: fwd ``mask @ table``, bwd ``mask^T @ g``.

TPU v5e has no gather/scatter hardware: XLA's native row-gather of
[229k, 64] from a small table runs at ~70 GB/s effective (~0.42 ms for a
29 MB result — measured in the r4 MF device trace), and its one-hot-matmul
backward lowers to a VPU convolution emitter at ~0.3-0.4 ms when fused into
the training loop. Both directions are really tiny-vocab one-hot matmuls,
which the MXU does near-instantly if the one-hot never leaves VMEM:

* forward: per [R] id block, build ``mask[R, Vp] = (iota == id)`` in-VMEM
  and compute ``mask @ table`` — one [R, Vp] x [Vp, D] MXU matmul per
  block; the table block is grid-invariant and stays resident.
* backward: ops/pallas/onehot_grad.py (same trick, transposed contraction;
  0.032 ms at the MF item shape vs 0.42 ms for the in-loop XLA fusion).

Numerics: the mask is exact in any float dtype (0/1), the forward dot adds
exact zeros (identical to ``table[ids]``), the backward accumulates in f32
exactly like the XLA one-hot dot. Oracle tests in tests/test_kernels.py.

Only sensible for SMALL vocabs (the mask is [R, Vp] in VMEM and the matmul
does N*Vp*D MACs): the ml-100k user/item tables (943/1682 rows) qualify;
multi-million-row tables must keep the native gather + sparse-row updates
(train/sparse_trainer.py).

Reference analogue: every ``embedding(ids)`` lookup in the reference models
(e.g. /root/reference/model/mf.py:16-25).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeplearningrecommendationsystem_tpu.ops.pallas.onehot_grad import (
    _round_up,
    onehot_grad,
)


def _fwd_kernel(ids_ref, table_ref, out_ref, *, n_valid: int, block_rows: int):
    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    valid = rows + i * block_rows < n_valid
    ids = jnp.where(valid, ids_ref[:], -1)  # padded rows match nothing -> 0
    v_pad = table_ref.shape[0]
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (block_rows, v_pad), 1) == ids
    ).astype(table_ref.dtype)  # [R, Vp] -- never leaves VMEM
    # f32 accumulation (Mosaic requires a 32-bit matmul acc); each output
    # element is exactly one table value plus exact zeros, so the cast back
    # to the table dtype is still bit-exact vs table[ids].
    out_ref[:] = jax.lax.dot(
        mask, table_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def gather_mm_fwd_pallas(
    table: jnp.ndarray,  # [V, D]
    ids: jnp.ndarray,  # [N] int
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """``table[ids]`` as per-block in-VMEM mask @ table MXU matmuls."""
    N = ids.shape[0]
    V, D = table.shape
    v_pad = _round_up(V, 8)
    tbl = jnp.pad(table, ((0, v_pad - V), (0, 0))) if v_pad != V else table
    block_rows = min(block_rows, _round_up(N, 8))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_valid=N, block_rows=block_rows),
        grid=(pl.cdiv(N, block_rows),),
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_pad, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((-(-N // block_rows) * block_rows, D),
                                       table.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(ids.reshape(N, 1).astype(jnp.int32), tbl)
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_mm_pallas(vocab: int, dtype_name: str, table, ids):
    return gather_mm_fwd_pallas(table, ids.reshape(-1)).reshape(
        ids.shape + (table.shape[1],)
    )


def _gmp_fwd(vocab, dtype_name, table, ids):
    return _gather_mm_pallas(vocab, dtype_name, table, ids), ids


def _gmp_bwd(vocab, dtype_name, ids, g):
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    return onehot_grad(flat_ids, flat_g, vocab).astype(dtype_name), None


_gather_mm_pallas.defvjp(_gmp_fwd, _gmp_bwd)


def gather_rows_mm_pallas(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` with Pallas mask-matmul forward AND backward."""
    return _gather_mm_pallas(table.shape[0], str(table.dtype), table, ids)
