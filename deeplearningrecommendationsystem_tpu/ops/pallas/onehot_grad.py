"""RETIRED -- measured loser (0.52-0.93x vs XLA zoo-wide, r4 probe,
ONEHOT_GRAD_PROBE.json); kept as a measurement artifact, not routed by any
default path (ops/embedding._PALLAS_ONEHOT_GRAD = False).

Embedding-gather backward with the one-hot mask built in-VMEM.

The hypothesis was that XLA materializes the [N, vocab] one-hot operand of
the matmul backward (ops/embedding.gather_matmul_bwd) in HBM, costing
~1 GB/epoch per table at ml-100k batch sizes. The probe refuted it: the TPU
XLA backend fuses the compare-generated one-hot into the dot operand stream
(no HBM round-trip), so this kernel's only effect was adding VPU mask-build
time: 0.62x on mf, 0.52x ffm, 0.74x neuralcf, 0.90x deepfm, 0.74x widedeep,
0.93x dien (full-training probe, tools/probe_onehot_grad.py). Contrast with
the LR compact kernel's 2.26x win (lr_epoch.py), where the design matrix WAS
a real materialized HBM input.

This kernel streams only ``ids`` [N] and
``g`` [N, D] from HBM, rebuilds each block's one-hot as an iota==id compare
mask in VMEM, and accumulates ``mask^T @ g`` into a [vocab, D] f32 output
block that persists across the sequential grid. Same FLOPs as the XLA dot.

Numerics: the dot accumulates in f32 (``preferred_element_type``) exactly
like the XLA path; block-sequential summation order differs only by
grouping. Gradient equivalence is tested in interpret mode
(tests/test_kernels.py) and the TPU path is oracle-checked against the XLA
path by tools/bench_kernels.py.

Reference analogue: the ``embedding.weight.grad`` scatter every
``loss.backward()`` performs in e.g. /root/reference/model/mf.py:16-25.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def _kernel(ids_ref, g_ref, out_ref, *, n_valid: int, block_rows: int):
    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0)
    valid = rows + i * block_rows < n_valid
    ids = jnp.where(valid, ids_ref[:], -1)  # [R, 1]; padded rows match nothing
    g = jnp.where(valid, g_ref[:], 0.0)  # [R, D]
    v_pad = out_ref.shape[0]
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (block_rows, v_pad), 1) == ids
    ).astype(g.dtype)  # [R, Vp] -- never leaves VMEM
    blk = jax.lax.dot_general(
        mask, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Vp, D] f32

    @pl.when(i == 0)
    def _():
        out_ref[:] = blk

    @pl.when(i > 0)
    def _():
        out_ref[:] = out_ref[:] + blk


def onehot_grad(
    ids: jnp.ndarray,  # [N] int
    g: jnp.ndarray,  # [N, D] cotangent rows
    vocab: int,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """``sum_n onehot(ids[n], vocab) outer g[n]`` -> [vocab, D] float32."""
    N, D = g.shape
    v_pad = _round_up(vocab, 8)
    block_rows = min(block_rows, _round_up(N, 8))
    grid = (pl.cdiv(N, block_rows),)
    out = pl.pallas_call(
        functools.partial(_kernel, n_valid=N, block_rows=block_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((v_pad, D), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v_pad, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(ids.reshape(N, 1).astype(jnp.int32), g)
    return out[:vocab]
