"""Field-embedding helpers shared by the feature-vector model family.

Every feature-vector model embeds the same six ml-100k fields; sparse id
fields gather rows from their table, multi-hot/dense fields project through
the table with one matmul -- the same math as the reference's
``matmul(one_hot_block, embedding.weight)`` (e.g. model/deepfm.py:47-51) but
expressed as a single fused batched op per field.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.features import FeatureSpec
from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init
from deeplearningrecommendationsystem_tpu.parallel.ep import gather_rows


def init_field_tables(
    key: jax.Array,
    spec: FeatureSpec,
    dim: int,
    fields: Sequence[str] = ("user", "item", "gender", "occupation", "genre"),
    dtype=jnp.float32,
) -> Dict[str, jax.Array]:
    """Xavier-normal tables for the requested fields ('age' has vocab 1)."""
    sizes = {
        "user": spec.num_users,
        "item": spec.num_items,
        "age": 1,
        "gender": spec.num_genders,
        "occupation": spec.num_occupations,
        "genre": spec.num_genres,
    }
    keys = jax.random.split(key, len(fields))
    return {f: embedding_init(k, sizes[f], dim, dtype) for f, k in zip(fields, keys)}


def embed_fields(
    tables: Dict[str, jax.Array], x: jnp.ndarray, spec: FeatureSpec
) -> Dict[str, jnp.ndarray]:
    """Embed each field of a [B, 45] feature matrix -> dict of [B, D] arrays.

    Only fields present in ``tables`` are embedded; 'age' (vocab-1 table)
    projects the scalar age through its single row.
    """
    user, item, age, gender, occupation, genre = spec.split(x)
    out: Dict[str, jnp.ndarray] = {}
    if "user" in tables:
        out["user"] = gather_rows(tables["user"], user)
    if "item" in tables:
        out["item"] = gather_rows(tables["item"], item)
    if "age" in tables:
        out["age"] = age @ tables["age"]
    if "gender" in tables:
        out["gender"] = gender @ tables["gender"]
    if "occupation" in tables:
        out["occupation"] = occupation @ tables["occupation"]
    if "genre" in tables:
        out["genre"] = genre @ tables["genre"]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_mm(vocab: int, dtype_name: str, table: jax.Array, ids: jax.Array):
    return table[ids]


def _gather_mm_fwd(vocab, dtype_name, table, ids):
    return table[ids], ids


# RETIRED default (measured loser, r4): the Pallas in-VMEM-mask backward
# (ops/pallas/onehot_grad.py) was built on the hypothesis that XLA
# materializes the [N, vocab] one-hot operand in HBM -- it does NOT: the TPU
# backend fuses the compare-generated one-hot into the dot operand stream,
# so the kernel only added mask-build VPU work. Full-training probe
# (ONEHOT_GRAD_PROBE.json): 0.52x (ffm) .. 0.93x (dien) vs XLA across six
# models. Kept as an opt-in measurement artifact, not routed by default.
_PALLAS_ONEHOT_GRAD = False


def _gather_mm_bwd(vocab, dtype_name, ids, g):
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, g.shape[-1])
    if _PALLAS_ONEHOT_GRAD and jax.default_backend() == "tpu":
        from deeplearningrecommendationsystem_tpu.ops.pallas.onehot_grad import (
            onehot_grad,
        )

        return onehot_grad(flat_ids, flat_g, vocab).astype(dtype_name), None
    onehot = (
        flat_ids[:, None] == jax.lax.broadcasted_iota(flat_ids.dtype, (1, vocab), 1)
    ).astype(flat_g.dtype)
    dtable = jax.lax.dot_general(
        onehot, flat_g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dtable.astype(dtype_name), None


_gather_mm.defvjp(_gather_mm_fwd, _gather_mm_bwd)


def gather_matmul_bwd(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[ids]`` whose BACKWARD is a one-hot matmul instead of scatter-add.

    TPU scatter lowers to a serialized per-update loop, which dominates the
    train step when a [B, L] batch writes ~1M row-gradients into a small
    table (DIN/DIEN: 879k updates into 1682 rows). The cotangent
    ``onehot(ids)^T @ g`` is one MXU matmul with the one-hot fused into the
    dot operand by XLA -- O(N * V * D) FLOPs but at MXU rate, beating the
    serialized scatter for small vocabs (use for vocab <~ 8k; at large vocab
    the FLOPs lose and train/sparse.py's row updates are the right tool).
    Forward and the f32-accumulated backward are numerically equal to the
    gather/scatter pair (summation order aside).
    """
    return _gather_mm(table.shape[0], str(table.dtype), table, ids)


def gather_onehot(table: jax.Array, ids: jax.Array) -> jax.Array:
    """``table[ids]`` as a one-hot MXU matmul in BOTH directions.

    r5 MF layout probe (MF_LAYOUT_PROBE.json): v5e's native in-scan row
    gather runs ~12x off HBM bandwidth (no gather hardware, r4 trace), while
    XLA fuses the compare-generated one-hot straight into the dot stream --
    ``onehot(ids) @ table`` forward gave MF 1.36x end-to-end and the [D, B]
    orientation 1.47x. The backward of this matmul is automatically the
    one-hot cotangent matmul (the r3 ``gather_matmul_bwd`` trick), so no
    custom VJP is needed. Values are exact (a one-hot row extracts exact
    floats; no accumulation). Small vocabs only: O(N * V * D) FLOPs.

    Out-of-range semantics differ from ``table[ids]``: the native gather
    CLAMPS out-of-range ids (and wraps negatives) while the one-hot matches
    nothing and yields a ZERO row. Callers must pass in-range ids (every
    shipped route does: histories pad with the valid id 0).
    """
    flat = ids.reshape(-1)
    onehot = (
        flat[:, None] == jax.lax.broadcasted_iota(flat.dtype, (1, table.shape[0]), 1)
    ).astype(table.dtype)
    return (onehot @ table).reshape(ids.shape + (table.shape[1],))


def bias_embedding_init(key: jax.Array, num: int, dtype=jnp.float32) -> jax.Array:
    """[num, 1] xavier-normal bias table (the reference's 1-dim id embeddings
    used in every wide/linear part, e.g. model/lr.py:15-16)."""
    return embedding_init(key, num, 1, dtype)
