"""Field-embedding helpers shared by the feature-vector model family.

Every feature-vector model embeds the same six ml-100k fields; sparse id
fields gather rows from their table, multi-hot/dense fields project through
the table with one matmul -- the same math as the reference's
``matmul(one_hot_block, embedding.weight)`` (e.g. model/deepfm.py:47-51) but
expressed as a single fused batched op per field.
"""

from __future__ import annotations

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


def bias_embedding_init(key: jax.Array, num: int, dtype=jnp.float32) -> jax.Array:
    """[num, 1] xavier-normal bias table (the reference's 1-dim id embeddings
    used in every wide/linear part, e.g. model/lr.py:15-16)."""
    return embedding_init(key, num, 1, dtype)
