"""Shared wide/linear-part used by every feature-vector model.

The reference repeats the same "LR head" in eight models: a 1-dim user-id
bias table + 1-dim item-id bias table + Linear over the 43 dense columns
(e.g. model/lr.py:24-25, model/widedeep.py:60, model/deepfm.py:63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.features import FeatureSpec
from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init, linear, linear_init
from deeplearningrecommendationsystem_tpu.parallel.ep import gather_rows


def linear_part_init(key: jax.Array, spec: FeatureSpec, dtype=jnp.float32) -> dict:
    ku, ki, kw = jax.random.split(key, 3)
    return {
        "user_bias": embedding_init(ku, spec.num_users, 1, dtype),
        "item_bias": embedding_init(ki, spec.num_items, 1, dtype),
        "wide": linear_init(kw, spec.dense_width, 1, dtype=dtype),
    }


def linear_part(p: dict, x: jnp.ndarray, spec: FeatureSpec, gather=None) -> jnp.ndarray:
    """user_bias[u] + item_bias[i] + W . dense + b  -> [B, 1].

    ``gather`` swaps the id-bias lookup implementation: pass
    ops/embedding.gather_matmul_bwd to turn the backward's serialized TPU
    scatter-add into one one-hot MXU matmul (single-chip fast path; the
    default gather_rows routes through EP sharding when a mesh is active).
    """
    gather = gather or gather_rows
    u = x[:, spec.user_col].astype(jnp.int32)
    i = x[:, spec.item_col].astype(jnp.int32)
    return (
        gather(p["user_bias"], u)
        + gather(p["item_bias"], i)
        + linear(p["wide"], spec.dense(x))
    )
