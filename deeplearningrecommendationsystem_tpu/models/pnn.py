"""PNN: product layer (inner or outer mode) + DNN.

Capability parity with reference model/pnn.py:27-143: lz = Linear(concat of
field embeddings), lp = Linear(pairwise inner products) in "in" mode or
Linear(outer product of the summed field vector) in "out" mode; lz + lp feeds
a ReLU DNN and a final scalar head. (The reference's stray ``unsqueeze(0)``
on z, model/pnn.py:55, only adds a broadcast dim and is mathematically
dropped here.)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.features import FeatureSpec, ML100K_SPEC
from deeplearningrecommendationsystem_tpu.models.base import (
    ServingContext,
    catalog_scores_from_features,
)
from deeplearningrecommendationsystem_tpu.ops.embedding import embed_fields, init_field_tables
from deeplearningrecommendationsystem_tpu.ops.interactions import pairwise_inner_products
from deeplearningrecommendationsystem_tpu.ops.linear import (
    linear,
    linear_init,
    mlp_init,
    relu_stack,
)

FIELDS = ("user", "item", "age", "gender", "occupation", "genre")


@dataclasses.dataclass
class PNN:
    spec: FeatureSpec = ML100K_SPEC
    embedding_dim: int = 256
    hidden_units: Tuple[int, ...] = (256, 128, 64, 32)
    mode: str = "in"  # "in" (inner products) or "out" (outer product)

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 5)
        n_fields = len(FIELDS)
        lp_in = (
            n_fields * (n_fields - 1) // 2 if self.mode == "in" else self.embedding_dim
        )
        return {
            "tables": init_field_tables(ks[0], self.spec, self.embedding_dim, FIELDS),
            "lz": linear_init(ks[1], n_fields * self.embedding_dim, self.hidden_units[0]),
            "lp": linear_init(ks[2], lp_in, self.hidden_units[0]),
            "dnn": mlp_init(ks[3], self.hidden_units),
            "out": linear_init(ks[4], self.hidden_units[-1], 1),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        e = embed_fields(params["tables"], x, self.spec)
        fields = jnp.stack([e[f] for f in FIELDS], axis=1)  # [B, F, D]
        z = fields.reshape(fields.shape[0], -1)
        if self.mode == "in":
            p = pairwise_inner_products(fields)  # [B, F(F-1)/2]
        else:
            # Outer mode. The reference's outer path (model/pnn.py:68-72)
            # transposes the batch axis into the outer product and cannot run
            # for B != D; the repaired per-sample equivalent with the same
            # parameter shape (Linear(D, H)) feeds the summed field vector,
            # whose rank-1 outer product it fully determines.
            p = jnp.sum(fields, axis=1)  # [B, D]
        h = relu_stack(params["dnn"], linear(params["lz"], z) + linear(params["lp"], p))
        return linear(params["out"], h)[:, 0]

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)
