"""DCN (Deep & Cross Network): cross network || deep tower.

Capability parity with reference model/deepcross.py:7-89. The reference's
cross layer is x <- x0 * (W_l x) + b_l + x with a full DxD weight (a
DCN-v2-style matrix cross, not the rank-1 vector of DCN-v1) -- kept as-is.
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
from deeplearningrecommendationsystem_tpu.ops.linear import linear, linear_init, mlp_init, relu_stack


@dataclasses.dataclass
class DCN:
    spec: FeatureSpec = ML100K_SPEC
    cross_layers: int = 3
    deep_hidden_units: Tuple[int, ...] = (512, 256, 128, 1)
    embedding_dim: int = 128

    def init(self, key: jax.Array) -> dict:
        d = 5 * self.embedding_dim + 1
        ks = jax.random.split(key, 3 + self.cross_layers)
        cross = []
        for k in ks[3:]:
            cross.append(
                {
                    "w": linear_init(k, d, d, bias=False)["w"],
                    "b": jnp.zeros((d,), dtype=jnp.float32),
                }
            )
        return {
            "tables": init_field_tables(ks[0], self.spec, self.embedding_dim),
            "cross": cross,
            "deep": mlp_init(ks[1], (d,) + tuple(self.deep_hidden_units)),
            "out": linear_init(ks[2], d + self.deep_hidden_units[-1], 1),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        e = embed_fields(params["tables"], x, self.spec)
        age = x[:, self.spec.age_col : self.spec.age_col + 1]
        x0 = jnp.concatenate(
            [e["user"], e["item"], age, e["gender"], e["occupation"], e["genre"]], axis=-1
        )
        xc = x0
        for layer in params["cross"]:
            xc = x0 * (xc @ layer["w"]) + layer["b"] + xc
        deep = relu_stack(params["deep"], x0)
        return linear(params["out"], jnp.concatenate([xc, deep], axis=-1))[:, 0]

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)
