"""Wide&Deep: LR wide path + embedding-concat deep tower.

Capability parity with reference model/widedeep.py:8-79. Deep input is
[user, item, raw_age, gender, occupation, genre] embeddings (5*D + 1); the
first projection has no activation and every subsequent layer ReLUs its
output (including the last -- a reference quirk kept for parity,
model/widedeep.py:51-57).
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
from deeplearningrecommendationsystem_tpu.models.common import linear_part, linear_part_init
from deeplearningrecommendationsystem_tpu.ops.embedding import embed_fields, init_field_tables
from deeplearningrecommendationsystem_tpu.ops.linear import (
    linear,
    linear_init,
    mlp_init,
    relu_stack,
)


@dataclasses.dataclass
class WideDeep:
    spec: FeatureSpec = ML100K_SPEC
    hidden_units: Tuple[int, ...] = (512, 256, 128, 1)
    embedding_dim: int = 128
    # The reference tower ends in ReLU(Linear(128, 1)): with full-batch
    # training ~half of init seeds collapse the deep path permanently (the
    # scalar pre-activation goes negative for every input and the gradient
    # dies -- measured on both this implementation AND the torch reference).
    # robust_init=True starts the final bias at +0.1 so the unit is born
    # alive; parity mode keeps the faithful fragile init.
    robust_init: bool = False

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 5)
        d_in = 5 * self.embedding_dim + 1
        deep = mlp_init(ks[2], self.hidden_units)
        if self.robust_init:
            deep[-1]["b"] = jnp.full_like(deep[-1]["b"], 0.1)
        return {
            "tables": init_field_tables(ks[0], self.spec, self.embedding_dim),
            "deep_in": linear_init(ks[1], d_in, self.hidden_units[0]),
            "deep": deep,
            "wide": linear_part_init(ks[3], self.spec),
            "out": linear_init(ks[4], 2, 1),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        e = embed_fields(params["tables"], x, self.spec)
        age = x[:, self.spec.age_col : self.spec.age_col + 1]
        deep_x = jnp.concatenate(
            [e["user"], e["item"], age, e["gender"], e["occupation"], e["genre"]], axis=-1
        )
        deep = relu_stack(params["deep"], linear(params["deep_in"], deep_x))
        wide = linear_part(params["wide"], x, self.spec)
        return linear(params["out"], jnp.concatenate([wide, deep], axis=-1))[:, 0]

    # serving catalog scorer runs with one-hot-matmul gathers (measured
    # winner, 1.38x -- serving.onehot_serving_scope / ONEHOT_SERVING_PROBE)
    onehot_serving = True

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)
