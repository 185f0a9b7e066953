"""NFM: first-order LR + bi-interaction pooling fed to a deep tower.

Capability parity with reference model/nfm.py:8-84: the O(F^2) elementwise
double loop collapses to the sum-square bi-interaction identity.
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
from deeplearningrecommendationsystem_tpu.ops.interactions import bi_interaction
from deeplearningrecommendationsystem_tpu.ops.linear import (
    linear,
    linear_init,
    mlp_init,
    relu_stack,
)

FIELDS = ("user", "item", "age", "gender", "occupation", "genre")


@dataclasses.dataclass
class NFM:
    spec: FeatureSpec = ML100K_SPEC
    hidden_units: Tuple[int, ...] = (512, 256, 128, 1)
    embedding_dim: int = 128
    robust_init: bool = False  # see models/widedeep.py: revive-at-init for the
    # ReLU-terminated deep tower (parity mode keeps the faithful fragile init)
    f32_cross: bool = True  # keep bi-interaction (sum-square cancellation)
    # in f32 under bf16 compute; the MLP stays in the compute dtype

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 5)
        deep = mlp_init(ks[2], self.hidden_units)
        if self.robust_init:
            deep[-1]["b"] = jnp.full_like(deep[-1]["b"], 0.1)
        return {
            "tables": init_field_tables(ks[0], self.spec, self.embedding_dim, FIELDS),
            "deep_in": linear_init(ks[1], self.embedding_dim, self.hidden_units[0]),
            "deep": deep,
            "wide": linear_part_init(ks[3], self.spec),
            "out": linear_init(ks[4], 2, 1),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        e = embed_fields(params["tables"], x, self.spec)
        fields = jnp.stack([e[f] for f in FIELDS], axis=1)  # [B, 6, D]
        if self.f32_cross:
            cross = bi_interaction(fields.astype(jnp.float32)).astype(fields.dtype)
        else:
            cross = bi_interaction(fields)  # [B, D]
        deep = relu_stack(params["deep"], linear(params["deep_in"], cross))
        wide = linear_part(params["wide"], x, self.spec)
        return linear(params["out"], jnp.concatenate([wide, deep], axis=-1))[:, 0]

    # serving catalog scorer runs with one-hot-matmul gathers (measured
    # winner, 1.45x -- serving.onehot_serving_scope / ONEHOT_SERVING_PROBE)
    onehot_serving = True

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)
