"""DeepCrossing: embedding stack -> residual units -> scalar head.

Capability parity with reference model/deepcrossing.py:8-92: residual block =
ReLU(Linear2(ReLU(Linear1(x))) + x); block widths given by ``hidden_units``;
stack dim = 5 * D + 1 (raw age, no age table).
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
from deeplearningrecommendationsystem_tpu.ops.linear import linear, linear_init


@dataclasses.dataclass
class DeepCrossing:
    spec: FeatureSpec = ML100K_SPEC
    embedding_dim: int = 32
    hidden_units: Tuple[int, ...] = (256, 128, 64, 32)  # one residual block each

    def init(self, key: jax.Array) -> dict:
        dim_stack = 5 * self.embedding_dim + 1
        ks = jax.random.split(key, 2 + len(self.hidden_units))
        blocks = []
        for k, h in zip(ks[2:], self.hidden_units):
            k1, k2 = jax.random.split(k)
            blocks.append(
                {"up": linear_init(k1, dim_stack, h), "down": linear_init(k2, h, dim_stack)}
            )
        return {
            "tables": init_field_tables(ks[0], self.spec, self.embedding_dim),
            "blocks": blocks,
            "out": linear_init(ks[1], dim_stack, 1),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        e = embed_fields(params["tables"], x, self.spec)
        age = x[:, self.spec.age_col : self.spec.age_col + 1]
        r = jnp.concatenate(
            [e["user"], e["item"], age, e["gender"], e["occupation"], e["genre"]], axis=-1
        )
        for blk in params["blocks"]:
            r = jax.nn.relu(linear(blk["down"], jax.nn.relu(linear(blk["up"], r))) + r)
        return linear(params["out"], r)[:, 0]

    # serving catalog scorer runs with one-hot-matmul gathers (measured
    # winner, 1.42x -- serving.onehot_serving_scope / ONEHOT_SERVING_PROBE)
    onehot_serving = True

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)
