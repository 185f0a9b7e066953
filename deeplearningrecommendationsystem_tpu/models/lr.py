"""Logistic Regression over the 45-col feature vector.

Capability parity with reference model/lr.py:11-37: id-bias embeddings plus a
linear layer over the 43 dense columns.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.features import FeatureSpec, ML100K_SPEC
from deeplearningrecommendationsystem_tpu.models.base import (
    ServingContext,
    catalog_scores_from_features,
)
from deeplearningrecommendationsystem_tpu.models.common import linear_part, linear_part_init


@dataclasses.dataclass
class LogisticRegression:
    spec: FeatureSpec = ML100K_SPEC

    def init(self, key: jax.Array) -> dict:
        return linear_part_init(key, self.spec)

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        return linear_part(params, x, self.spec)[:, 0]

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)
