"""NeuralCF: GMF tower || MLP tower -> joint projection.

Capability parity with reference model/neuralcf.py:7-73: GMF = elementwise
product of mf_dim embeddings; MLP = concat of half-width embeddings through a
ReLU stack then projected back to mf_dim; towers concatenated into a single
logit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.models.base import (
    ServingContext,
    catalog_scores_from_pairs,
)
from deeplearningrecommendationsystem_tpu.ops.linear import (
    embedding_init,
    linear,
    linear_init,
    mlp_init,
)
from deeplearningrecommendationsystem_tpu.parallel.ep import gather_rows


@dataclasses.dataclass
class NeuralCF:
    num_users: int
    num_items: int
    mf_dim: int = 256
    layers: Tuple[int, ...] = (512, 256, 128, 64, 32)

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 7)
        half = self.layers[0] // 2
        return {
            "gmf_user": embedding_init(ks[0], self.num_users, self.mf_dim),
            "gmf_item": embedding_init(ks[1], self.num_items, self.mf_dim),
            "mlp_user": embedding_init(ks[2], self.num_users, half),
            "mlp_item": embedding_init(ks[3], self.num_items, half),
            "mlp": mlp_init(ks[4], self.layers),
            "proj": linear_init(ks[5], self.layers[-1], self.mf_dim),
            "out": linear_init(ks[6], 2 * self.mf_dim, 1),
        }

    def apply(self, params: dict, batch) -> jnp.ndarray:
        users, items = batch
        gmf = gather_rows(params["gmf_user"], users) * gather_rows(params["gmf_item"], items)
        x = jnp.concatenate(
            [gather_rows(params["mlp_user"], users), gather_rows(params["mlp_item"], items)],
            axis=-1,
        )
        for p in params["mlp"]:
            x = jax.nn.relu(linear(p, x))
        mlp_vec = linear(params["proj"], x)
        return linear(params["out"], jnp.concatenate([gmf, mlp_vec], axis=-1))[:, 0]

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_pairs(
            self.apply, params, self.num_users, self.num_items
        )
