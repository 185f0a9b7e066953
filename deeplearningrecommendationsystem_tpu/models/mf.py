"""Matrix Factorization: sigmoid(<p_u, q_i>).

Capability parity with reference model/mf.py:10-35; serving is the full
P @ Q^T score matrix (one MXU matmul) instead of a host round-trip.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.models.base import ServingContext
from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init


@dataclasses.dataclass
class MatrixFactorization:
    num_users: int
    num_items: int
    embedding_dim: int = 64

    def init(self, key: jax.Array) -> dict:
        ku, ki = jax.random.split(key)
        return {
            "user": embedding_init(ku, self.num_users, self.embedding_dim),
            "item": embedding_init(ki, self.num_items, self.embedding_dim),
        }

    def apply(self, params: dict, batch) -> jnp.ndarray:
        users, items = batch
        return jnp.sum(params["user"][users] * params["item"][items], axis=-1)

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return params["user"] @ params["item"].T
