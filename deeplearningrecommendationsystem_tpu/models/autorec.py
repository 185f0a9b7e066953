"""AutoRec: sigmoid autoencoder over rating-matrix rows (U- and I- variants).

Capability parity with reference model/autorec.py:5-24: logits =
decoder(sigmoid(encoder(x))); the outer sigmoid is applied by the trainer's
BCE-with-logits. Trained with the masked-matrix mode (only rated entries
contribute to the loss, reference trainer/trainer.py:81-113). The U/I
distinction lives entirely in the data (user-major vs item-major matrix) and
in how the score matrix is oriented at serving time.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.models.base import ServingContext
from deeplearningrecommendationsystem_tpu.ops.linear import linear, linear_init


@dataclasses.dataclass
class AutoRec:
    num_input: int  # num_items for U-AutoRec, num_users for I-AutoRec
    hidden_units: int = 256

    def init(self, key: jax.Array) -> dict:
        ke, kd = jax.random.split(key)
        return {
            "encoder": linear_init(ke, self.num_input, self.hidden_units),
            "decoder": linear_init(kd, self.hidden_units, self.num_input),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """[B, num_input] matrix rows -> [B, num_input] logits."""
        hidden = jax.nn.sigmoid(linear(params["encoder"], x))
        return linear(params["decoder"], hidden)

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        """[U, I] logits from the full rating matrix in ``ctx``."""
        assert ctx.rating_matrix is not None, "AutoRec serving needs ctx.rating_matrix"
        scores = self.apply(params, ctx.rating_matrix)
        # I-AutoRec feeds the [I, U] transpose; orient back to [U, I]
        # (reference transposes recommendations instead, scripts/i-autorec.py:65).
        return scores if scores.shape[0] == ctx.num_users else scores.T
