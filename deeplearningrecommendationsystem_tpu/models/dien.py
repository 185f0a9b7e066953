"""DIEN: attention-scaled history -> interest-evolution GRU -> MLP head.

Capability parity with reference model/dien.py:8-81: the internal attention
block returns per-step attention-SCALED history embeddings (not pooled); a
plain GRU consumes them and its final hidden state is the interest vector.
The reference omits AUGRU and the auxiliary loss (SURVEY.md #13); parity mode
matches that, while ``use_augru=True`` switches the evolution layer to the
paper's attention-update-gate GRU as an extension.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.models.base import (
    ServingContext,
    catalog_scores_from_history,
    catalog_scores_full_history,
)
from deeplearningrecommendationsystem_tpu.ops.attention import din_attention_weights
from deeplearningrecommendationsystem_tpu.ops.gru import augru, gru, gru_init
from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init, mlp, mlp_init
from deeplearningrecommendationsystem_tpu.ops.embedding import gather_matmul_bwd
from deeplearningrecommendationsystem_tpu.parallel.ep import gather_rows


@dataclasses.dataclass
class DIEN:
    num_items: int
    embed_size: int = 16
    attention_units: Tuple[int, ...] = (64, 32, 1)
    fc_units: Tuple[int, ...] = (128, 64, 1)
    use_augru: bool = False
    # see models/din.py: one-hot-matmul backward for the item-table gathers
    matmul_gather_bwd: bool = False

    def init(self, key: jax.Array) -> dict:
        ke, ka, kg, kf = jax.random.split(key, 4)
        return {
            "item": embedding_init(ke, self.num_items, self.embed_size),
            "att": mlp_init(ka, (3 * self.embed_size,) + tuple(self.attention_units)),
            "gru": gru_init(kg, self.embed_size, self.embed_size),
            "fc": mlp_init(kf, (2 * self.embed_size,) + tuple(self.fc_units)),
        }

    def apply(self, params: dict, batch) -> jnp.ndarray:
        hist, target = batch[0], batch[1]  # batch may carry neg_hist as [2]
        gather = gather_matmul_bwd if self.matmul_gather_bwd else gather_rows
        hist_e = gather(params["item"], hist)  # [B, L, D]
        target_e = gather(params["item"], target)  # [B, D]
        w = din_attention_weights(params["att"], hist_e, target_e)  # [B, L]
        if self.use_augru:
            interest = augru(params["gru"], hist_e, w)
        else:
            interest = gru(params["gru"], hist_e * w[..., None])
        x = jnp.concatenate([interest, target_e], axis=-1)
        return mlp(params["fc"], x)[:, 0]

    def apply_full(self, params: dict, batch) -> jnp.ndarray:
        """Forward over right-padded histories with explicit valid lengths.

        Exact reference serving semantics (model/dien.py:57-68 on the full
        unpadded history): attention softmax masked to the true positions,
        and the GRU's hidden state read at step ``length - 1`` -- with
        RIGHT-padding those first ``length`` steps process exactly the true
        sequence, so the state equals the reference's final hidden state.
        """
        hist, target, length = batch
        hist_e = gather_rows(params["item"], hist)
        target_e = gather_rows(params["item"], target)
        mask = jnp.arange(hist.shape[1])[None, :] < length[:, None]
        w = din_attention_weights(params["att"], hist_e, target_e, mask)
        if self.use_augru:
            states = augru(params["gru"], hist_e, w, return_sequence=True)
        else:
            states = gru(
                params["gru"], hist_e * w[..., None], return_sequence=True
            )  # [B, L, H]
        idx = jnp.clip(length - 1, 0, hist.shape[1] - 1)
        interest = jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]
        x = jnp.concatenate([interest, target_e], axis=-1)
        return mlp(params["fc"], x)[:, 0]

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        if ctx.full_histories is not None:
            return catalog_scores_full_history(
                self.apply_full, params, ctx.full_histories, self.num_items
            )
        assert ctx.history is not None, "DIEN serving needs ctx.history"
        return catalog_scores_from_history(
            self.apply, params, ctx.history, self.num_items, tile=8
        )

    def auxiliary_loss(
        self, params: dict, hist: jnp.ndarray, neg_hist: jnp.ndarray
    ) -> jnp.ndarray:
        """DIEN paper's auxiliary loss (extension -- absent in the reference,
        SURVEY.md #13): per step t, the interest state h_t should score the
        user's actual next behavior e_{t+1} above a sampled negative.

        L_aux = -mean[ log sigmoid(<h_t, e_{t+1}>) + log sigmoid(-<h_t, n_{t+1}>) ]

        hist / neg_hist: [B, L] item ids (neg_hist = sampled non-clicked items).
        """
        hist_e = gather_rows(params["item"], hist)  # [B, L, D]
        neg_e = gather_rows(params["item"], neg_hist)  # [B, L, D]
        states = gru(params["gru"], hist_e, return_sequence=True)  # [B, L, H]
        h_t = states[:, :-1, :]  # predicts step t+1
        pos = jnp.sum(h_t * hist_e[:, 1:, :], axis=-1)
        neg = jnp.sum(h_t * neg_e[:, 1:, :], axis=-1)
        return -jnp.mean(
            jax.nn.log_sigmoid(pos) + jax.nn.log_sigmoid(-neg)
        )
