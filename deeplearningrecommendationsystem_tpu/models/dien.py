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
    # Training batch as (hist_unique [U, L], user_idx [B], target [B]) --
    # DIN's per-user history dedup (models/din.py::indirect_hist) ported to
    # DIEN (VERDICT r4 next #2): the reference's full-batch epoch repeats
    # each user's identical [L] history ~B/U times (scripts/dien.py builds
    # hist by user lookup exactly like scripts/din.py:55-63), so the history
    # embedding is gathered ONCE per user ([U, L, D]) and per-example rows
    # come from a [B]-gather of [L*D]-wide user rows. Same math; only the
    # table-gradient summation grouping differs (ulp-level). The indirect
    # batch is recognised by its 1-D third element (an aux-loss batch's
    # third element, neg_hist, is 2-D).
    indirect_hist: bool = False

    def init(self, key: jax.Array) -> dict:
        ke, ka, kg, kf, kv = jax.random.split(key, 5)
        params = {
            "item": embedding_init(ke, self.num_items, self.embed_size),
            "att": mlp_init(ka, (3 * self.embed_size,) + tuple(self.attention_units)),
            "gru": gru_init(kg, self.embed_size, self.embed_size),
            "fc": mlp_init(kf, (2 * self.embed_size,) + tuple(self.fc_units)),
        }
        if self.use_augru:
            # DIEN paper's two-layer structure: "gru" is the interest
            # EXTRACTOR over raw behavior embeddings (its states carry the
            # auxiliary loss), "gru_ev" the AUGRU interest-EVOLUTION layer.
            params["gru_ev"] = gru_init(kv, self.embed_size, self.embed_size)
        return params

    def _interest(self, params: dict, hist_e, w, return_states: bool = False):
        """Interest vector [B, H] from history embeddings + attention weights.

        use_augru (extension): extractor GRU over raw ``hist_e`` -> states
        [B, L, H]; AUGRU over the states with attention ``w``. The states are
        returned on request so the auxiliary loss shares the ONE extractor
        scan with the main forward (VERDICT r2 weak #5: the old design re-ran
        a full GRU inside auxiliary_loss, 9.3x the parity train time).
        Parity mode: one GRU over attention-scaled embeddings, exactly the
        reference's simplified DIEN (model/dien.py:47,61).
        """
        if self.use_augru:
            states = gru(params["gru"], hist_e, return_sequence=True)  # [B,L,H]
            interest = augru(params["gru_ev"], states, w)
            return (interest, states) if return_states else interest
        interest = gru(params["gru"], hist_e * w[..., None])
        return (interest, None) if return_states else interest

    def _embed_batch(self, params: dict, batch):
        """(hist_e [B, L, D], target_e [B, D], rest) resolving the optional
        indirect-hist batch layout (see ``indirect_hist``). ``rest`` carries
        any trailing elements (the aux loss's ``neg_hist``)."""
        gather = gather_matmul_bwd if self.matmul_gather_bwd else gather_rows
        if self.indirect_hist and len(batch) >= 3 and batch[2].ndim == 1:
            hist_u, uidx, target = batch[0], batch[1], batch[2]
            U, L = hist_u.shape
            uh = gather(params["item"], hist_u)  # [U, L, D] -- once per user
            hist_e = gather_rows(uh.reshape(U, L * uh.shape[-1]), uidx).reshape(
                uidx.shape[0], L, uh.shape[-1]
            )
            target_e = gather(params["item"], target)
            return hist_e, target_e, batch[3:]
        hist, target = batch[0], batch[1]  # batch may carry neg_hist as [2]
        hist_e = gather(params["item"], hist)  # [B, L, D]
        target_e = gather(params["item"], target)  # [B, D]
        return hist_e, target_e, batch[2:]

    def apply(self, params: dict, batch) -> jnp.ndarray:
        hist_e, target_e, _ = self._embed_batch(params, batch)
        w = din_attention_weights(params["att"], hist_e, target_e)  # [B, L]
        interest = self._interest(params, hist_e, w)
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
        return self.apply_full_embedded(params, (hist_e, target, length))

    def apply_full_embedded(self, params: dict, batch) -> jnp.ndarray:
        """``apply_full`` from pre-gathered history embeddings (embed-once
        serving fast path, models/base.py r5). Bit-identical scores."""
        hist_e, target, length = batch  # [B, L, D], [B], [B]
        target_e = gather_rows(params["item"], target)
        mask = jnp.arange(hist_e.shape[1])[None, :] < length[:, None]
        w = din_attention_weights(params["att"], hist_e, target_e, mask)
        if self.use_augru:
            # extractor over the true steps; padded positions beyond
            # ``length`` get attention 0 (masked softmax), so the AUGRU's
            # update gate is 0 there and the state is held constant.
            ex_states = gru(params["gru"], hist_e, return_sequence=True)
            states = augru(params["gru_ev"], ex_states, w, return_sequence=True)
        else:
            states = gru(
                params["gru"], hist_e * w[..., None], return_sequence=True
            )  # [B, L, H]
        idx = jnp.clip(length - 1, 0, hist_e.shape[1] - 1)
        interest = jnp.take_along_axis(states, idx[:, None, None], axis=1)[:, 0]
        x = jnp.concatenate([interest, target_e], axis=-1)
        return mlp(params["fc"], x)[:, 0]

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        if ctx.full_histories is not None:
            return catalog_scores_full_history(
                self.apply_full, params, ctx.full_histories, self.num_items,
                embed_fn=lambda p, h: gather_rows(p["item"], h),
                apply_embedded_fn=self.apply_full_embedded,
            )
        assert ctx.history is not None, "DIEN serving needs ctx.history"
        return catalog_scores_from_history(
            self.apply, params, ctx.history, self.num_items, tile=8
        )

    @staticmethod
    def _aux_from_states(states, hist_e, neg_e) -> jnp.ndarray:
        """DIEN paper's next-behavior auxiliary loss from extractor states:

        L_aux = -mean[ log sigmoid(<h_t, e_{t+1}>) + log sigmoid(-<h_t, n_{t+1}>) ]
        """
        h_t = states[:, :-1, :]  # predicts step t+1
        pos = jnp.sum(h_t * hist_e[:, 1:, :], axis=-1)
        neg = jnp.sum(h_t * neg_e[:, 1:, :], axis=-1)
        return -jnp.mean(jax.nn.log_sigmoid(pos) + jax.nn.log_sigmoid(-neg))

    def apply_with_aux(self, params: dict, batch):
        """Forward + auxiliary loss in ONE traced program sharing the single
        extractor-GRU scan (extension -- absent in the reference, SURVEY.md
        #13). ``batch`` = (hist, target, neg_hist); neg_hist = per-step
        sampled non-clicked items. Returns (logits [B], aux scalar).

        In parity mode (no AUGRU) the main GRU consumes attention-SCALED
        embeddings, so the aux states cannot be shared and one extra raw-input
        scan runs; with ``use_augru`` the extractor scan is shared outright.
        """
        hist_e, target_e, rest = self._embed_batch(params, batch)
        neg_hist = rest[0]  # indirect batch: (hist_u, uidx, target, neg_hist)
        w = din_attention_weights(params["att"], hist_e, target_e)  # [B, L]
        interest, states = self._interest(params, hist_e, w, return_states=True)
        if states is None:  # parity-shape main path: unshared extractor
            states = gru(params["gru"], hist_e, return_sequence=True)
        x = jnp.concatenate([interest, target_e], axis=-1)
        logits = mlp(params["fc"], x)[:, 0]
        neg_e = gather_rows(params["item"], neg_hist)  # [B, L, D]
        return logits, self._aux_from_states(states, hist_e, neg_e)

    def auxiliary_loss(
        self, params: dict, hist: jnp.ndarray, neg_hist: jnp.ndarray
    ) -> jnp.ndarray:
        """Standalone auxiliary loss (see ``apply_with_aux`` for the fused
        path the Trainer uses; this form re-runs the extractor scan and is
        kept for oracle tests / external callers).
        """
        hist_e = gather_rows(params["item"], hist)  # [B, L, D]
        neg_e = gather_rows(params["item"], neg_hist)  # [B, L, D]
        states = gru(params["gru"], hist_e, return_sequence=True)  # [B, L, H]
        return self._aux_from_states(states, hist_e, neg_e)
