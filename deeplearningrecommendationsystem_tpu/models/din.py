"""DIN: target-aware attention pooling over behavior history.

Capability parity with reference model/din.py:9-66: shared item embedding;
activation-unit MLP over [hist, hist - target, target] -> softmax over the
history axis -> weighted-sum user vector; concat with the target embedding
into the final MLP. Parity mode does not mask the left zero-padding (the
reference pads with item id 0, scripts/din.py:20-31); ``mask_padding=True``
enables the corrected masked-attention variant.
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
from deeplearningrecommendationsystem_tpu.ops.attention import attention_pool
from deeplearningrecommendationsystem_tpu.ops.linear import embedding_init, mlp, mlp_init
from deeplearningrecommendationsystem_tpu.ops.embedding import gather_matmul_bwd
from deeplearningrecommendationsystem_tpu.parallel.ep import gather_rows


@dataclasses.dataclass
class DIN:
    num_items: int
    embed_size: int = 64
    attention_units: Tuple[int, ...] = (128, 64, 1)
    fc_units: Tuple[int, ...] = (256, 128, 1)
    mask_padding: bool = False
    # serve with the fused Pallas attention kernel (forward-only; training
    # keeps the differentiable XLA path)
    pallas_serving: bool = False
    # backward of the item-table gathers as a one-hot MXU matmul instead of
    # TPU's serialized scatter-add (ops/embedding.py::gather_matmul_bwd);
    # right for small vocabs, single-chip (bypasses EP routing)
    matmul_gather_bwd: bool = False
    # fused Pallas training head (attention unit + softmax + pool + fc MLP in
    # one kernel with custom VJP; ops/pallas/din_head.py) -- one HBM read of
    # [B, L, D] per pass instead of ~5. Parity-mode (unmasked) only.
    fused_head: bool = False
    # ONE [B, L+1] item-table gather for history+target instead of two
    # separate gathers: one gather kernel forward, one combined one-hot
    # matmul (or scatter) cotangent backward. Same math; summation grouping
    # of the table gradient differs at ulp level, so the bit-exact parity
    # default keeps two gathers. Measured 0.96x on v5e (DIN_8M_PROBE.json):
    # [B, 11] tiles worse than [B, 10] + [B]; kept for other shapes.
    fused_gather: bool = False
    # Training batch as (hist_unique [U, L], user_idx [B], target [B]):
    # exploits that the reference's full-batch epoch repeats each user's
    # identical history row ~B/U times (scripts/din.py:55-63 builds hist by
    # user lookup). The history embedding is gathered ONCE per user
    # ([U, L, D]) and per-example rows come from a [B]-gather of [L*D]-wide
    # user rows, so the gather backward shrinks from a [B*L, vocab] one-hot
    # matmul to [B, U] + [U*L, vocab] -- ~45% fewer cotangent FLOPs and
    # L*D = 640 is lane-aligned. Same math (ulp-level grouping difference).
    indirect_hist: bool = False

    def init(self, key: jax.Array) -> dict:
        ke, ka, kf = jax.random.split(key, 3)
        return {
            "item": embedding_init(ke, self.num_items, self.embed_size),
            "att": mlp_init(ka, (3 * self.embed_size,) + tuple(self.attention_units)),
            "fc": mlp_init(kf, (2 * self.embed_size,) + tuple(self.fc_units)),
        }

    def _apply(self, params: dict, batch, use_pallas: bool) -> jnp.ndarray:
        gather = gather_matmul_bwd if self.matmul_gather_bwd else gather_rows
        if self.indirect_hist and len(batch) == 3:
            hist_u, uidx, target = batch  # [U, L], [B], [B]
            U, L = hist_u.shape
            uh = gather(params["item"], hist_u)  # [U, L, D] -- once per user
            hist_e = gather_rows(uh.reshape(U, L * uh.shape[-1]), uidx).reshape(
                uidx.shape[0], L, uh.shape[-1]
            )
            target_e = gather(params["item"], target)
            hist = hist_u[uidx]  # only used by mask_padding below
        elif self.fused_gather:
            # one [B, L+1] gather for history + target: one gather kernel
            # forward, ONE combined cotangent (one-hot matmul / scatter)
            # backward instead of two
            hist, target = batch
            ids = jnp.concatenate([hist, target[:, None]], axis=1)
            e = gather(params["item"], ids)  # [B, L+1, D]
            hist_e, target_e = e[:, :-1], e[:, -1]
        else:
            hist, target = batch  # [B, L] int, [B] int
            hist_e = gather(params["item"], hist)  # [B, L, D]
            target_e = gather(params["item"], target)  # [B, D]
        mask = None
        if self.mask_padding:
            # valid = positions after the leading zero-pad run; item 0 can
            # legitimately appear inside a history, so mask only the pad
            # prefix (cummax flips to 1 at the first nonzero).
            nonzero = (hist != 0).astype(jnp.int32)
            mask = jax.lax.cummax(nonzero, axis=1) > 0
        if self.fused_head and mask is None:
            from deeplearningrecommendationsystem_tpu.ops.pallas.din_head import (
                din_head_fused,
            )

            return din_head_fused(params["att"], params["fc"], hist_e, target_e)
        if use_pallas and mask is None:
            from deeplearningrecommendationsystem_tpu.ops.pallas import (
                din_attention_pool_pallas,
            )

            pooled = din_attention_pool_pallas(hist_e, target_e, params["att"])
        else:
            pooled = attention_pool(params["att"], hist_e, target_e, mask)
        x = jnp.concatenate([pooled, target_e], axis=-1)
        return mlp(params["fc"], x)[:, 0]

    def apply(self, params: dict, batch) -> jnp.ndarray:
        return self._apply(params, batch, use_pallas=False)

    def apply_full(self, params: dict, batch) -> jnp.ndarray:
        """Forward over right-padded histories with explicit valid lengths.

        Masked softmax over the first ``length`` positions is exactly the
        reference's softmax over the unpadded history (model/din.py:39-47):
        pad positions get weight 0 in both the normalizer and the pooled sum.
        """
        hist, target, length = batch  # [B, L], [B], [B]
        hist_e = gather_rows(params["item"], hist)
        return self.apply_full_embedded(params, (hist_e, target, length))

    def apply_full_embedded(self, params: dict, batch) -> jnp.ndarray:
        """``apply_full`` from pre-gathered history embeddings -- the
        embed-once serving fast path (models/base.py r5): the bucketed
        scorer embeds each user's history ONCE per tile instead of once per
        item chunk. Bit-identical scores."""
        hist_e, target, length = batch  # [B, L, D], [B], [B]
        target_e = gather_rows(params["item"], target)
        mask = jnp.arange(hist_e.shape[1])[None, :] < length[:, None]
        pooled = attention_pool(params["att"], hist_e, target_e, mask)
        x = jnp.concatenate([pooled, target_e], axis=-1)
        return mlp(params["fc"], x)[:, 0]

    # hist-window catalog scorer runs with one-hot-matmul gathers (measured
    # winner, 2.64x); the full-history scorer is excluded by
    # serving.onehot_serving_scope's ctx check (0.83x there) and uses the
    # embed-once path instead
    onehot_serving = True

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        if ctx.full_histories is not None:
            # reference semantics: each user's complete variable-length
            # history (model/din.py:55-66), bucketed for static shapes
            return catalog_scores_full_history(
                self.apply_full, params, ctx.full_histories, self.num_items,
                embed_fn=lambda p, h: gather_rows(p["item"], h),
                apply_embedded_fn=self.apply_full_embedded,
            )
        assert ctx.history is not None, "DIN serving needs ctx.history"
        fn = (
            (lambda p, b: self._apply(p, b, use_pallas=True))
            if self.pallas_serving
            else self.apply
        )
        return catalog_scores_from_history(fn, params, ctx.history, self.num_items)
