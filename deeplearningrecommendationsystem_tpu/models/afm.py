"""AFM: attention-weighted pairwise interactions + LR part.

Capability parity with reference model/afm.py:6-83. Field set quirk kept:
age participates as the RAW scalar broadcast to embedding width (not through
a table, model/afm.py:54); attention parameters are N(0,1) like the
reference's ``torch.randn`` (model/afm.py:22-24).
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
from deeplearningrecommendationsystem_tpu.ops.attention import afm_attention
from deeplearningrecommendationsystem_tpu.ops.embedding import embed_fields, init_field_tables
from deeplearningrecommendationsystem_tpu.ops.interactions import pairwise_products
from deeplearningrecommendationsystem_tpu.ops.linear import linear, linear_init


@dataclasses.dataclass
class AFM:
    spec: FeatureSpec = ML100K_SPEC
    embedding_dim: int = 128
    attention_dim: int = 64
    # serve with the fused Pallas pairwise-attention kernel (forward-only;
    # 2x faster than the XLA path on v5e, tools/bench_kernels.py)
    pallas_serving: bool = False
    # TRAIN with the fused kernel too (custom VJP recomputing in VMEM,
    # ops/pallas/afm_attention.py::afm_attention_pool_fused): the [B, 15, D]
    # pair tensor never reaches HBM in either pass
    fused_attention: bool = False

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 6)
        return {
            "tables": init_field_tables(ks[0], self.spec, self.embedding_dim),
            "att_w": jax.random.normal(ks[1], (self.embedding_dim, self.attention_dim)),
            "att_b": jax.random.normal(ks[2], (self.attention_dim,)),
            "att_h": jax.random.normal(ks[3], (self.attention_dim, 1)),
            "att_out": linear_init(ks[4], self.embedding_dim, 1),
            "wide": linear_part_init(ks[5], self.spec),
        }

    def _apply(self, params: dict, x: jnp.ndarray, use_pallas: bool) -> jnp.ndarray:
        e = embed_fields(params["tables"], x, self.spec)
        age = x[:, self.spec.age_col : self.spec.age_col + 1]
        age_bcast = jnp.broadcast_to(age, (x.shape[0], self.embedding_dim))
        fields = jnp.stack(
            [e["user"], e["item"], age_bcast, e["gender"], e["occupation"], e["genre"]],
            axis=1,
        )
        if self.fused_attention:
            from deeplearningrecommendationsystem_tpu.ops.pallas.afm_attention import (
                afm_attention_pool_fused,
            )

            pooled = afm_attention_pool_fused(
                fields, params["att_w"], params["att_b"], params["att_h"]
            )
        elif use_pallas:
            from deeplearningrecommendationsystem_tpu.ops.pallas import (
                afm_attention_pool_pallas,
            )

            pooled = afm_attention_pool_pallas(
                fields, params["att_w"], params["att_b"], params["att_h"]
            )
        else:
            cross = pairwise_products(fields)  # [B, 15, D]
            pooled = afm_attention(
                params["att_w"], params["att_b"], params["att_h"], cross
            )
        cross_out = linear(params["att_out"], pooled)
        wide = linear_part(params["wide"], x, self.spec)
        return (wide + cross_out)[:, 0]

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        return self._apply(params, x, use_pallas=False)

    # serving catalog scorer runs with one-hot-matmul gathers (measured
    # winner, 1.09x -- serving.onehot_serving_scope / ONEHOT_SERVING_PROBE)
    onehot_serving = True

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        fn = (
            (lambda p, b: self._apply(p, b, use_pallas=True))
            if self.pallas_serving
            else self.apply
        )
        return catalog_scores_from_features(fn, params, ctx)
