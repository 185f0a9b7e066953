"""DeepFM: FM (linear + sum-square second order) wide path + deep tower.

Capability parity with reference model/deepfm.py:8-94: six embedded fields
(user, item, age-through-table, gender, occupation, genre); FM cross term via
the sum-square identity; deep tower over the 6*D concat; final Linear(2,1)
over [FM, deep].
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
from deeplearningrecommendationsystem_tpu.ops.interactions import fm_cross_term
from deeplearningrecommendationsystem_tpu.ops.linear import (
    linear,
    linear_init,
    mlp_init,
    relu_stack,
)

FIELDS = ("user", "item", "age", "gender", "occupation", "genre")


@dataclasses.dataclass
class DeepFM:
    spec: FeatureSpec = ML100K_SPEC
    hidden_units: Tuple[int, ...] = (512, 256, 128, 1)
    embedding_dim: int = 128
    robust_init: bool = False  # see models/widedeep.py: revive-at-init for the
    # ReLU-terminated deep tower (parity mode keeps the faithful fragile init)
    f32_fm: bool = True  # keep the FM sum-square term in f32 under bf16 compute

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 5)
        deep = mlp_init(ks[2], self.hidden_units)
        if self.robust_init:
            deep[-1]["b"] = jnp.full_like(deep[-1]["b"], 0.1)
        return {
            "tables": init_field_tables(ks[0], self.spec, self.embedding_dim, FIELDS),
            "deep_in": linear_init(ks[1], 6 * self.embedding_dim, self.hidden_units[0]),
            "deep": deep,
            "fm_linear": linear_part_init(ks[3], self.spec),
            "out": linear_init(ks[4], 2, 1),
        }

    def _embed(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        e = embed_fields(params["tables"], x, self.spec)
        return jnp.stack([e[f] for f in FIELDS], axis=1)  # [B, 6, D]

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        fields = self._embed(params, x)
        deep = relu_stack(
            params["deep"],
            linear(params["deep_in"], fields.reshape(fields.shape[0], -1)),
        )
        # selective precision: the FM sum-square identity cancels large terms
        # and loses signal in bf16 (BF16_QUALITY.json); keep it in f32 -- it
        # is O(B*F*D) elementwise, the MXU-bound deep tower stays in the
        # compute dtype.
        fm_fields = fields.astype(jnp.float32) if self.f32_fm else fields
        fm = (
            linear_part(params["fm_linear"], x, self.spec).astype(fm_fields.dtype)
            + fm_cross_term(fm_fields)[:, None]
        )
        out = jnp.concatenate([fm.astype(deep.dtype), deep], axis=-1)
        return linear(params["out"], out)[:, 0]

    # serving catalog scorer runs with one-hot-matmul gathers (measured
    # winner, 1.46x -- serving.onehot_serving_scope / ONEHOT_SERVING_PROBE)
    onehot_serving = True

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return catalog_scores_from_features(self.apply, params, ctx)

    # -- sparse/production protocol (train/sparse_trainer.py) ---------------
    # The four vocab-height tables (field embeddings + LR biases) train with
    # row-sparse optimizers; the small field tables (age/gender/occupation/
    # genre) and the MLP stay dense.
    sparse_tables = {
        "user": ("tables", "user"),
        "item": ("tables", "item"),
        "user_bias": ("fm_linear", "user_bias"),
        "item_bias": ("fm_linear", "item_bias"),
    }

    def table_ids(self, x: jnp.ndarray) -> dict:
        u = x[:, self.spec.user_col].astype(jnp.int32)
        i = x[:, self.spec.item_col].astype(jnp.int32)
        return {"user": u, "item": i, "user_bias": u, "item_bias": i}

    def apply_rows(self, dense: dict, rows: dict, x: jnp.ndarray) -> jnp.ndarray:
        # dense == params minus the four sparse tables (embed_fields embeds
        # only the fields still present; user/item come in as gathered rows)
        e = embed_fields(dense["tables"], x, self.spec)
        e["user"], e["item"] = rows["user"], rows["item"]
        fields = jnp.stack([e[f] for f in FIELDS], axis=1)  # [B, 6, D]
        deep = relu_stack(
            dense["deep"],
            linear(dense["deep_in"], fields.reshape(fields.shape[0], -1)),
        )
        wide = (
            rows["user_bias"]
            + rows["item_bias"]
            + linear(dense["fm_linear"]["wide"], self.spec.dense(x))
        )
        fm = wide + fm_cross_term(fields)[:, None]
        return linear(dense["out"], jnp.concatenate([fm, deep], axis=-1))[:, 0]
