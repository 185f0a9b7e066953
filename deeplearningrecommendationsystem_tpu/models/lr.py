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
    # one-hot-matmul backward for the two bias-table gathers (the epoch's
    # only scatters; see ops/embedding.gather_matmul_bwd). Single-chip path.
    matmul_gather_bwd: bool = False
    # full-batch fast path: ``apply`` expects ``widen(x)`` batches -- the id
    # one-hots PREBUILT once outside the epoch scan, so fwd/bwd are three
    # slice-matmuls with zero per-epoch one-hot construction or scatters.
    # Mathematically identical to the gather formulation (onehot @ table ==
    # table[ids]; the f32 dot adds exact zeros), params/Adam state unchanged.
    wide_input: bool = False

    def init(self, key: jax.Array) -> dict:
        return linear_part_init(key, self.spec)

    def widen(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, 45] reference layout -> [B, U + I + dense] with id one-hots."""
        u = jax.nn.one_hot(x[:, self.spec.user_col].astype(jnp.int32),
                           self.spec.num_users, dtype=x.dtype)
        i = jax.nn.one_hot(x[:, self.spec.item_col].astype(jnp.int32),
                           self.spec.num_items, dtype=x.dtype)
        return jnp.concatenate([u, i, self.spec.dense(x)], axis=1)

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        if self.wide_input:
            U, I = self.spec.num_users, self.spec.num_items
            from deeplearningrecommendationsystem_tpu.ops.linear import linear

            return (
                x[:, :U] @ params["user_bias"]
                + x[:, U : U + I] @ params["item_bias"]
                + linear(params["wide"], x[:, U + I :])
            )[:, 0]
        gather = None
        if self.matmul_gather_bwd:
            from deeplearningrecommendationsystem_tpu.ops.embedding import (
                gather_matmul_bwd,
            )

            gather = gather_matmul_bwd
        return linear_part(params, x, self.spec, gather=gather)[:, 0]

    def fast_fit(self, params: dict, x: jnp.ndarray, y: jnp.ndarray,
                 epochs: int, learning_rate: float, interpret: bool = False,
                 mode: str = "compact"):
        """Full-batch Adam training via a fused Pallas kernel. Exact trainer
        semantics (same loss, same Adam, pre-update loss history); the LR
        parameters are one weight vector over [user one-hot, item one-hot,
        dense, 1], so flatten/unflatten is a reshape. Returns
        (params, losses[epochs]).

        ``mode="wide"``: one Pallas call per epoch streaming the
        materialized [B, F] one-hot design matrix (~742 MB/epoch at
        ml-100k). ``mode="compact"`` (default): the whole multi-epoch run
        is ONE pallas_call that streams only ids + the dense block
        (~36 MB/epoch) and rebuilds one-hot contributions in-VMEM -- same
        math, the one-hot never touches HBM."""
        U, I = self.spec.num_users, self.spec.num_items
        D = self.spec.dense_width
        B = x.shape[0]
        if mode == "compact":
            from deeplearningrecommendationsystem_tpu.ops.pallas.lr_epoch import (
                _round_up,
                lr_fullbatch_train_compact,
            )

            u_pad, i_pad = _round_up(U, 128), _round_up(I, 128)
            d_pad = _round_up(D + 1, 128)
            uid = x[:, self.spec.user_col].astype(jnp.int32)
            iid = x[:, self.spec.item_col].astype(jnp.int32)
            dense_aug = jnp.concatenate(
                [
                    self.spec.dense(x).astype(jnp.float32),
                    jnp.ones((B, 1), jnp.float32),
                    jnp.zeros((B, d_pad - D - 1), jnp.float32),
                ],
                axis=1,
            )
            seg = lambda a, p: jnp.pad(a, (0, p - a.shape[0]))  # noqa: E731
            w0 = jnp.concatenate([
                seg(params["user_bias"][:, 0], u_pad),
                seg(params["item_bias"][:, 0], i_pad),
                seg(
                    jnp.concatenate(
                        [params["wide"]["w"][:, 0], params["wide"]["b"]]
                    ),
                    d_pad,
                ),
            ]).reshape(1, u_pad + i_pad + d_pad)
            w, losses = lr_fullbatch_train_compact(
                uid, iid, dense_aug, y, w0, epochs, learning_rate,
                u_pad=u_pad, i_pad=i_pad, interpret=interpret,
            )
            w = w[0]
            out = {
                "user_bias": w[:U].reshape(U, 1),
                "item_bias": w[u_pad : u_pad + I].reshape(I, 1),
                "wide": {
                    "w": w[u_pad + i_pad : u_pad + i_pad + D].reshape(D, 1),
                    "b": w[u_pad + i_pad + D : u_pad + i_pad + D + 1],
                },
            }
            return out, losses
        from deeplearningrecommendationsystem_tpu.ops.pallas.lr_epoch import (
            lr_fullbatch_train,
        )

        xw = self.widen(x)
        x_aug = jnp.concatenate([xw, jnp.ones((B, 1), xw.dtype)], axis=1)
        F = U + I + D + 1
        F_pad = -(-F // 128) * 128
        if F_pad != F:
            x_aug = jnp.pad(x_aug, ((0, 0), (0, F_pad - F)))
        w0 = jnp.concatenate([
            params["user_bias"][:, 0], params["item_bias"][:, 0],
            params["wide"]["w"][:, 0], params["wide"]["b"],
            jnp.zeros((F_pad - F,), jnp.float32),
        ]).reshape(F_pad, 1)
        w, losses = lr_fullbatch_train(
            x_aug, y, w0, epochs, learning_rate, interpret=interpret
        )
        w = w[:, 0]
        out = {
            "user_bias": w[:U].reshape(U, 1),
            "item_bias": w[U : U + I].reshape(I, 1),
            "wide": {"w": w[U + I : U + I + D].reshape(D, 1),
                     "b": w[U + I + D : U + I + D + 1]},
        }
        return out, losses

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        fn = (
            (lambda p, b: self.apply(p, self.widen(b)))
            if self.wide_input
            else self.apply
        )
        return catalog_scores_from_features(fn, params, ctx)

    def serving_factors(self, params: dict, ctx: ServingContext):
        """LR's pair score is rank-1 separable: score(u, i) = u_part[u] +
        i_part[i] (bias tables + the wide linear split into its user-feature
        and genre column blocks), so serving is ``[u_part, 1] @ [1, i_part]^T``
        -- one fused Pallas top-k pass, no [U, I] materialization."""
        w, b = params["wide"]["w"][:, 0], params["wide"]["b"][0]
        n_user_cols = ctx.user_features.shape[1]  # age + gender + occupation
        u_part = (
            params["user_bias"][:, 0]
            + ctx.user_features @ w[:n_user_cols]
            + b
        )
        i_part = params["item_bias"][:, 0] + ctx.item_features @ w[n_user_cols:]
        ones_u = jnp.ones_like(u_part)
        ones_i = jnp.ones_like(i_part)
        return jnp.stack([u_part, ones_u], 1), jnp.stack([ones_i, i_part], 1)
