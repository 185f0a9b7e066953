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
from deeplearningrecommendationsystem_tpu.parallel.ep import gather_rows


@dataclasses.dataclass
class MatrixFactorization:
    num_users: int
    num_items: int
    embedding_dim: int = 64
    # r5 layout-probe winner (MF_LAYOUT_PROBE.json): compute the epoch in
    # the [D, B] orientation with one-hot matmul gathers -- ``table.T @
    # onehot.T`` rides XLA's fused compare->dot stream instead of the slow
    # native in-scan gather emitter (the r4 trace's 12x-off-bandwidth
    # victim), and the factor-product reduce runs along SUBLANES with B
    # lanes. 1.47x end-to-end (172.7M ex/s), final loss bit-identical over
    # 100 epochs at the bench configuration. OPT-IN (bench.py enables it for
    # the mf preset): the default keeps the gather path so EP bit-equality
    # tests and the recorded PARITY artifacts stay exactly reproducible.
    # Auto-disabled under EP routing (sharded tables need the collective
    # gather) and at vocabs > 8192 (O(B*V) one-hot FLOPs lose).
    onehot_epoch: bool = False

    def init(self, key: jax.Array) -> dict:
        ku, ki = jax.random.split(key)
        return {
            "user": embedding_init(ku, self.num_users, self.embedding_dim),
            "item": embedding_init(ki, self.num_items, self.embedding_dim),
        }

    def _use_onehot(self, params: dict) -> bool:
        if not self.onehot_epoch or max(self.num_users, self.num_items) > 8192:
            return False
        from deeplearningrecommendationsystem_tpu.parallel.ep import (
            active_partitioning,
        )

        cfg = active_partitioning()
        return not (
            cfg is not None
            and (cfg.routes(params["user"]) or cfg.routes(params["item"]))
        )

    def apply(self, params: dict, batch) -> jnp.ndarray:
        users, items = batch
        if self._use_onehot(params):
            pu, qi = params["user"], params["item"]
            dt = pu.dtype
            oh_u = (
                users[:, None]
                == jax.lax.broadcasted_iota(users.dtype, (1, self.num_users), 1)
            ).astype(dt)
            oh_i = (
                items[:, None]
                == jax.lax.broadcasted_iota(items.dtype, (1, self.num_items), 1)
            ).astype(dt)
            pe = pu.T @ oh_u.T  # [D, B]
            qe = qi.T @ oh_i.T
            return jnp.sum(pe * qe, axis=0)
        return jnp.sum(
            gather_rows(params["user"], users) * gather_rows(params["item"], items),
            axis=-1,
        )

    def fast_fit(self, params: dict, batch, y: jnp.ndarray, epochs: int,
                 learning_rate: float, weight_decay: float = 0.0,
                 compute_dtype: str = "bfloat16", interpret: bool = False):
        """Full-batch Adam training via the whole-RUN fused kernel
        (ops/pallas/mf_epoch.py): gathers, loss, one-hot backward and the
        torch-Adam update for ALL epochs in ONE pallas_call. Same semantics
        as Trainer.fit with the given compute_dtype (f32 variant
        oracle-tested); returns (params, losses[epochs])."""
        from deeplearningrecommendationsystem_tpu.ops.pallas.mf_epoch import (
            mf_fullbatch_train,
        )

        users, items = batch
        pu, pi, losses = mf_fullbatch_train(
            users, items, y, params["user"], params["item"], epochs,
            learning_rate, weight_decay, compute_dtype, interpret=interpret,
        )
        return {"user": pu, "item": pi}, losses

    def score_catalog(self, params: dict, ctx: ServingContext) -> jnp.ndarray:
        return params["user"] @ params["item"].T

    def serving_factors(self, params: dict, ctx: ServingContext):
        """(P, Q) with scores == P @ Q^T -- feeds the fused Pallas
        score+mask+top-k serving kernel (ops/pallas/serving_topk.py) without
        materializing the [U, I] score matrix."""
        return params["user"], params["item"]

    # -- sparse/production protocol (train/sparse_trainer.py) ---------------
    # Row-sparse optimizers differentiate w.r.t. the GATHERED rows so a
    # minibatch step never materializes a full-vocab gradient (the reference's
    # dense Adam regime reads/writes whole tables every step, scripts/mf.py:66).
    sparse_tables = {"user": ("user",), "item": ("item",)}

    def table_ids(self, batch) -> dict:
        users, items = batch
        return {"user": users, "item": items}

    def apply_rows(self, dense: dict, rows: dict, batch) -> jnp.ndarray:
        return jnp.sum(rows["user"] * rows["item"], axis=-1)
