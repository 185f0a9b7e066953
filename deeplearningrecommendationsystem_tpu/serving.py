"""User-facing serving API: train once, recommend top-K for any users.

The reference's serving surface is ``model.recommendation(...)`` returning a
full ranked id matrix per script run (SURVEY.md §3.5). This wraps the
framework's batched catalog scorers into a persistent object: score once (or
per refresh), then answer per-user top-K queries instantly, with optional
seen-item exclusion and orbax checkpoint loading.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.eval.recommend import mask_seen
from deeplearningrecommendationsystem_tpu.models.base import ServingContext

def onehot_serving_scope(model, ctx: ServingContext):
    """Context manager applying the measured one-hot-gather serving policy
    while a catalog scorer TRACES (shared by Recommender.refresh and
    tools/bench_serving.py so the bench measures the shipped path).

    Winners declare ``onehot_serving = True`` on the model class
    (ONEHOT_SERVING_PROBE.json: DeepFM 1.46x, DIN hist-window 2.64x -- the
    scorers run under lax.map, where the native gather emitter is the same
    layout victim the training probes found). NeuralCF (0.88x) keeps the
    native path, and so does the full-history scorer regardless of model
    (0.83x: bucket lengths up to 1024 multiply the O(N*V) one-hot FLOPs --
    it uses the embed-once path instead, models/base.py)."""
    import contextlib

    from deeplearningrecommendationsystem_tpu.parallel.ep import onehot_gather_fwd

    if getattr(model, "onehot_serving", False) and ctx.full_histories is None:
        return onehot_gather_fwd()
    return contextlib.nullcontext()


class Recommender:
    """Holds a trained model + params and serves top-K recommendations."""

    def __init__(
        self,
        model,
        params,
        ctx: ServingContext,
        seen: Optional[np.ndarray] = None,  # [U, I] bool: items to exclude
        use_pallas=True,  # True = measured-winner policy; "fused" = force
        # the fully-fused Pallas top-k kernel; False = plain lax.top_k
    ):
        self.model = model
        self.params = params
        self.ctx = ctx
        self.seen = jnp.asarray(seen) if seen is not None else None
        self.use_pallas = use_pallas
        self._scores: Optional[jax.Array] = None

    @classmethod
    def from_checkpoint(cls, model, checkpoint_dir: str, ctx: ServingContext, seen=None):
        from deeplearningrecommendationsystem_tpu.runtime.checkpoint import (
            CheckpointManager,
        )

        template = model.init(jax.random.PRNGKey(0))
        mgr = CheckpointManager(checkpoint_dir)
        state = mgr.restore(template={"params": template})
        mgr.close()
        return cls(model, state["params"], ctx, seen)

    def refresh(self) -> None:
        """(Re)score the full catalog -- call after a params update."""
        with onehot_serving_scope(self.model, self.ctx):
            scores = self.model.score_catalog(self.params, self.ctx)
        if self.seen is not None:
            scores = mask_seen(scores, self.seen)
        self._scores = scores

    @property
    def scores(self) -> jax.Array:
        if self._scores is None:
            self.refresh()
        return self._scores

    @property
    def shape(self):
        """(num_users, num_items) -- the server's bounds, no materialization."""
        return (self.ctx.num_users, self.ctx.num_items)

    def top_k_with_scores(self, k: int, users: Optional[Sequence[int]] = None):
        """(ids [n, k], scores [n, k]) -- the HTTP server's query surface,
        shared with ShardedRecommender (which has no replicated score
        matrix to index)."""
        idx = self.top_k(k, users)
        rows = np.asarray(self.scores)
        if users is not None:
            rows = rows[np.asarray(users)]
        return idx, np.take_along_axis(rows, idx, axis=1)

    def top_k(self, k: int, users: Optional[Sequence[int]] = None) -> np.ndarray:
        """[len(users), k] recommended item ids (all users by default).

        Default policy = the measured winner per catalog size for factored
        models (KERNEL_BENCH.json, settled best-of-5 on an idle host,
        tools/settle_topk.py): the fully fused Pallas score+mask+top-k kernel
        (ops/pallas/serving_topk.py::topk_serve_matmul, 1.12x XLA at ml-100k
        [943 x 1682], every repeat ahead of every XLA repeat) at catalogs
        <= 8192, the two-stage group-max algorithm (topk_two_stage, 3.5x at
        [2048 x 131072]) above. Non-factored models (scores precomputed by
        ``score_catalog``) use plain ``lax.top_k``. ``use_pallas="fused"``
        forces the fused kernel at every shape; ``use_pallas=False`` forces
        plain XLA. All paths produce identical lists (tie order included).
        """
        on_tpu = jax.default_backend() == "tpu" and k <= 128
        factored = hasattr(self.model, "serving_factors")
        if self.use_pallas and on_tpu and factored:
            P, Q = self.model.serving_factors(self.params, self.ctx)
            seen = self.seen
            if seen is None:
                seen = jnp.zeros((P.shape[0], Q.shape[0]), jnp.int8)
            if users is not None:
                u = jnp.asarray(users)
                P, seen = P[u], seen[u]
            if Q.shape[0] > 8192 and self.use_pallas != "fused":
                from deeplearningrecommendationsystem_tpu.ops.pallas import (
                    topk_two_stage,
                )

                _, idx = topk_two_stage(P, Q, seen, k=k)
            else:
                from deeplearningrecommendationsystem_tpu.ops.pallas import (
                    topk_serve_matmul,
                )

                _, idx = topk_serve_matmul(P, Q, seen, k=k)
            return np.asarray(idx)
        if self.use_pallas == "fused" and on_tpu:
            from deeplearningrecommendationsystem_tpu.ops.pallas import (
                topk_scores_pallas,
            )

            s = self.scores  # seen already masked at refresh
            if users is not None:
                s = s[jnp.asarray(users)]
            _, idx = topk_scores_pallas(s, jnp.zeros(s.shape, jnp.int8), k=k)
            return np.asarray(idx)
        s = self.scores
        if users is not None:
            s = s[jnp.asarray(users)]
        _, idx = jax.lax.top_k(s, k)
        return np.asarray(idx)

    def score(self, user: int, items: Sequence[int]) -> np.ndarray:
        """Raw scores of specific items for one user."""
        return np.asarray(self.scores[user, jnp.asarray(items)])


class ShardedRecommender:
    """Serves top-K directly from EP-SHARDED params (parallel/serving.py).

    For tables trained with ``unshard=False`` / ``unshard_params=False`` at
    vocabs where a replicated table does not fit on one chip: item factors
    never leave their shards; each query is a per-shard local top-k plus a
    tiny [U, m*k] candidate exchange, list-identical to :class:`Recommender`
    on the equivalent dense params (tests/test_sharded_serving.py). Requires
    the model to expose ``serving_factors`` (scores == P @ Q^T).
    """

    def __init__(self, model, params, ctx: ServingContext, mesh, seen=None,
                 strategy: str = "psum"):
        from deeplearningrecommendationsystem_tpu.parallel.ep import (
            EmbeddingPartitioning,
            _is_table_path,
        )
        from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS

        self.model = model
        self.params = params
        self.ctx = ctx
        self.mesh = mesh
        self.seen = jnp.asarray(seen) if seen is not None else None
        # EP routing config for per-pair scoring (/v1/score): collect the
        # padded heights of the row-sharded vocab tables so gather_rows
        # recognises them (same identification as training, parallel/ep.py)
        m = mesh.shape[MODEL_AXIS]
        heights = set()

        def visit(path, leaf):
            if (
                hasattr(leaf, "ndim")
                and leaf.ndim == 2
                and _is_table_path(path)
                and leaf.shape[0] % m == 0
            ):
                heights.add(leaf.shape[0])
            return leaf

        jax.tree_util.tree_map_with_path(visit, params)
        self._ep = EmbeddingPartitioning(
            mesh=mesh, strategy=strategy, sharded_heights=frozenset(heights)
        )

    @property
    def shape(self):
        return (self.ctx.num_users, self.ctx.num_items)

    def refresh(self) -> None:
        """No-op: queries run directly against the sharded tables (there is
        no replicated score matrix to materialize -- that's the point)."""

    def top_k(self, k: int, users: Optional[Sequence[int]] = None) -> np.ndarray:
        return self.top_k_with_scores(k, users)[0]

    def top_k_with_scores(self, k: int, users: Optional[Sequence[int]] = None):
        from deeplearningrecommendationsystem_tpu.parallel.serving import (
            sharded_catalog_topk,
        )

        u = jnp.asarray(users) if users is not None else None
        vals, idx = sharded_catalog_topk(
            self.model, self.params, self.ctx, self.mesh, k,
            seen=self.seen, users=u,
        )
        return np.asarray(idx), np.asarray(vals)

    def score(self, user: int, items: Sequence[int]) -> np.ndarray:
        """Scores of specific items for one user, from sharded tables: the
        model's own forward with every vocab-table gather EP-routed through
        the training collectives (parallel/ep.py::gather_rows). Seen items
        return the same mask value the dense server does (Recommender.score
        reads the mask_seen'd matrix), so /v1/score answers match between
        the dense and sharded daemons."""
        from deeplearningrecommendationsystem_tpu.eval.recommend import (
            mask_seen,
        )
        from deeplearningrecommendationsystem_tpu.parallel.ep import (
            embedding_partitioning,
        )

        items = jnp.asarray(items, dtype=jnp.int32)
        u = jnp.full(items.shape, user, dtype=jnp.int32)
        with embedding_partitioning(self._ep):
            if hasattr(self.model, "spec"):  # feature family: 45-col rows
                n = items.shape[0]
                uf = self.ctx.user_features
                x = jnp.concatenate(
                    [
                        u.astype(jnp.float32)[:, None],
                        items.astype(jnp.float32)[:, None],
                        jnp.broadcast_to(uf[user][None, :], (n, uf.shape[1])),
                        self.ctx.item_features[items],
                    ],
                    axis=1,
                )
                logits = self.model.apply(self.params, x)
            else:  # pair family (MF/NeuralCF shapes)
                logits = self.model.apply(self.params, (u, items))
        if self.seen is not None:
            logits = mask_seen(logits, self.seen[user, items])
        return np.asarray(logits)
