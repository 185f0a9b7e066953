"""Sharded serving: full-catalog top-k with the item table row-sharded (EP).

The reference serves by scoring a replicated full catalog per user
(model/mf.py:28-35). At the vocab scales the sparse trainer already handles
(16.7M rows, SCALE_CTR_BENCH.json) a replicated item table is exactly what
does not fit on one chip -- so serving must run on the same row-sharded
layout training produced, without an unshard round-trip.

Algorithm (one shard_map over the model axis):

* each model shard owns a contiguous item-row block ``[I_pad/m, D]`` of the
  (vocab-padded) item factor table and the matching ``seen`` column block;
* it scores its block with ONE local matmul ``P @ Q_local.T`` (users
  replicated -- user factors are small per request batch), masks seen items
  and vocab-pad columns to -inf, and takes a LOCAL ``lax.top_k``;
* local winner indices are shifted to global item ids, and the tiny
  ``[U, m*k]`` candidate set (values + ids) leaves the shard_map as a
  candidate-axis concatenation (out_specs ``P(None, 'model')``) over ICI;
* the final ``top_k`` over the candidates equals the dense list EXACTLY:
  the global top-k is contained in the union of per-block top-ks, and the
  candidate concatenation order (block-major, rank-minor) preserves
  ``lax.top_k``'s lowest-index tie rule because block order == id order.

Proven list-identical to the dense path on the 8-device CPU mesh
(tests/test_sharded_serving.py) and executed by ``dryrun_multichip``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeplearningrecommendationsystem_tpu.parallel.embedding import sharded_gather
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS

NEG_INF = jnp.float32(-1e30)  # matches serving.py's dense mask value


def _local_topk(Q_l, Pu, seen_l, *, k: int, shard_rows: int, num_items: int):
    """Per model-shard inside shard_map: local [U, k] candidates.

    The shard's winners leave via out_specs P(None, 'model') -- a device-order
    (= item-id-order) concatenation along the candidate axis, i.e. the tiny
    [U, m*k] exchange rides ICI as the shard_map output collective.
    """
    shard = jax.lax.axis_index(MODEL_AXIS)
    base = shard * shard_rows
    scores = Pu @ Q_l.T  # [U, shard_rows] -- ONE local MXU matmul
    gid = base + jnp.arange(shard_rows, dtype=jnp.int32)
    invalid = gid >= num_items  # vocab-pad columns
    if seen_l is not None:
        invalid = invalid[None, :] | seen_l.astype(bool)
    scores = jnp.where(invalid, NEG_INF, scores.astype(jnp.float32))
    v, li = jax.lax.top_k(scores, k)  # local winners
    return v, li.astype(jnp.int32) + base


def sharded_topk(
    Pu: jnp.ndarray,
    Q: jnp.ndarray,
    mesh: Mesh,
    num_items: int,
    k: int,
    seen: Optional[jnp.ndarray] = None,
):
    """Exact top-k of ``P @ Q[:num_items].T`` with ``Q`` row-sharded.

    ``Pu``: [U, D] replicated user factors (a request batch). ``Q``: [I_pad, D]
    sharded P('model', None), I_pad a multiple of the model-axis size (rows
    >= num_items are vocab padding and never win). ``seen``: optional [U, I_pad]
    (pad columns' values ignored); True = exclude. Returns (values [U, k],
    item ids [U, k]), both replicated, bit-equal to the dense
    mask+``lax.top_k`` path including tie order.
    """
    m = mesh.shape[MODEL_AXIS]
    I_pad = Q.shape[0]
    assert I_pad % m == 0, f"padded vocab {I_pad} not divisible by model axis {m}"
    shard_rows = I_pad // m
    assert k <= shard_rows, (
        f"k={k} exceeds items per shard ({shard_rows}); the union-of-local-top-k "
        f"argument needs k <= I_pad/m"
    )
    if seen is None:
        vals, ids = jax.shard_map(
            partial(_local_topk, seen_l=None, k=k, shard_rows=shard_rows,
                    num_items=num_items),
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P()),
            out_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS)),
        )(Q, Pu)
    else:
        if seen.shape[1] != I_pad:
            seen = jnp.concatenate(
                [seen, jnp.zeros((seen.shape[0], I_pad - seen.shape[1]), seen.dtype)],
                axis=1,
            )
        seen = jax.device_put(seen, NamedSharding(mesh, P(None, MODEL_AXIS)))
        vals, ids = jax.shard_map(
            partial(_local_topk, k=k, shard_rows=shard_rows, num_items=num_items),
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P(), P(None, MODEL_AXIS)),
            out_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS)),
        )(Q, Pu, seen)
    # final selection over the [U, m*k] candidates: block-major concat order
    # preserves lax.top_k's lowest-index tie rule (block order == id order)
    fv, pos = jax.lax.top_k(vals, k)
    return fv, jnp.take_along_axis(ids, pos, axis=1)


def _get_path(tree, path):
    for key in path:
        tree = tree[key]
    return tree


def _set_path(tree, path, value):
    """Functionally replace ``tree[path]`` (nested dicts) with ``value``."""
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set_path(tree[path[0]], path[1:], value)}


def sharded_feature_topk(
    model,
    params,
    ctx,
    mesh: Mesh,
    k: int,
    seen: Optional[jnp.ndarray] = None,
    users: Optional[jnp.ndarray] = None,
    user_tile: int = 64,
):
    """Exact top-k for a joint-MLP FEATURE model with item tables row-sharded.

    The factored path (:func:`sharded_topk`) needs ``scores == P @ Q^T``; a
    DeepFM/WideDeep-style model scores each (user, item) pair through a joint
    MLP, so the item shards must run the full forward on their item block
    (VERDICT r4 next #4). Table-substitution trick -- no model changes:

    * the model's ``sparse_tables`` protocol (train/sparse_trainer.py) names
      every user-vocab and item-vocab table path in ``params``;
    * user-vocab tables are collapsed OUTSIDE the shard_map to the request
      batch's rows (the same ``sharded_gather`` collective training uses) and
      the feature matrix's user-id column is re-indexed to the request batch
      -- ids feed only table lookups (features.py::FeatureSpec.split), so the
      gathered values, and hence every activation, are unchanged;
    * item-vocab tables enter the shard_map with in_specs P('model', None):
      each shard sees its LOCAL contiguous row block, and the item-id column
      counts 0..rows_per_shard-1 -- the model's own unmodified ``apply``
      scores the block with per-row arithmetic identical to the dense path;
    * per-shard local top-k winners shift to global ids and leave as the
      same [U, m*k] block-major candidate exchange as :func:`sharded_topk`,
      preserving ``lax.top_k``'s lowest-index tie order.

    Item-table rows (and the matching item-feature/seen columns) never leave
    their shards; per-query traffic is the [U, m*k] candidate exchange plus
    the request batch's user rows. List-identical to the dense
    :class:`serving.Recommender` on the 8-device CPU mesh
    (tests/test_sharded_serving.py).
    """
    m = mesh.shape[MODEL_AXIS]
    table_paths = dict(model.sparse_tables)
    user_paths = {n: p for n, p in table_paths.items() if "user" in n}
    item_paths = {n: p for n, p in table_paths.items() if "item" in n}
    assert user_paths and item_paths, (
        "sharded_feature_topk needs sparse_tables naming user_* and item_* "
        f"vocab tables; got {sorted(table_paths)}"
    )
    num_items = ctx.num_items
    I_pad = _get_path(params, next(iter(item_paths.values()))).shape[0]
    for p in item_paths.values():
        assert _get_path(params, p).shape[0] == I_pad, "item table heights differ"
    assert I_pad % m == 0, (
        f"item vocab {I_pad} not divisible by model axis {m}; shard with "
        "shard_model_tables first"
    )
    shard_rows = I_pad // m
    assert k <= shard_rows, f"k={k} exceeds items per shard ({shard_rows})"

    ids = (
        jnp.asarray(users, dtype=jnp.int32)
        if users is not None
        else jnp.arange(ctx.num_users, dtype=jnp.int32)
    )
    U_req = ids.shape[0]

    # collapse each user-vocab table to the request batch's rows (replicated)
    sub = params
    for path in user_paths.values():
        tab = _get_path(params, path)
        if tab.shape[0] % m == 0:
            rows = sharded_gather(tab, ids, mesh)
        else:  # replicated (never sharded: height not divisible)
            rows = tab[ids]
        sub = _set_path(sub, path, rows)

    # per-leaf specs: item-vocab tables stay sharded, everything else
    # (MLP weights, small field tables, the substituted user rows) replicates
    item_leaf_ids = {id(_get_path(sub, p)) for p in item_paths.values()}
    specs = jax.tree.map(
        lambda leaf: P(MODEL_AXIS, None) if id(leaf) in item_leaf_ids else P(),
        sub,
    )

    # replicated per-user features for the request batch, tiled for lax.map
    U_pad = ((U_req + user_tile - 1) // user_tile) * user_tile
    uidx = jnp.arange(U_pad, dtype=jnp.int32) % U_req  # wrap pad rows
    uf = ctx.user_features[ids][uidx]  # [U_pad, 24]

    # item-side blocks, vocab-padded to the sharded table height
    item_feat = ctx.item_features
    if item_feat.shape[0] != I_pad:
        item_feat = jnp.concatenate(
            [
                item_feat,
                jnp.zeros((I_pad - item_feat.shape[0], item_feat.shape[1]),
                          item_feat.dtype),
            ]
        )
    if seen is not None:
        seen = jnp.asarray(seen)
        if users is not None:
            seen = seen[ids]
        if seen.shape[1] != I_pad:
            seen = jnp.concatenate(
                [seen, jnp.zeros((seen.shape[0], I_pad - seen.shape[1]),
                                 seen.dtype)],
                axis=1,
            )
        seen = jax.device_put(seen, NamedSharding(mesh, P(None, MODEL_AXIS)))

    def local_topk(params_l, uf_t, item_feat_l, seen_l):
        shard = jax.lax.axis_index(MODEL_AXIS)
        base = shard * shard_rows
        R = shard_rows
        # local item block of the feature matrix: [R, 20] = [local id, genre]
        i_blk = jnp.concatenate(
            [jnp.arange(R, dtype=jnp.float32)[:, None], item_feat_l], axis=1
        )

        def tile_fn(args):
            idx_t, uf_tt = args  # [T] local request indices, [T, 24]
            T = idx_t.shape[0]
            u_col = jnp.broadcast_to(
                idx_t.astype(jnp.float32)[:, None, None], (T, R, 1)
            )
            u_feat = jnp.broadcast_to(uf_tt[:, None, :], (T, R, uf_tt.shape[1]))
            blk = jnp.broadcast_to(i_blk[None, :, :], (T, R, i_blk.shape[1]))
            x = jnp.concatenate(
                [u_col, blk[..., :1], u_feat, blk[..., 1:]], axis=-1
            )
            return model.apply(params_l, x.reshape(T * R, -1)).reshape(T, R)

        n_tiles = U_pad // user_tile
        scores = jax.lax.map(
            tile_fn,
            (uidx.reshape(n_tiles, user_tile),
             uf_t.reshape(n_tiles, user_tile, -1)),
        ).reshape(U_pad, R)[:U_req]
        gid = base + jnp.arange(R, dtype=jnp.int32)
        invalid = (gid >= num_items)[None, :]
        if seen_l is not None:
            invalid = invalid | seen_l.astype(bool)
        scores = jnp.where(invalid, NEG_INF, scores.astype(jnp.float32))
        v, li = jax.lax.top_k(scores, k)
        return v, li.astype(jnp.int32) + base

    if seen is None:
        fn = jax.shard_map(
            partial(local_topk, seen_l=None),
            mesh=mesh,
            in_specs=(specs, P(), P(MODEL_AXIS, None)),
            out_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS)),
        )
        vals, gids = fn(sub, uf, item_feat)
    else:
        fn = jax.shard_map(
            local_topk,
            mesh=mesh,
            in_specs=(specs, P(), P(MODEL_AXIS, None), P(None, MODEL_AXIS)),
            out_specs=(P(None, MODEL_AXIS), P(None, MODEL_AXIS)),
        )
        vals, gids = fn(sub, uf, item_feat, seen)
    fv, pos = jax.lax.top_k(vals, k)
    return fv, jnp.take_along_axis(gids, pos, axis=1)


def sharded_catalog_topk(
    model,
    params,
    ctx,
    mesh: Mesh,
    k: int,
    seen: Optional[jnp.ndarray] = None,
    users: Optional[jnp.ndarray] = None,
):
    """Top-k recommendations from EP-SHARDED params, no unshard round-trip.

    ``params`` as left by training with ``unshard=False`` (vocab-padded
    tables sharded P('model', None)). Routing:

    * models exposing ``serving_factors`` (scores == P @ Q^T: MF, AutoRec
      shapes) -- the one-matmul-per-shard :func:`sharded_topk` path;
    * joint-MLP FEATURE models exposing the ``sparse_tables`` protocol plus
      a ``spec`` (DeepFM shapes) -- :func:`sharded_feature_topk`, each shard
      runs the full forward on its item block;
    * anything else (sequence models whose HISTORY gathers span the whole
      item table, e.g. DIN/DIEN) raises: serve those by unsharding
      (parallel/ep.py::unshard_model_tables) -- their per-user history
      context makes item-local scoring a different algorithm (documented
      constraint, docs/performance.md Scaling).

    User rows for the requested ``users`` (default: all) are assembled with
    the same ``sharded_gather`` collective training uses; item rows never
    leave their shards.
    """
    if not hasattr(model, "serving_factors"):
        if hasattr(model, "sparse_tables") and hasattr(model, "spec"):
            return sharded_feature_topk(
                model, params, ctx, mesh, k, seen=seen, users=users
            )
        raise NotImplementedError(
            f"{type(model).__name__}: sharded serving needs serving_factors "
            "(factored scores) or the sparse_tables+spec feature protocol; "
            "sequence models (DIN/DIEN) must unshard for serving "
            "(parallel/ep.py::unshard_model_tables)"
        )
    Pf, Qf = model.serving_factors(params, ctx)
    num_items = ctx.num_items
    ids = (
        jnp.asarray(users, dtype=jnp.int32)
        if users is not None
        else jnp.arange(ctx.num_users, dtype=jnp.int32)
    )
    if mesh.shape[MODEL_AXIS] > 1 and Pf.shape[0] != ctx.num_users:
        # user table is sharded+padded too: gather the request batch's rows
        P_req = sharded_gather(Pf, ids, mesh)
    else:
        P_req = Pf[ids]
    if seen is not None:
        seen = jnp.asarray(seen)[ids]
    return sharded_topk(P_req, Qf, mesh, num_items, k, seen=seen)
