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
    tables sharded P('model', None)). The model must expose
    ``serving_factors`` (scores == P @ Q^T; models/mf.py). User factors for
    the requested ``users`` (default: all) are assembled with the same
    ``sharded_gather`` collective training uses; item factors never leave
    their shards.
    """
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
