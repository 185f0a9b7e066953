"""Model protocol + batched full-catalog scoring helpers.

A model here is a tiny dataclass with

* ``init(key) -> params``  (a pytree of jnp arrays)
* ``apply(params, batch) -> logits`` (pre-sigmoid scores; the trainer applies
  ``sigmoid`` / BCE-with-logits, which is mathematically identical to the
  reference's sigmoid-output + ``BCELoss`` but numerically stable)
* ``score_catalog(params, ctx) -> [U, I] logits`` -- the serving path.

The reference serves by looping over users in Python and re-running forward
on a catalog-sized batch per user (e.g. model/widedeep.py:68-78,
model/din.py:55-66) -- the #1 wall-clock hotspot (SURVEY.md §3.5). Here the
catalog scorer is a ``lax.map`` over fixed-size user tiles, each tile one
batched forward, compiled once; seen-item filtering happens later by masking
scores to -inf before top-k (equivalent list semantics, SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ServingContext:
    """Device-resident feature blocks needed to score the full catalog."""

    user_features: jnp.ndarray  # [U, 24] = [age, gender(2), occupation(21)]
    item_features: jnp.ndarray  # [I, 19] genre flags
    history: Optional[jnp.ndarray] = None  # [U, L] behavior histories (DIN/DIEN)
    rating_matrix: Optional[jnp.ndarray] = None  # [U, I] (AutoRec)
    # per-user COMPLETE variable-length histories (host-side ragged arrays);
    # when set, DIN/DIEN serve with the reference's full-history semantics
    # (model/din.py:55-66) via catalog_scores_full_history
    full_histories: Optional[Any] = None

    @property
    def num_users(self) -> int:
        return self.user_features.shape[0]

    @property
    def num_items(self) -> int:
        return self.item_features.shape[0]


def _pad_users(num_users: int, tile: int) -> int:
    return ((num_users + tile - 1) // tile) * tile


def catalog_scores_from_features(
    apply_fn: Callable, params, ctx: ServingContext, tile: int = 64
) -> jnp.ndarray:
    """[U, I] logits for a feature-vector model.

    Builds the [tile * I, 45] feature matrix on device per user tile (user id,
    item id, user block, item block broadcast together) and maps the model
    over tiles -- no host loop, no 286 MB all-pairs materialization.
    """
    U, I = ctx.num_users, ctx.num_items
    U_pad = _pad_users(U, tile)
    user_ids = jnp.arange(U_pad, dtype=jnp.int32) % U  # pad rows re-score user 0..
    uf = ctx.user_features[user_ids]  # [U_pad, 24]
    item_block = jnp.concatenate(
        [jnp.arange(I, dtype=jnp.float32)[:, None], ctx.item_features], axis=1
    )  # [I, 20]

    def tile_fn(args):
        ids_t, uf_t = args  # [T], [T, 24]
        T = ids_t.shape[0]
        u_col = jnp.broadcast_to(ids_t.astype(jnp.float32)[:, None, None], (T, I, 1))
        u_feat = jnp.broadcast_to(uf_t[:, None, :], (T, I, uf_t.shape[1]))
        i_blk = jnp.broadcast_to(item_block[None, :, :], (T, I, item_block.shape[1]))
        x = jnp.concatenate([u_col, i_blk[..., :1], u_feat, i_blk[..., 1:]], axis=-1)
        return apply_fn(params, x.reshape(T * I, -1)).reshape(T, I)

    n_tiles = U_pad // tile
    scores = jax.lax.map(
        tile_fn,
        (user_ids.reshape(n_tiles, tile), uf.reshape(n_tiles, tile, -1)),
    )
    return scores.reshape(U_pad, I)[:U]


def catalog_scores_from_pairs(
    apply_fn: Callable, params, num_users: int, num_items: int, tile: int = 64
) -> jnp.ndarray:
    """[U, I] logits for an id-pair model (NeuralCF-style)."""
    U_pad = _pad_users(num_users, tile)
    user_ids = jnp.arange(U_pad, dtype=jnp.int32) % num_users
    items = jnp.arange(num_items, dtype=jnp.int32)

    def tile_fn(ids_t):
        T = ids_t.shape[0]
        u = jnp.repeat(ids_t, num_items)
        i = jnp.tile(items, T)
        return apply_fn(params, (u, i)).reshape(T, num_items)

    scores = jax.lax.map(tile_fn, user_ids.reshape(-1, tile))
    return scores.reshape(U_pad, num_items)[:num_users]


def catalog_scores_full_history(
    apply_len_fn: Callable,
    params,
    histories,
    num_items: int,
    buckets: tuple = (32, 64, 128, 256, 512, 1024),
    elem_budget: int = 32 * 1024 * 1024,
    embed_fn: Optional[Callable] = None,
    apply_embedded_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """[U, I] logits scoring each user's COMPLETE variable-length history.

    The reference serves DIN/DIEN with every user's full unpadded history
    (model/din.py:55-66: per user, repeat the whole history num_items times
    and forward a [num_items, L_u, D] batch). Static-shape TPU equivalent:
    users are grouped into length buckets, right-padded to the bucket length
    with an explicit valid-length mask, and each bucket is scored as tiled
    [users x item-chunks] batched forwards. Masked attention over the true
    positions is mathematically identical to the reference's exact-length
    softmax (and for DIEN the GRU state is read at step L_u - 1, before any
    pad step), so the produced top-K lists match the reference's semantics
    exactly -- proven against a naive per-user oracle in
    tests/test_full_history.py.

    ``apply_len_fn(params, (hist [B, Lb], target [B], length [B])) -> [B]``.
    ``histories``: sequence of per-user 1-D id arrays (variable length).
    ``elem_budget`` caps the [B, Lb, D]-shaped activation tile size.

    Embed-once fast path (r5): the per-item-chunk forward re-gathers each
    user's IDENTICAL history embedding for every chunk -- at bucket lengths
    up to 1024 that repeated [B, Lb] gather dominates (the same slow in-scan
    gather emitter the training probes measured). When both ``embed_fn``
    ``(params, hist_ids [T, Lb]) -> [T, Lb, D]`` and ``apply_embedded_fn``
    ``(params, (hist_e [B, Lb, D], target [B], length [B])) -> [B]`` are
    given, each user tile's history is embedded ONCE and broadcast across
    item chunks (a free XLA broadcast of exactly the rows the gather would
    have produced -- bit-identical scores, tests/test_full_history.py).
    """
    import numpy as np  # host-side bucketing only

    U = len(histories)
    lengths = np.array([max(len(h), 1) for h in histories], dtype=np.int64)
    maxlen = int(lengths.max())
    bucket_list = [b for b in buckets if b < maxlen]
    top = next((b for b in buckets if b >= maxlen), None)
    bucket_list.append(top if top is not None else maxlen)

    scores = np.zeros((U, num_items), dtype=np.float32)
    items = jnp.arange(num_items, dtype=jnp.int32)
    lo = 0
    for Lb in bucket_list:
        sel = np.where((lengths > lo) & (lengths <= Lb))[0]
        lo = Lb
        if sel.size == 0:
            continue
        # user/item tile sizes under the activation budget (D is absorbed
        # into the budget as a constant factor; Lb is the driver)
        chunk = min(num_items, 256)
        tile = max(1, min(64, elem_budget // (chunk * Lb * 64)))
        n_pad = ((sel.size + tile - 1) // tile) * tile
        hist_b = np.zeros((n_pad, Lb), dtype=np.int32)  # right-pad with 0
        len_b = np.ones((n_pad,), dtype=np.int32)
        for j, u in enumerate(sel):
            h = np.asarray(histories[u], dtype=np.int32)
            hist_b[j, : len(h)] = h
            len_b[j] = max(len(h), 1)
        i_pad = ((num_items + chunk - 1) // chunk) * chunk
        targets = jnp.concatenate(
            [items, jnp.zeros((i_pad - num_items,), jnp.int32)]
        ).reshape(-1, chunk)

        embed_once = embed_fn is not None and apply_embedded_fn is not None

        def tile_fn(args, _Lb=Lb, _chunk=chunk):
            hist_t, len_t = args  # [T, Lb], [T]
            T = hist_t.shape[0]
            he_t = embed_fn(params, hist_t) if embed_once else None  # [T, Lb, D]

            def item_chunk(tgt):  # [chunk]
                t = jnp.tile(tgt, T)
                l = jnp.repeat(len_t, _chunk)
                if embed_once:
                    he = jnp.broadcast_to(
                        he_t[:, None, :, :], (T, _chunk, _Lb, he_t.shape[-1])
                    ).reshape(-1, _Lb, he_t.shape[-1])
                    return apply_embedded_fn(params, (he, t, l)).reshape(T, _chunk)
                h = jnp.broadcast_to(
                    hist_t[:, None, :], (T, _chunk, _Lb)
                ).reshape(-1, _Lb)
                return apply_len_fn(params, (h, t, l)).reshape(T, _chunk)

            out = jax.lax.map(item_chunk, targets)  # [nC, T, chunk]
            return jnp.moveaxis(out, 0, 1).reshape(T, -1)

        hist_j = jnp.asarray(hist_b).reshape(-1, tile, Lb)
        len_j = jnp.asarray(len_b).reshape(-1, tile)
        out = jax.lax.map(tile_fn, (hist_j, len_j))  # [nT, tile, i_pad]
        scores[sel] = np.asarray(
            out.reshape(n_pad, -1)[: sel.size, :num_items]
        )
    return jnp.asarray(scores)


def catalog_scores_from_history(
    apply_fn: Callable, params, history: jnp.ndarray, num_items: int, tile: int = 16
) -> jnp.ndarray:
    """[U, I] logits for a behavior-sequence model (DIN/DIEN).

    Each user's history is broadcast across the catalog: the reference repeats
    it num_items times per user in a Python loop (model/din.py:55-66); here a
    tile of users is scored in one [T * I, L] batched forward.
    """
    U, L = history.shape
    U_pad = _pad_users(U, tile)
    hist = jnp.concatenate([history, history[: U_pad - U]], axis=0) if U_pad > U else history
    targets = jnp.arange(num_items, dtype=jnp.int32)

    def tile_fn(hist_t):
        T = hist_t.shape[0]
        h = jnp.broadcast_to(hist_t[:, None, :], (T, num_items, L)).reshape(-1, L)
        t = jnp.tile(targets, T)
        return apply_fn(params, (h, t)).reshape(T, num_items)

    scores = jax.lax.map(tile_fn, hist.reshape(-1, tile, L))
    return scores.reshape(U_pad, num_items)[:U]
