"""Full-catalog recommendation: masked ranking on device.

The reference filters seen items out of recommendation lists with per-user
Python set logic (data/reader.py:136-159). Masking seen scores to -inf before
sorting yields the identical ordered list of unseen items (SURVEY.md §7) with
one fused op and static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def mask_seen(scores: jnp.ndarray, seen: jnp.ndarray) -> jnp.ndarray:
    """Push seen items to the bottom of the ranking. [U, I] -> [U, I]."""
    return jnp.where(seen, NEG_INF, scores)


def top_k_unseen(scores: jnp.ndarray, seen: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices [U, k] of the best unseen items per user."""
    _, idx = jax.lax.top_k(mask_seen(scores, seen), k)
    return idx


def full_ranking(scores: jnp.ndarray, seen: jnp.ndarray) -> jnp.ndarray:
    """Full descending item ranking [U, I] with seen items forced to the tail.

    Equivalent (over unseen items, which is all the evaluator reads) to the
    reference's sort-then-remove pipeline.
    """
    return jnp.argsort(-mask_seen(scores, seen), axis=1).astype(jnp.int32)


def score_ranking(scores: jnp.ndarray) -> jnp.ndarray:
    """Plain descending ranking [U, I] -- sort the catalog ONCE, then derive
    any number of per-split filtered lists with :func:`seen_to_tail`."""
    return jnp.argsort(-scores, axis=1).astype(jnp.int32)


def seen_to_tail(rec_full: jnp.ndarray, seen: jnp.ndarray) -> jnp.ndarray:
    """Move a split's seen items to the tail of a precomputed ranking.

    A stable partition on the boolean seen flag preserves the score order
    within each side -- exactly the reference's ``remove_itemid``
    (data/reader.py:136-159) applied to the already-sorted list, without
    re-sorting catalog scores per split (the float sort happens once in
    :func:`score_ranking`; this is a cheap boolean-key sort).
    """
    flags = jnp.take_along_axis(seen, rec_full, axis=1)
    order = jnp.argsort(flags, axis=1, stable=True)
    return jnp.take_along_axis(rec_full, order, axis=1)
