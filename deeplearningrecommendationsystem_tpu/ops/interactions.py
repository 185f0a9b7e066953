"""Feature-interaction ops (FM / NFM / AFM / PNN building blocks).

All operate on a stacked field tensor ``e`` of shape [B, F, D] (F embedded
fields of dimension D) and are pure jnp -- XLA fuses them into the surrounding
matmuls. The O(F^2) double loops of the reference (e.g. model/nfm.py:58-62,
model/afm.py:56-60) become batched einsums/identities.
"""

from __future__ import annotations

import jax.numpy as jnp


def fm_cross_term(e: jnp.ndarray) -> jnp.ndarray:
    """Scalar FM second-order term per row: sum_{i<j} <e_i, e_j>.

    Uses the sum-square identity 0.5 * sum_d[(sum_i e_id)^2 - sum_i e_id^2]
    (the reference uses the same identity, model/deepfm.py:71-77).
    Input [B, F, D] -> output [B].
    """
    s = jnp.sum(e, axis=1)  # [B, D]
    sq = jnp.sum(e * e, axis=1)  # [B, D]
    return 0.5 * jnp.sum(s * s - sq, axis=-1)


def bi_interaction(e: jnp.ndarray) -> jnp.ndarray:
    """Vector bi-interaction pooling: sum_{i<j} e_i * e_j (elementwise).

    NFM's cross layer (model/nfm.py:58-62). Input [B, F, D] -> [B, D].
    """
    s = jnp.sum(e, axis=1)
    sq = jnp.sum(e * e, axis=1)
    return 0.5 * (s * s - sq)


def _pair_indices(num_fields: int):
    idx_i, idx_j = jnp.triu_indices(num_fields, k=1)
    return idx_i, idx_j


def pairwise_products(e: jnp.ndarray) -> jnp.ndarray:
    """All F*(F-1)/2 elementwise pair products, stacked.

    AFM's cross-product layer (model/afm.py:56-60). [B, F, D] -> [B, P, D]
    with pairs ordered (0,1),(0,2),...,(F-2,F-1), matching the reference's
    double loop order.
    """
    idx_i, idx_j = _pair_indices(e.shape[1])
    return e[:, idx_i, :] * e[:, idx_j, :]


def pairwise_inner_products(e: jnp.ndarray) -> jnp.ndarray:
    """All pairwise inner products <e_i, e_j>, i<j. [B, F, D] -> [B, P].

    PNN's inner-product layer (model/pnn.py:59-66).
    """
    gram = jnp.einsum("bfd,bgd->bfg", e, e)
    idx_i, idx_j = _pair_indices(e.shape[1])
    return gram[:, idx_i, idx_j]
