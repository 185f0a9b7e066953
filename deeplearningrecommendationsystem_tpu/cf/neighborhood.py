"""Classic neighborhood collaborative filtering, fully vectorized.

Capability parity with the reference's standalone scripts:

* UserCF (UserCF_Final.py): binary implicit matrix from ``ua.base``;
  user-user cosine similarity; prediction = similarity-weighted neighbor
  ratings over the top-k neighbors with the similarity sum in the
  denominator counted for EVERY neighbor (rated or not,
  UserCF_Final.py:30-42); top-n recommendations over unrated items; global
  Recall/Precision/F1 vs ``ua.test`` (UserCF_Final.py:67-93).
* ItemCF (ItemCF_Final.py): same pipeline with item-item cosine similarity
  and per-item neighbor aggregation (ItemCF_Final.py:24-39) -- the
  reference's own header notes its Python loop is slow; here it is two
  matmuls + a gather.

Cosine similarity = normalized Gram matrix (one MXU matmul); the per-user /
per-item Python loops collapse to batched gathers and einsums.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def load_base_test(
    dataset_path: str, fold: str = "ua"
) -> Tuple[np.ndarray, list]:
    """Load u?.base / u?.test -> (binary [U, I] matrix, per-user test id lists).

    Ids are 0-based internally; matrix covers the full 943 x 1682 grid.
    """
    base = np.loadtxt(os.path.join(dataset_path, f"{fold}.base"), dtype=np.int64)
    test = np.loadtxt(os.path.join(dataset_path, f"{fold}.test"), dtype=np.int64)
    num_users, num_items = 943, 1682
    m = np.zeros((num_users, num_items), dtype=np.float32)
    m[base[:, 0] - 1, base[:, 1] - 1] = 1.0
    per_user = [[] for _ in range(num_users)]
    for u, i in zip(test[:, 0] - 1, test[:, 1] - 1):
        per_user[int(u)].append(int(i))
    return m, per_user


def _cosine(m: jnp.ndarray) -> jnp.ndarray:
    norms = jnp.sqrt(jnp.sum(m * m, axis=1, keepdims=True))
    normed = m / jnp.maximum(norms, 1e-12)
    return normed @ normed.T


@partial(jax.jit, static_argnames=("k_neighbors", "top_n"))
def user_cf_recommend(
    matrix: jnp.ndarray, k_neighbors: int = 10, top_n: int = 20
) -> jnp.ndarray:
    """Top-n unrated item ids per user ([U, top_n])."""
    sim = _cosine(matrix)  # [U, U]
    sim = sim.at[jnp.diag_indices(sim.shape[0])].set(NEG_INF)  # exclude self
    w, idx = jax.lax.top_k(sim, k_neighbors)  # [U, k]
    neighbor_ratings = matrix[idx]  # [U, k, I]
    pred = jnp.einsum("uk,uki->ui", w, neighbor_ratings)
    denom = jnp.sum(w, axis=1, keepdims=True)  # every neighbor counts
    pred = jnp.where(denom != 0, pred / jnp.where(denom != 0, denom, 1.0), 0.0)
    pred = jnp.where(matrix > 0, NEG_INF, pred)  # unrated items only
    _, rec = jax.lax.top_k(pred, top_n)
    return rec


@partial(jax.jit, static_argnames=("k_neighbors", "top_n"))
def item_cf_recommend(
    matrix: jnp.ndarray, k_neighbors: int = 10, top_n: int = 20
) -> jnp.ndarray:
    """Top-n unrated item ids per user via item-item similarity ([U, top_n])."""
    sim = _cosine(matrix.T)  # [I, I]
    sim = sim.at[jnp.diag_indices(sim.shape[0])].set(NEG_INF)
    w, idx = jax.lax.top_k(sim, k_neighbors)  # [I, k] neighbors per item
    # pred[u, i] = sum_k w[i,k] * matrix[u, idx[i,k]] / sum_k w[i,k]
    gathered = matrix[:, idx]  # [U, I, k]
    pred = jnp.einsum("ik,uik->ui", w, gathered)
    denom = jnp.sum(w, axis=1)  # [I]
    pred = jnp.where(denom != 0, pred / jnp.where(denom != 0, denom, 1.0), 0.0)
    pred = jnp.where(matrix > 0, NEG_INF, pred)
    _, rec = jax.lax.top_k(pred, top_n)
    return rec


def cf_eval(rec: np.ndarray, test_lists: list) -> Tuple[float, float, float]:
    """Global Recall / Precision / F1 averaged over users.

    Matches the reference's accumulation (UserCF_Final.py:67-93): recall
    contributes 0 for users with no test items; precision divides by the
    recommendation-list length; both average over ALL users.
    """
    num_users = rec.shape[0]
    recall = precision = 0.0
    for u in range(num_users):
        same = len(set(rec[u].tolist()) & set(test_lists[u]))
        if test_lists[u]:
            recall += same / len(test_lists[u])
        precision += same / rec.shape[1]
    recall /= num_users
    precision /= num_users
    f1 = 2 * recall * precision / (recall + precision) if recall + precision else 0.0
    return recall, precision, f1
