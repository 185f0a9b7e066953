"""Behavior-sequence attention (DIN activation unit) and AFM attention.

The DIN activation unit scores each history item against the target item with
an MLP over [hist, hist - target, target] and softmax-normalizes over the
history axis (reference model/din.py:14-20,39-44). Here it is a single
batched computation: [B, L, 3D] -> MLP -> [B, L] -> softmax -> weights.

Parity note: the reference does NOT mask left-padding (item id 0 is a real
item and participates in attention, scripts/din.py:20-31); ``mask`` is an
optional extension for the non-parity path.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from deeplearningrecommendationsystem_tpu.ops.linear import mlp


def din_attention_weights(
    att_mlp: List[dict],
    hist_embed: jnp.ndarray,  # [B, L, D]
    target_embed: jnp.ndarray,  # [B, D]
    mask: Optional[jnp.ndarray] = None,  # [B, L] bool, True = valid
) -> jnp.ndarray:
    """Softmax attention weights [B, L] from the activation-unit MLP.

    The first layer over concat([h, h - t, t]) is algebraically decomposed:
    splitting W1 into its three D-row blocks,
        concat @ W1 = h @ (W1_a + W1_b) + t @ (W1_c - W1_b),
    so the [B, L, 3D] concat tensor is never materialized and the target term
    is one [B, D] matmul broadcast over L (same identity as the Pallas
    kernel, ops/pallas/din_attention.py). Numerically identical to the
    literal concat formulation.
    """
    D = hist_embed.shape[-1]
    w1, b1 = att_mlp[0]["w"], att_mlp[0].get("b")
    assert w1.shape[0] == 3 * D, "attention layer 1 must take [h, h-t, t]"
    wh = w1[:D] + w1[D : 2 * D]
    wt = w1[2 * D :] - w1[D : 2 * D]
    x1 = hist_embed @ wh + (target_embed @ wt)[:, None, :]
    if b1 is not None:
        x1 = x1 + b1
    scores = mlp(att_mlp[1:], jax.nn.relu(x1))[..., 0]  # [B, L]
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    return jax.nn.softmax(scores, axis=-1)


def attention_pool(
    att_mlp: List[dict],
    hist_embed: jnp.ndarray,
    target_embed: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DIN pooled user interest: weighted sum over history -> [B, D]."""
    w = din_attention_weights(att_mlp, hist_embed, target_embed, mask)
    return jnp.einsum("bl,bld->bd", w, hist_embed)


def afm_attention(
    w: jnp.ndarray,  # [D, A]
    b: jnp.ndarray,  # [A]
    h: jnp.ndarray,  # [A, 1]
    cross: jnp.ndarray,  # [B, P, D] pairwise products
) -> jnp.ndarray:
    """AFM attention-weighted sum of pair products -> [B, D].

    relu(cross @ W + b) @ h, softmax over pairs, weighted sum
    (reference model/afm.py:63-65).
    """
    scores = jax.nn.relu(cross @ w + b) @ h  # [B, P, 1]
    weights = jax.nn.softmax(scores, axis=1)
    return jnp.sum(weights * cross, axis=1)
