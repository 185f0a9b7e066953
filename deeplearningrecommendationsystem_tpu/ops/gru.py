"""GRU / AUGRU over behavior sequences as a ``lax.scan``.

DIEN's interest-evolution layer is a plain GRU in the reference
(model/dien.py:47,61 -- no AUGRU, no auxiliary loss; SURVEY.md #13 notes the
simplification is the parity target). This module provides both:

* ``gru``  -- torch-equation GRU (gate order r, z, n; both input and hidden
  biases) so parity-mode DIEN matches the reference's dynamics,
* ``augru`` -- attention-update-gate GRU (the real DIEN paper's AUGRU) as an
  extension, selected by config.

The scan carries [B, H] hidden state; XLA unrolls nothing -- one compiled
loop, vmap/shard-friendly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gru_init(key: jax.Array, d_in: int, d_hidden: int, dtype=jnp.float32) -> dict:
    """U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases (torch GRU default)."""
    bound = 1.0 / (d_hidden**0.5)
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (d_in, 3 * d_hidden)),
        "w_hh": u(ks[1], (d_hidden, 3 * d_hidden)),
        "b_ih": u(ks[2], (3 * d_hidden,)),
        "b_hh": u(ks[3], (3 * d_hidden,)),
    }


def _gates_from(p: dict, gi: jnp.ndarray, h: jnp.ndarray):
    """Gate activations from a PRECOMPUTED input projection ``gi``.

    The input half of the GRU equations (x_t @ w_ih + b_ih) has no recurrent
    dependence, so callers hoist it out of the scan as ONE [B, L, 3H] matmul
    (better MXU utilization, and it halves the matmuls on the sequential
    chain); only the h @ w_hh half stays per-step.
    """
    H = h.shape[-1]
    gh = h @ p["w_hh"] + p["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H : 2 * H], gi[..., 2 * H :]
    h_r, h_z, h_n = gh[..., :H], gh[..., H : 2 * H], gh[..., 2 * H :]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return z, n


def gru(
    p: dict,
    xs: jnp.ndarray,
    h0: Optional[jnp.ndarray] = None,
    return_sequence: bool = False,
):
    """Run a GRU over [B, L, D].

    Returns the final hidden state [B, H], or all per-step states [B, L, H]
    when ``return_sequence`` (needed by DIEN's auxiliary loss).
    """
    B = xs.shape[0]
    H = p["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype=xs.dtype)
    gis = xs @ p["w_ih"] + p["b_ih"]  # hoisted input projection [B, L, 3H]

    def step(h, gi_t):
        z, n = _gates_from(p, gi_t, h)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new if return_sequence else None

    h_final, seq = jax.lax.scan(step, h0, jnp.swapaxes(gis, 0, 1))
    if return_sequence:
        return jnp.swapaxes(seq, 0, 1)  # [B, L, H]
    return h_final


def augru(
    p: dict,
    xs: jnp.ndarray,
    att: jnp.ndarray,
    h0: Optional[jnp.ndarray] = None,
    return_sequence: bool = False,
) -> jnp.ndarray:
    """AUGRU: the update gate is scaled by the attention score a_t.

    xs [B, L, D], att [B, L] -> final hidden [B, H] (or all states [B, L, H]
    when ``return_sequence`` -- used by variable-length serving to read the
    state at each user's true final step).
    """
    B = xs.shape[0]
    H = p["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), dtype=xs.dtype)
    gis = xs @ p["w_ih"] + p["b_ih"]  # hoisted input projection [B, L, 3H]

    def step(h, inp):
        gi_t, a_t = inp
        z, n = _gates_from(p, gi_t, h)
        z = a_t[:, None] * z
        h_new = (1.0 - z) * h + z * n
        return h_new, h_new if return_sequence else None

    h_final, seq = jax.lax.scan(
        step, h0, (jnp.swapaxes(gis, 0, 1), jnp.swapaxes(att, 0, 1))
    )
    if return_sequence:
        return jnp.swapaxes(seq, 0, 1)
    return h_final
