"""GDCF: matrix factorization by full-matrix gradient descent.

Capability parity with reference GDCF_Final.py:26-95: raw P [U, d] / Q [d, I]
factors with uniform [0, 1) init, BCE-with-logits over the full binary
matrix, Adam(lr=0.01), 10 iterations, Recall/Precision/F1@k vs the test fold
per iteration. Here the whole optimization is one ``lax.scan`` and the
per-iteration top-k recommendations come back as stacked arrays.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from deeplearningrecommendationsystem_tpu.cf.neighborhood import NEG_INF


def gdcf_train(
    matrix: jnp.ndarray,
    embedding_size: int = 100,
    learning_rate: float = 0.01,
    iterations: int = 10,
    top_k: int = 50,
    seed: int = 0,
    exclude_rated: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Returns (history with per-iter losses + recs [iters, U, k], final P@Q).

    ``exclude_rated=False`` matches the reference, which recommends over ALL
    items including already-rated ones (GDCF_Final.py:66-75).
    """
    U, I = matrix.shape
    kp, kq = jax.random.split(jax.random.PRNGKey(seed))
    P = jax.random.uniform(kp, (U, embedding_size))
    Q = jax.random.uniform(kq, (embedding_size, I))
    tx = optax.adam(learning_rate)
    opt_state = tx.init((P, Q))

    def loss_fn(pq):
        P, Q = pq
        logits = P @ Q
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, matrix)), logits

    def step(carry, _):
        pq, opt_state = carry
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(pq)
        updates, opt_state = tx.update(grads, opt_state, pq)
        pq = optax.apply_updates(pq, updates)
        # recommendations use the PRE-update scores of this iteration, like
        # the reference which reuses its forward pass (GDCF_Final.py:53-75)
        scores = jnp.where(matrix > 0, NEG_INF, logits) if exclude_rated else logits
        _, rec = jax.lax.top_k(scores, top_k)
        return (pq, opt_state), {"loss": loss, "rec": rec}

    (pq, _), history = jax.lax.scan(step, ((P, Q), opt_state), None, length=iterations)
    return history, pq[0] @ pq[1]
