"""Sparse (lazy) embedding-row optimizer correctness vs literal NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.train.sparse import (
    LazyAdamState,
    RowwiseAdagradState,
    dedup_rows,
    lazy_adam,
    rowwise_adagrad,
    sparse_table_update,
)

VOCAB, DIM, B = 17, 5, 8


def _rand_batches(steps, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(steps):
        ids = rng.integers(0, VOCAB, B)
        grads = rng.normal(size=(B, DIM)).astype(np.float32)
        out.append((ids, grads))
    return out


def _scatter_add(ids, grads):
    dense = np.zeros((VOCAB, DIM), np.float32)
    np.add.at(dense, ids, grads)
    return dense


def test_dedup_rows_matches_scatter_add():
    ids = np.array([3, 3, 0, 16, 3, 0, 5, 16])
    grads = np.random.default_rng(1).normal(size=(B, DIM)).astype(np.float32)
    uids, ugrads = jax.jit(lambda i, g: dedup_rows(i, g, VOCAB))(ids, grads)
    dense = _scatter_add(ids, grads)
    recon = np.zeros_like(dense)
    for j, u in enumerate(np.asarray(uids)):
        if u < VOCAB:
            recon[u] += np.asarray(ugrads[j])
    np.testing.assert_allclose(recon, dense, rtol=1e-6)
    # padded tail: sentinel id and zero grads
    n_unique = len(set(ids.tolist()))
    assert np.all(np.asarray(uids[n_unique:]) == VOCAB)
    np.testing.assert_array_equal(np.asarray(ugrads[n_unique:]), 0.0)


def test_lazy_adam_matches_torch_sparseadam_oracle():
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    rng = np.random.default_rng(2)
    table0 = rng.normal(size=(VOCAB, DIM)).astype(np.float32)

    # oracle: per-element moments advance only on touched rows; global-step
    # bias correction (torch.optim.SparseAdam)
    tab = table0.copy()
    m = np.zeros_like(tab)
    v = np.zeros_like(tab)
    batches = _rand_batches(5, seed=3)
    for t, (ids, grads) in enumerate(batches, start=1):
        dense = _scatter_add(ids, grads)
        touched = np.unique(ids)
        m[touched] = b1 * m[touched] + (1 - b1) * dense[touched]
        v[touched] = b2 * v[touched] + (1 - b2) * dense[touched] ** 2
        m_hat = m[touched] / (1 - b1**t)
        v_hat = v[touched] / (1 - b2**t)
        tab[touched] -= lr * m_hat / (np.sqrt(v_hat) + eps)

    jt = jnp.asarray(table0)
    st = LazyAdamState.init(VOCAB, DIM)
    step = jax.jit(
        lambda tab, st, ids, g: sparse_table_update(tab, st, ids, g, lr)
    )
    for ids, grads in batches:
        jt, st = step(jt, st, jnp.asarray(ids), jnp.asarray(grads))
    np.testing.assert_allclose(np.asarray(jt), tab, rtol=2e-5, atol=2e-6)
    assert int(st.t) == len(batches)


def test_rowwise_adagrad_matches_oracle():
    lr, eps = 0.05, 1e-10
    rng = np.random.default_rng(4)
    table0 = rng.normal(size=(VOCAB, DIM)).astype(np.float32)

    tab = table0.copy()
    accum = np.zeros(VOCAB, np.float32)
    batches = _rand_batches(4, seed=5)
    for ids, grads in batches:
        dense = _scatter_add(ids, grads)
        touched = np.unique(ids)
        accum[touched] += np.mean(dense[touched] ** 2, axis=-1)
        tab[touched] -= (lr / (np.sqrt(accum[touched]) + eps))[:, None] * dense[
            touched
        ]

    jt = jnp.asarray(table0)
    st = RowwiseAdagradState.init(VOCAB)
    step = jax.jit(
        lambda tab, st, ids, g: sparse_table_update(tab, st, ids, g, lr)
    )
    for ids, grads in batches:
        jt, st = step(jt, st, jnp.asarray(ids), jnp.asarray(grads))
    np.testing.assert_allclose(np.asarray(jt), tab, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(st.accum), accum, rtol=2e-5, atol=1e-7)


def test_untouched_rows_and_state_never_move():
    rng = np.random.default_rng(6)
    table0 = jnp.asarray(rng.normal(size=(VOCAB, DIM)).astype(np.float32))
    ids = jnp.array([1, 1, 2, 2, 1, 2, 1, 2])
    grads = jnp.asarray(rng.normal(size=(B, DIM)).astype(np.float32))
    for st in (LazyAdamState.init(VOCAB, DIM), RowwiseAdagradState.init(VOCAB)):
        tab, st2 = sparse_table_update(table0, st, ids, grads, 0.01)
        untouched = np.setdiff1d(np.arange(VOCAB), [1, 2])
        np.testing.assert_array_equal(
            np.asarray(tab[untouched]), np.asarray(table0[untouched])
        )
        if isinstance(st, LazyAdamState):
            np.testing.assert_array_equal(np.asarray(st2.m[untouched]), 0.0)
        else:
            np.testing.assert_array_equal(np.asarray(st2.accum[untouched]), 0.0)


def test_end_to_end_mf_training_decreases_loss():
    """Wire the sparse path into a real MF gradient (grad w.r.t. gathered rows)."""
    from deeplearningrecommendationsystem_tpu.models import MatrixFactorization

    model = MatrixFactorization(num_users=VOCAB, num_items=VOCAB, embedding_dim=DIM)
    params = model.init(jax.random.PRNGKey(0))
    states = {
        "user": LazyAdamState.init(VOCAB, DIM),
        "item": LazyAdamState.init(VOCAB, DIM),
    }

    def loss_from_rows(u_rows, i_rows, y):
        logits = jnp.sum(u_rows * i_rows, axis=-1)
        import optax

        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))

    @jax.jit
    def step(params, states, u, i, y):
        u_rows = params["user"][u]
        i_rows = params["item"][i]
        loss, (gu, gi) = jax.value_and_grad(loss_from_rows, argnums=(0, 1))(
            u_rows, i_rows, y
        )
        p, s = dict(params), dict(states)
        p["user"], s["user"] = sparse_table_update(
            params["user"], states["user"], u, gu, 0.05
        )
        p["item"], s["item"] = sparse_table_update(
            params["item"], states["item"], i, gi, 0.05
        )
        return p, s, loss

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.integers(0, VOCAB, 64))
    i = jnp.asarray(rng.integers(0, VOCAB, 64))
    y = jnp.asarray((rng.random(64) < 0.5).astype(np.float32))
    losses = []
    for _ in range(30):
        params, states, loss = step(params, states, u, i, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8
