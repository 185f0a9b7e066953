"""Negative sampler: never hits excluded pairs, exactly uniform over allowed."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.sampling import NegativeSampler, negative_sample


def test_never_samples_excluded():
    rng = np.random.default_rng(0)
    excluded = rng.random((50, 200)) < 0.4
    users, items = negative_sample(jax.random.PRNGKey(1), jnp.asarray(excluded), 20)
    users, items = np.asarray(users), np.asarray(items)
    assert users.shape == (50 * 20,)
    assert not excluded[users, items].any()


def test_user_major_order():
    excluded = np.zeros((5, 10), dtype=bool)
    users, _ = negative_sample(jax.random.PRNGKey(0), jnp.asarray(excluded), 3)
    assert np.asarray(users).tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4]


def test_uniform_over_allowed():
    # one user, 8 allowed of 16 items: each should get ~1/8 of the draws
    excluded = np.zeros((1, 16), dtype=bool)
    excluded[0, ::2] = True  # only odd items allowed
    n = 40_000
    _, items = negative_sample(jax.random.PRNGKey(2), jnp.asarray(excluded), n)
    items = np.asarray(items)
    assert (items % 2 == 1).all()
    counts = np.bincount(items, minlength=16)[1::2]
    assert abs(counts.max() / counts.min() - 1.0) < 0.15


def test_sampler_wrapper(ml100k):
    seen = ml100k.seen_mask(ml100k.train, ml100k.valid, ml100k.test)
    s = NegativeSampler(seen, seed=0)
    neg = s.sample(10)
    assert len(neg["user"]) == 943 * 10
    assert (neg["rating"] == 0).all()
    assert not seen[neg["user"], neg["item"]].any()
    # fresh keys per call
    neg2 = s.sample(10)
    assert not np.array_equal(neg["item"], neg2["item"])
