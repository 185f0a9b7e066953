"""Minibatch SGD + streaming loader."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.data.stream import StreamingLoader, prefetch_to_device
from deeplearningrecommendationsystem_tpu.models import MatrixFactorization
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer
from deeplearningrecommendationsystem_tpu.train.minibatch import fit_minibatch


def _toy(n=512, U=20, I=30, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.integers(0, U, n))
    i = jnp.asarray(rng.integers(0, I, n))
    # learnable structure: positive iff (u + i) even
    y = jnp.asarray(((np.asarray(u) + np.asarray(i)) % 2 == 0).astype(np.float32))
    return (u, i), y


def test_minibatch_learns_and_differs_from_fullbatch():
    model = MatrixFactorization(20, 30, 8)
    trainer = Trainer(model, TrainConfig(learning_rate=0.05, epochs=30, track_metrics=False))
    train = _toy()
    res_mb = fit_minibatch(trainer, jax.random.PRNGKey(0), train, batch_size=64)
    assert len(res_mb.history["train_loss"]) == 30
    losses = np.asarray(res_mb.history["train_loss"])
    assert losses[-1] < losses[0] * 0.8  # actually optimizes
    res_fb = trainer.fit(jax.random.PRNGKey(0), train)
    # different regimes produce different params (sanity that minibatching acted)
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(res_mb.params), jax.tree.leaves(res_fb.params))
    ]
    assert max(diffs) > 1e-4


def test_minibatch_resume_matches():
    model = MatrixFactorization(20, 30, 8)
    t5 = Trainer(model, TrainConfig(learning_rate=0.05, epochs=5, track_metrics=False))
    train = _toy()
    a = fit_minibatch(t5, jax.random.PRNGKey(0), train, batch_size=64)
    for leaf in jax.tree.leaves(a.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_prefetch_preserves_order_and_content():
    batches = [np.full((4,), i) for i in range(7)]
    out = list(prefetch_to_device(batches, size=3))
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b), batches[i])


def test_streaming_loader_epoch():
    rng = np.random.default_rng(0)
    arrays = {"x": rng.random((100, 5)).astype(np.float32), "y": np.arange(100)}
    loader = StreamingLoader(arrays, batch_size=16, seed=1)
    seen = []
    for batch in loader.epoch():
        assert batch["x"].shape == (16, 5)
        seen.extend(np.asarray(batch["y"]).tolist())
    assert len(seen) == 6 * 16
    assert len(set(seen)) == len(seen)  # no duplicates within an epoch
