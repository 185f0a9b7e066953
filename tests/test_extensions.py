"""Extensions beyond the reference: DIEN aux loss, AUGRU, bf16 compute mode."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.models import DIEN, MatrixFactorization
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer


def test_dien_auxiliary_loss_differentiable():
    model = DIEN(100, embed_size=8, attention_units=(16, 1), fc_units=(16, 1))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hist = jnp.asarray(rng.integers(0, 100, (8, 10)))
    neg = jnp.asarray(rng.integers(0, 100, (8, 10)))

    loss = model.auxiliary_loss(params, hist, neg)
    assert np.isfinite(float(loss)) and float(loss) > 0

    grads = jax.grad(lambda p: model.auxiliary_loss(p, hist, neg))(params)
    g_item = np.asarray(grads["item"])
    g_gru = np.asarray(grads["gru"]["w_ih"])
    assert np.abs(g_item).max() > 0
    assert np.abs(g_gru).max() > 0
    # fc head does not participate in the aux loss
    assert np.abs(np.asarray(grads["fc"][0]["w"])).max() == 0


def test_bf16_compute_mode_close_to_f32():
    rng = np.random.default_rng(0)
    n = 256
    batch = (jnp.asarray(rng.integers(0, 20, n)), jnp.asarray(rng.integers(0, 30, n)))
    y = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))
    model = MatrixFactorization(20, 30, 8)

    f32 = Trainer(model, TrainConfig(learning_rate=0.01, epochs=10, track_metrics=False))
    bf16 = Trainer(
        model,
        TrainConfig(learning_rate=0.01, epochs=10, track_metrics=False, compute_dtype="bfloat16"),
    )
    r32 = f32.fit(jax.random.PRNGKey(0), (batch, y))
    r16 = bf16.fit(jax.random.PRNGKey(0), (batch, y))
    # master weights stay f32
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(r16.params))
    # same optimization trajectory to bf16 tolerance
    np.testing.assert_allclose(
        np.asarray(r32.history["train_loss"]),
        np.asarray(r16.history["train_loss"]),
        atol=0.02,
    )
