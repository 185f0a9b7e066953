"""DIEN auxiliary-loss training (extension; VERDICT r1 #9).

The reference DIEN has no auxiliary loss (/root/reference/model/dien.py:47,61);
models/dien.py::auxiliary_loss implements the paper's next-behavior loss and
the Trainer's composite-loss hook (bce + w * aux) makes it trainable
end-to-end via ExperimentConfig.aux_weight.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.models import DIEN
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer


def _seq_data(n=256, I=50, L=8, seed=0):
    rng = np.random.default_rng(seed)
    hist = jnp.asarray(rng.integers(0, I, (n, L)))
    target = jnp.asarray(rng.integers(0, I, n))
    neg = jnp.asarray(rng.integers(0, I, (n, L)))
    y = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))
    return (hist, target, neg), y


def test_aux_loss_changes_training_and_flows_to_gru():
    model = DIEN(num_items=50, embed_size=8, attention_units=(8, 1), fc_units=(8, 1))
    batch, y = _seq_data()
    cfg = TrainConfig(learning_rate=1e-2, epochs=4, track_metrics=False)

    plain = Trainer(model, cfg).fit(jax.random.PRNGKey(0), (batch, y))
    aux = Trainer(
        model,
        cfg,
        aux_loss_fn=lambda p, b: model.auxiliary_loss(p, b[0], b[2]),
        aux_weight=0.5,
    ).fit(jax.random.PRNGKey(0), (batch, y))

    # composite loss actually participates: training histories diverge and
    # the GRU params receive different updates
    assert not np.allclose(
        np.asarray(plain.history["train_loss"]), np.asarray(aux.history["train_loss"])
    )
    diff = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(
            jax.tree.leaves(plain.params["gru"]), jax.tree.leaves(aux.params["gru"])
        )
    )
    assert diff > 1e-6
    assert np.isfinite(np.asarray(aux.history["train_loss"])).all()


def test_aux_loss_value_matches_numpy_oracle():
    model = DIEN(num_items=30, embed_size=4, attention_units=(8, 1), fc_units=(8, 1))
    params = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(2)
    hist = jnp.asarray(rng.integers(0, 30, (5, 6)))
    neg = jnp.asarray(rng.integers(0, 30, (5, 6)))

    got = float(model.auxiliary_loss(params, hist, neg))

    from deeplearningrecommendationsystem_tpu.ops.gru import gru

    hist_e = np.asarray(params["item"])[np.asarray(hist)]
    neg_e = np.asarray(params["item"])[np.asarray(neg)]
    states = np.asarray(gru(params["gru"], jnp.asarray(hist_e), return_sequence=True))
    h_t = states[:, :-1, :]
    pos = (h_t * hist_e[:, 1:, :]).sum(-1)
    negs = (h_t * neg_e[:, 1:, :]).sum(-1)
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))  # noqa: E731
    want = -np.mean(np.log(sig(pos)) + np.log(sig(-negs)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_apply_with_aux_matches_separate_paths():
    """apply_with_aux (one shared extractor scan) must equal apply +
    auxiliary_loss computed separately, in BOTH parity and AUGRU modes."""
    batch, _ = _seq_data(n=16, I=30, L=6, seed=3)
    for use_augru in (False, True):
        model = DIEN(
            num_items=30, embed_size=4, attention_units=(8, 1), fc_units=(8, 1),
            use_augru=use_augru,
        )
        params = model.init(jax.random.PRNGKey(4))
        logits_fused, aux_fused = model.apply_with_aux(params, batch)
        np.testing.assert_allclose(
            np.asarray(logits_fused),
            np.asarray(model.apply(params, batch)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(aux_fused),
            float(model.auxiliary_loss(params, batch[0], batch[2])),
            rtol=1e-6,
        )


def test_fused_aux_trainer_matches_callable_hook():
    """Trainer(aux_loss_fn='model') trains identically to the callable hook
    (same loss curve, same final params) -- it only removes duplicated work."""
    model = DIEN(num_items=50, embed_size=8, attention_units=(8, 1), fc_units=(8, 1))
    batch, y = _seq_data()
    cfg = TrainConfig(learning_rate=1e-2, epochs=4, track_metrics=False)

    fused = Trainer(model, cfg, aux_loss_fn="model", aux_weight=0.5).fit(
        jax.random.PRNGKey(0), (batch, y)
    )
    hook = Trainer(
        model,
        cfg,
        aux_loss_fn=lambda p, b: model.auxiliary_loss(p, b[0], b[2]),
        aux_weight=0.5,
    ).fit(jax.random.PRNGKey(0), (batch, y))
    np.testing.assert_allclose(
        np.asarray(fused.history["train_loss"]),
        np.asarray(hook.history["train_loss"]),
        rtol=1e-5,
    )


def test_experiment_aux_preset_runs(ml100k):
    from deeplearningrecommendationsystem_tpu.configs.presets import PRESETS
    from deeplearningrecommendationsystem_tpu.experiments import run_experiment

    cfg = PRESETS["dien"].replace(
        epochs=2, aux_weight=0.3, track_metrics=False,
        model_kwargs={"embed_size": 8, "use_augru": True},
        full_history_serving=False,
    )
    res = run_experiment(cfg, data=ml100k)
    assert np.isfinite(np.asarray(res.history["train_loss"])).all()
