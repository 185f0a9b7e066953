"""Checkpoint round-trip + profiler timer + distributed helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from deeplearningrecommendationsystem_tpu.models import MatrixFactorization
from deeplearningrecommendationsystem_tpu.runtime.checkpoint import CheckpointManager
from deeplearningrecommendationsystem_tpu.runtime.distributed import host_local_slice, is_primary
from deeplearningrecommendationsystem_tpu.runtime.profiler import StepTimer, debug_nans
from deeplearningrecommendationsystem_tpu.train import TrainConfig, Trainer


def test_checkpoint_roundtrip_and_resume(tmp_path):
    model = MatrixFactorization(20, 30, 4)
    trainer = Trainer(model, TrainConfig(learning_rate=0.01, epochs=3, track_metrics=False))
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.integers(0, 20, 64)), jnp.asarray(rng.integers(0, 30, 64)))
    y = jnp.asarray((rng.random(64) < 0.5).astype(np.float32))

    r1 = trainer.fit(jax.random.PRNGKey(0), (batch, y))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, r1.params, rng=jax.random.PRNGKey(7))
    assert mgr.latest_step() == 3

    restored = mgr.restore(template={"params": r1.params, "rng": np.zeros(2, dtype=np.uint32)})
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(restored["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # deterministic resume: 3 epochs + resumed 3 epochs (params AND opt
    # state restored) must equal one uninterrupted 6-epoch run
    trainer6 = Trainer(model, TrainConfig(learning_rate=0.01, epochs=6, track_metrics=False))
    full = trainer6.fit(jax.random.PRNGKey(0), (batch, y))
    resumed = trainer.fit(
        jax.random.PRNGKey(0), (batch, y), params=r1.params, opt_state=r1.opt_state
    )
    for a, b in zip(jax.tree.leaves(full.params), jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    mgr.close()


def test_step_timer():
    with StepTimer(examples_per_step=1000) as t:
        pass
    assert t.steps == 1
    assert t.examples_per_sec > 0


def test_debug_nans_context():
    with debug_nans(False):
        _ = jnp.log(jnp.asarray(-1.0))  # would raise under debug_nans(True)


def test_distributed_helpers_single_process():
    assert is_primary()
    start, end = host_local_slice(100)
    assert (start, end) == (0, 100)


def test_plot_history(tmp_path):
    pytest = __import__("pytest")
    pytest.importorskip("matplotlib")
    from deeplearningrecommendationsystem_tpu.runtime.plotting import plot_history

    history = {
        "train_loss": np.linspace(1.0, 0.1, 10),
        "valid_loss": np.linspace(1.1, 0.2, 10),
        "train_precision": np.linspace(0.5, 0.9, 10),
        "train_recall": np.linspace(0.4, 0.8, 10),
        "not_a_series": np.zeros((3, 3)),  # silently skipped
    }
    out = tmp_path / "curves.png"
    plot_history(history, str(out))
    assert out.exists() and out.stat().st_size > 0
