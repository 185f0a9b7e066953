"""Minibatch training: fully-compiled shuffled SGD epochs.

The reference trains strictly full-batch (no minibatching exists anywhere,
SURVEY.md §0); this module is the additive production path. TPU-idiomatic
design: the (small) dataset lives on device, each epoch draws a fresh
``jax.random.permutation``, reshapes to [num_batches, batch] and scans over
batches -- the entire multi-epoch minibatch run is still ONE compiled
program, no host round-trips. For datasets that don't fit on device, pair
the step function with data/stream.py's host prefetcher instead.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from deeplearningrecommendationsystem_tpu.train.trainer import TrainResult, Trainer


def fit_minibatch(
    trainer: Trainer,
    rng: jax.Array,
    train: Tuple[Any, jnp.ndarray],
    batch_size: int,
    params: Any = None,
    opt_state: Any = None,
) -> TrainResult:
    """Shuffled minibatch SGD for ``trainer.config.epochs`` epochs.

    The trailing partial batch is dropped each epoch (shuffling re-draws
    membership every epoch, so no example is systematically excluded).
    Returns per-epoch mean training loss in ``history['train_loss']``.
    """
    model, cfg, tx = trainer.model, trainer.config, trainer.tx
    batch, labels = train
    n = labels.shape[0]
    nb = n // batch_size
    assert nb > 0, "batch_size larger than dataset"

    init_rng, shuffle_rng = jax.random.split(rng)
    if params is None:
        params = model.init(init_rng)
    if opt_state is None:
        opt_state = tx.init(params)

    def gather(x, idx):
        return jax.tree.map(lambda a: a[idx], x)

    def epoch(carry, erng):
        params, opt_state = carry
        perm = jax.random.permutation(erng, n)[: nb * batch_size]
        perm = perm.reshape(nb, batch_size)

        def step(carry, idx):
            params, opt_state = carry
            b = gather(batch, idx)
            y = labels[idx]
            (loss, _), grads = jax.value_and_grad(trainer.loss_fn, has_aux=True)(
                params, b, y, None
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), perm)
        return (params, opt_state), jnp.mean(losses)

    erngs = jax.random.split(shuffle_rng, cfg.epochs)
    (params, opt_state), losses = jax.lax.scan(epoch, (params, opt_state), erngs)
    return TrainResult(
        params=params, history={"train_loss": losses}, opt_state=opt_state
    )


def fit_stream(
    trainer: Trainer,
    rng: jax.Array,
    train: Tuple[Any, Any],  # pytree of HOST numpy arrays, equal leading dim
    batch_size: int,
    params: Any = None,
    opt_state: Any = None,
    sharding=None,
    prefetch: int = 2,
    seed: int = 0,
) -> TrainResult:
    """Minibatch SGD fed by the host-streaming loader (data/stream.py).

    The larger-than-HBM training mode: the dataset stays in HOST memory as
    numpy arrays; `StreamingLoader` shuffles on host and keeps ``prefetch``
    batches in flight on device (async ``device_put`` overlaps H2D transfer
    with the previous step's compute), so device memory holds only the model
    plus ``prefetch`` batches. Same optimizer/loss semantics as
    :func:`fit_minibatch` -- only the batch source differs (host stream +
    host shuffle vs on-device ``jax.random.permutation``), so loss curves are
    statistically, not bitwise, equivalent. Pass a ``NamedSharding`` to place
    batches straight onto a DP mesh. CLI: ``--train-mode stream``.
    """
    from deeplearningrecommendationsystem_tpu.data.stream import StreamingLoader

    model, cfg = trainer.model, trainer.config
    batch, labels = train
    loader = StreamingLoader(
        (batch, labels), batch_size, seed=seed, sharding=sharding, prefetch=prefetch
    )
    assert len(loader) > 0, "batch_size larger than dataset"

    if params is None:
        params = model.init(rng)
    if opt_state is None:
        opt_state = trainer.tx.init(params)

    step = jax.jit(trainer.train_step)  # compiled once; batches stream through
    epoch_losses = []
    for _ in range(cfg.epochs):
        losses = []
        for b, y in loader.epoch():
            params, opt_state, loss, _ = step(params, opt_state, b, y)
            losses.append(loss)  # device scalar; no per-step host sync
        epoch_losses.append(jnp.mean(jnp.stack(losses)))
    return TrainResult(
        params=params,
        history={"train_loss": jnp.stack(epoch_losses)},
        opt_state=opt_state,
    )
