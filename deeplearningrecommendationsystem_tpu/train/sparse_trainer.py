"""Production minibatch training with row-sparse embedding updates (+ EP).

The reference's regime is dense torch Adam over whole tables every step
(scripts/mf.py:66); at production vocabs a dense step is HBM-bound on table
size, not batch size (train/sparse.py). This trainer is the path that makes
the sparse machinery real end-to-end:

  * the model's ``sparse_tables`` (vocab-height leaves, declared per model)
    are popped out of the param tree;
  * each minibatch gathers only its rows (through :func:`gather_rows`, so an
    active EP mesh row-shards the very same step with shard_map collectives);
  * the loss differentiates w.r.t. the GATHERED rows -- no full-vocab gradient
    is ever materialized -- and train/sparse.py's lazy-Adam / row-wise-AdaGrad
    updates touch only those rows;
  * everything else (MLPs, small field tables) trains with the dense Adam of
    train/optim.py, exactly as in the full-batch Trainer.

The whole multi-epoch run compiles to one program (permutation -> scan over
batches -> scan over epochs), same shape as train/minibatch.py.

Scale benchmark: tools/bench_scale_ctr.py. Correctness: tests/test_sparse.py
(dense-oracle loss-curve equivalence on ml-100k MF/DeepFM and an 8-device EP
mesh run matching the single-device run).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from deeplearningrecommendationsystem_tpu.parallel.ep import (
    embedding_partitioning,
    gather_rows,
    shard_model_tables,
    unshard_model_tables,
)
from deeplearningrecommendationsystem_tpu.parallel.mesh import MODEL_AXIS
from deeplearningrecommendationsystem_tpu.train.sparse import (
    LazyAdamState,
    RowwiseAdagradState,
    sparse_table_update,
)
from deeplearningrecommendationsystem_tpu.train.trainer import (
    TrainResult,
    Trainer,
    _bce_with_logits,
)


def pop_tables(params: Any, paths: Dict[str, Tuple[str, ...]]):
    """Split ``params`` into (dense-remainder, {name: table}) by key paths.

    Copy-on-write on the dict spine -- the original tree is not mutated.
    """
    tables: Dict[str, jnp.ndarray] = {}

    def _pop(tree, path):
        tree = dict(tree)
        if len(path) == 1:
            return tree, tree.pop(path[0])
        sub, val = _pop(tree[path[0]], path[1:])
        tree[path[0]] = sub
        return tree, val

    for name, path in paths.items():
        params, tables[name] = _pop(params, path)
    return params, tables


def merge_tables(params: Any, paths: Dict[str, Tuple[str, ...]], tables: Dict) -> Any:
    """Inverse of :func:`pop_tables`."""

    def _set(tree, path, val):
        tree = dict(tree)
        if len(path) == 1:
            tree[path[0]] = val
        else:
            tree[path[0]] = _set(tree[path[0]], path[1:], val)
        return tree

    for name, path in paths.items():
        params = _set(params, path, tables[name])
    return params


def fit_minibatch_sparse(
    trainer: Trainer,
    rng: jax.Array,
    train: Tuple[Any, jnp.ndarray],
    batch_size: int,
    optimizer: str = "lazy_adam",  # 'lazy_adam' | 'rowwise_adagrad'
    mesh: Any = None,
    ep_strategy: str = "psum",
    params: Any = None,
    unshard: bool = True,  # False: keep tables row-sharded for sharded serving
) -> TrainResult:
    """Shuffled minibatch epochs; sparse row updates on the id tables.

    Requires the model to implement the sparse protocol
    (``sparse_tables`` / ``table_ids`` / ``apply_rows`` -- see models/mf.py).
    With ``mesh`` (model axis > 1) the tables are additionally row-sharded
    and gathered through the explicit EP collectives.
    """
    model, cfg = trainer.model, trainer.config
    assert hasattr(model, "sparse_tables"), (
        f"{type(model).__name__} does not implement the sparse-table protocol"
    )
    batch, labels = train
    n = labels.shape[0]
    nb = n // batch_size
    assert nb > 0, "batch_size larger than dataset"

    init_rng, shuffle_rng = jax.random.split(rng)
    if params is None:
        params = model.init(init_rng)
    dense, tables = pop_tables(params, model.sparse_tables)

    ep_cfg, orig_heights = None, None
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        tables, ep_cfg, orig_heights = shard_model_tables(
            tables, mesh, ep_strategy
        )

    if optimizer == "lazy_adam":
        states = {
            k: LazyAdamState.init(t.shape[0], t.shape[1]) for k, t in tables.items()
        }
    elif optimizer == "rowwise_adagrad":
        states = {k: RowwiseAdagradState.init(t.shape[0]) for k, t in tables.items()}
    else:
        raise ValueError(optimizer)

    tx = trainer.tx
    dense_opt = tx.init(dense)
    lr = cfg.learning_rate

    def gather_batch(x, idx):
        return jax.tree.map(lambda a: a[idx], x)

    def step(carry, idx):
        dense, dense_opt, tables, states = carry
        b = gather_batch(batch, idx)
        y = labels[idx]
        ids = model.table_ids(b)
        rows = {k: gather_rows(t, ids[k]) for k, t in tables.items()}

        def loss_fn(dense, rows):
            return _bce_with_logits(model.apply_rows(dense, rows, b), y)

        loss, (g_dense, g_rows) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense, rows
        )
        updates, dense_opt = tx.update(g_dense, dense_opt, dense)
        dense = optax.apply_updates(dense, updates)
        new_tables, new_states = {}, {}
        for k in tables:
            new_tables[k], new_states[k] = sparse_table_update(
                tables[k], states[k], ids[k], g_rows[k], lr
            )
        return (dense, dense_opt, new_tables, new_states), loss

    def epoch(carry, erng):
        perm = jax.random.permutation(erng, n)[: nb * batch_size].reshape(
            nb, batch_size
        )
        carry, losses = jax.lax.scan(step, carry, perm)
        return carry, jnp.mean(losses)

    erngs = jax.random.split(shuffle_rng, cfg.epochs)
    with embedding_partitioning(ep_cfg):
        (dense, dense_opt, tables, states), losses = jax.lax.scan(
            epoch, (dense, dense_opt, tables, states), erngs
        )

    if ep_cfg is not None and unshard:
        tables = unshard_model_tables(tables, orig_heights)
    params = merge_tables(dense, model.sparse_tables, tables)
    return TrainResult(
        params=params,
        history={"train_loss": losses},
        opt_state={"dense": dense_opt, "sparse": states},
        ep_heights=orig_heights if ep_cfg is not None and not unshard else None,
    )


def fit_stream_sparse(
    trainer: Trainer,
    rng: jax.Array,
    train: Tuple[Any, Any],  # pytree of HOST numpy arrays, equal leading dim
    batch_size: int,
    optimizer: str = "lazy_adam",
    mesh: Any = None,
    ep_strategy: str = "psum",
    params: Any = None,
    prefetch: int = 2,
    seed: int = 0,
    unshard: bool = True,
) -> TrainResult:
    """Row-sparse minibatch training fed by the host-streaming loader.

    The full production composition: the DATASET stays in host memory
    (``data/stream.py`` shuffles on host and keeps ``prefetch`` batches in
    flight, so device memory holds only model + tables + a few batches) while
    the embedding TABLES update row-sparsely (and optionally row-shard over
    an EP mesh, staying sharded with ``unshard=False`` for
    ``parallel/serving.py``). One jitted step streams batches through;
    identical optimizer semantics to :func:`fit_minibatch_sparse` -- only the
    batch source (host stream vs on-device permutation scan) differs.
    """
    from deeplearningrecommendationsystem_tpu.data.stream import StreamingLoader

    model, cfg = trainer.model, trainer.config
    assert hasattr(model, "sparse_tables"), (
        f"{type(model).__name__} does not implement the sparse-table protocol"
    )
    batch_host, labels_host = train
    loader = StreamingLoader(
        (batch_host, labels_host), batch_size, seed=seed, prefetch=prefetch
    )
    assert len(loader) > 0, "batch_size larger than dataset"

    if params is None:
        params = model.init(rng)
    dense, tables = pop_tables(params, model.sparse_tables)

    ep_cfg, orig_heights = None, None
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        tables, ep_cfg, orig_heights = shard_model_tables(tables, mesh, ep_strategy)

    if optimizer == "lazy_adam":
        states = {
            k: LazyAdamState.init(t.shape[0], t.shape[1]) for k, t in tables.items()
        }
    elif optimizer == "rowwise_adagrad":
        states = {k: RowwiseAdagradState.init(t.shape[0]) for k, t in tables.items()}
    else:
        raise ValueError(optimizer)

    tx = trainer.tx
    dense_opt = tx.init(dense)
    lr = cfg.learning_rate

    def step(dense, dense_opt, tables, states, b, y):
        ids = model.table_ids(b)
        rows = {k: gather_rows(t, ids[k]) for k, t in tables.items()}

        def loss_fn(dense, rows):
            return _bce_with_logits(model.apply_rows(dense, rows, b), y)

        loss, (g_dense, g_rows) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense, rows
        )
        updates, dense_opt = tx.update(g_dense, dense_opt, dense)
        dense = optax.apply_updates(dense, updates)
        new_tables, new_states = {}, {}
        for k in tables:
            new_tables[k], new_states[k] = sparse_table_update(
                tables[k], states[k], ids[k], g_rows[k], lr
            )
        return dense, dense_opt, new_tables, new_states, loss

    with embedding_partitioning(ep_cfg):
        jstep = jax.jit(step)  # traced under the EP context; compiled once
        epoch_losses = []
        for _ in range(cfg.epochs):
            losses = []
            for b, y in loader.epoch():
                dense, dense_opt, tables, states, loss = jstep(
                    dense, dense_opt, tables, states, b, y
                )
                losses.append(loss)  # device scalar; no per-step host sync
            epoch_losses.append(jnp.mean(jnp.stack(losses)))

    if ep_cfg is not None and unshard:
        tables = unshard_model_tables(tables, orig_heights)
    params = merge_tables(dense, model.sparse_tables, tables)
    return TrainResult(
        params=params,
        history={"train_loss": jnp.stack(epoch_losses)},
        opt_state={"dense": dense_opt, "sparse": states},
        ep_heights=orig_heights if ep_cfg is not None and not unshard else None,
    )
