"""Device mesh + sharding helpers.

The reference is strictly single-process / single-device (SURVEY.md §0); all
parallelism here is additive TPU-native capability (SURVEY.md §2.5):

* ``data`` axis -- batch (DP). Gradients are reduced over ICI by XLA/GSPMD;
  no hand-written allreduce.
* ``model`` axis -- embedding rows (EP/TP for tables). Lookups go through
  parallel/embedding.py's shard_map gather + psum.

Multi-host: call ``jax.distributed.initialize()`` (runtime/distributed.py)
before building the mesh; ``jax.devices()`` then spans all hosts and GSPMD
lays collectives over ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices=None
) -> Mesh:
    """Mesh over all (or given) devices with ('data', 'model') axes.

    Defaults: all devices on the data axis, model axis of 1.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_row_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (vocab-row) axis over 'model' (embedding tables)."""
    return NamedSharding(mesh, P(MODEL_AXIS, *([None] * (ndim - 1))))
