"""Data-parallel batch placement.

Full-batch sizes on ml-100k are arbitrary (positives + negatives per split),
so the batch is padded up to a multiple of the data-axis size and the pad
rows are given weight 0 -- the Trainer's weighted BCE then ignores them,
keeping loss/metrics bit-identical to the unsharded run while every array
keeps a shape divisible across devices.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from deeplearningrecommendationsystem_tpu.parallel.mesh import DATA_AXIS, data_sharding


def _pad_rows(x: jnp.ndarray, target: int) -> jnp.ndarray:
    pad = target - x.shape[0]
    if pad == 0:
        return x
    pad_block = jnp.zeros((pad,) + x.shape[1:], dtype=x.dtype)
    return jnp.concatenate([x, pad_block], axis=0)


def pad_and_shard(
    batch: Any,
    labels: jnp.ndarray,
    mesh: Mesh,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[Any, jnp.ndarray, jnp.ndarray]:
    """Pad every leading axis to a multiple of the data-axis size, attach
    zero weights to pad rows, and device_put with batch sharding.

    Returns (batch, labels, weights) placed on the mesh.
    """
    n = labels.shape[0]
    n_data = mesh.shape[DATA_AXIS]
    target = ((n + n_data - 1) // n_data) * n_data

    if weights is None:
        weights = jnp.ones((n,), dtype=jnp.float32)
    batch = jax.tree.map(lambda x: _pad_rows(jnp.asarray(x), target), batch)
    labels = _pad_rows(jnp.asarray(labels), target)
    weights = _pad_rows(jnp.asarray(weights), target)

    put = lambda x: jax.device_put(x, data_sharding(mesh, x.ndim))
    return jax.tree.map(put, batch), put(labels), put(weights)
