"""Host-side streaming dataloader with device prefetch.

For datasets that don't fit in HBM: a background-free, double-buffered
host->device pipeline -- while the device computes on batch i, batch i+1 is
already being transferred. The reference has no dataloader at all (its
``data/dataloader.py`` is an empty stub, SURVEY.md §2.1); this is the
additive streaming path for production-scale runs, consumed end-to-end by
``train/minibatch.py::fit_stream`` (CLI ``--train-mode stream``).
"""

from __future__ import annotations

import collections
import itertools
from typing import Any, Iterable, Iterator, Optional

import jax
import numpy as np


def epoch_batches(
    rng: np.random.Generator, n: int, batch_size: int, drop_last: bool = True
) -> Iterator[np.ndarray]:
    """Shuffled index batches for one epoch (host side)."""
    perm = rng.permutation(n)
    end = (n // batch_size) * batch_size if drop_last else n
    for i in range(0, end, batch_size):
        yield perm[i : i + batch_size]


def prefetch_to_device(
    iterator: Iterable[Any], size: int = 2, sharding=None
) -> Iterator[Any]:
    """Keep ``size`` batches in flight on device ahead of the consumer.

    ``jax.device_put`` is async: enqueueing the next transfer before the
    current batch is consumed overlaps H2D copies with compute. Pass a
    ``NamedSharding`` to place batches directly onto a mesh.
    """
    queue: collections.deque = collections.deque()
    it = iter(iterator)

    def put(x):
        if sharding is not None:
            return jax.tree.map(lambda a: jax.device_put(a, sharding), x)
        return jax.tree.map(jax.device_put, x)

    for x in itertools.islice(it, size):
        queue.append(put(x))
    while queue:
        yield queue.popleft()
        nxt = next(it, None)
        if nxt is not None:
            queue.append(put(nxt))


class StreamingLoader:
    """Shuffled (batch, label) stream over host numpy arrays, device-prefetched."""

    def __init__(
        self,
        arrays: Any,  # pytree of numpy arrays with equal leading dim
        batch_size: int,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
    ):
        self.arrays = arrays
        leaves = jax.tree.leaves(arrays)
        self.n = leaves[0].shape[0]
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.prefetch = prefetch

    def __len__(self) -> int:
        return self.n // self.batch_size

    def epoch(self) -> Iterator[Any]:
        def host_batches():
            for idx in epoch_batches(self._rng, self.n, self.batch_size):
                yield jax.tree.map(lambda a: a[idx], self.arrays)

        return prefetch_to_device(host_batches(), self.prefetch, self.sharding)
