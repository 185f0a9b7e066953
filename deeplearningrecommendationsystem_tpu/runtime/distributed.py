"""Multi-host runtime initialization.

The reference is single-process (SURVEY.md §0). For pod-slice / multi-host
runs: call ``initialize()`` once per host before any jax computation; after
it, ``jax.devices()`` spans every host and GSPMD collectives ride ICI within
a slice and DCN across slices. Each host feeds its own shard of the batch
(``host_local_slice``); host 0 owns reporting.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection defaults."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    return jax.process_index() == 0


def host_local_slice(n: int) -> Tuple[int, int]:
    """[start, end) of this host's contiguous shard of n examples."""
    p, np_ = jax.process_index(), jax.process_count()
    per = n // np_
    start = p * per
    end = n if p == np_ - 1 else start + per
    return start, end
