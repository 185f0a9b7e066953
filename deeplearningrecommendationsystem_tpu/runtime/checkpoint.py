"""Checkpoint / resume (orbax).

The reference has no persistence at all -- training state lives in process
memory for the length of a script run (SURVEY.md §5.4). Here params,
optimizer state and the data-pipeline RNG key are checkpointed per step with
orbax, giving deterministic resume (same sampler stream, same optimizer
moments) -- the recovery story for multi-hour runs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Thin orbax wrapper: save/restore {params, opt_state, rng, step}."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, params: Any, opt_state: Any = None, rng: Optional[jax.Array] = None) -> None:
        ocp = _ocp()
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        if rng is not None:
            state["rng"] = np.asarray(rng)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> dict:
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def close(self) -> None:
        self._mgr.close()
