"""Orbax checkpoint save/restore (SURVEY.md §5.4).

The reference relies on Lightning's implicit default checkpointing and never
wires up resume (ref: train.py:45,51).  Here: explicit orbax checkpoints of
the full TrainState (params + BatchNorm stats + optimizer state + step)
plus the training epoch, with retention and proper resume.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import serialization

log = logging.getLogger("transformertts_tpu.checkpoint")


def _to_host(tree):
    """Fetch a (possibly sharded) pytree to host memory.

    Replicated arrays are fully addressable and fetched directly; arrays
    sharded across hosts (e.g. TP over a multi-host mesh) are gathered via
    ``process_allgather`` so a single host can write the checkpoint."""

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x))
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state, epoch: int, extra: Optional[dict] = None) -> None:
        payload = {
            "state": serialization.to_state_dict(_to_host(state)),
            "meta": {"epoch": np.asarray(epoch, np.int32), **(extra or {})},
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Returns (state, epoch) or (None, 0) when no checkpoint exists."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, 0
        template = {
            "state": serialization.to_state_dict(jax.device_get(state_template)),
            "meta": {"epoch": np.asarray(0, np.int32)},
        }
        payload = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        state = serialization.from_state_dict(state_template, payload["state"])
        epoch = int(payload["meta"]["epoch"])
        log.info("restored checkpoint step=%d epoch=%d from %s", step, epoch, self._dir)
        return state, epoch

    def close(self):
        self._mgr.close()
