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

    def _disk_ema_kind(self, step: int) -> Optional[str]:
        """Read the on-disk ``ema_params`` generation from orbax's _METADATA.

        Returns ``"dict"`` (EMA-on save), ``"none"`` (EMA-off save since
        round 4), ``"absent"`` (pre-round-4 file), or ``None`` when the
        metadata file is missing/unreadable (older orbax layouts) — callers
        then fall back to probe-by-restore."""
        import json

        meta_path = self._dir / str(step) / "default" / "_METADATA"
        try:
            tree = json.loads(meta_path.read_text())["tree_metadata"]
        except (OSError, ValueError, KeyError):
            return None
        keys = [k for k in tree if k.startswith("('state', 'ema_params'")]
        if not keys:
            return "absent"
        if any(k != "('state', 'ema_params')" for k in keys):
            return "dict"
        return "none"

    def restore(self, state_template, step: Optional[int] = None,
                adopt_ema: bool = True):
        """Returns (state, epoch) or (None, 0) when no checkpoint exists.

        Optional TrainState fields added after a checkpoint was written
        (``ema_params``, round 4) are tolerated in both directions: a
        None-valued template field missing on disk restores as None, and a
        populated template field missing on disk (resuming an old run with
        EMA newly enabled) warm-starts from the restored ``params``.

        ``adopt_ema`` controls what an EMA-off caller does with a trained
        EMA found on disk: eval-style callers (default) adopt it so
        ``eval_params`` serves the averaged weights; resumed *training* with
        ``ema_decay == 0`` must pass ``adopt_ema=False`` so the run keeps the
        EMA-off checkpoint layout instead of carrying (and re-saving) a
        redundant frozen parameter copy."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, 0
        state_sd = serialization.to_state_dict(jax.device_get(state_template))

        # orbax restore templates must match the ON-DISK tree exactly, and
        # the optional ``ema_params`` field varies across checkpoint
        # generations: absent (pre-round-4 files), a None entry (EMA-off
        # saves since round 4), or a param tree (EMA-on saves).
        def _attempt(ema_value):
            tmpl_state = dict(state_sd)
            if ema_value == "drop":
                tmpl_state.pop("ema_params", None)
            else:
                tmpl_state["ema_params"] = ema_value
            template = {
                "state": tmpl_state,
                "meta": {"epoch": np.asarray(0, np.int32)},
            }
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

        want_ema = state_sd.get("ema_params") is not None
        kind = self._disk_ema_kind(step)
        if kind is not None:
            # the metadata names the generation: restore once, no probing
            ema_value = {
                "dict": state_sd["ema_params"] if want_ema else state_sd["params"],
                "none": None,
                "absent": "drop",
            }[kind]
            payload = _attempt(ema_value)
            disk_ema = ema_value
        else:
            # metadata unreadable (older orbax layout): probe the three
            # template shapes in order of likelihood for this caller,
            # swallowing only tree-structure mismatches
            order = (
                [state_sd["ema_params"], None, "drop"]
                if want_ema
                else [None, state_sd["params"], "drop"]
            )
            payload = disk_ema = None
            for ema_value in order:
                try:
                    payload = _attempt(ema_value)
                    disk_ema = ema_value
                    break
                except ValueError:
                    continue
            if payload is None:  # genuinely incompatible (e.g. model shape)
                payload = _attempt(order[0])  # re-raise the primary error
        if want_ema and (disk_ema is None or disk_ema == "drop"):
            log.info("checkpoint predates EMA; warm-starting ema_params from params")
            # copy, not alias: params and ema_params must stay independent
            # buffers (create_train_state makes the same guarantee)
            payload["state"]["ema_params"] = jax.tree.map(
                np.copy, payload["state"]["params"]
            )
        elif not want_ema and isinstance(disk_ema, dict):
            if adopt_ema:
                # disk carries a trained EMA the caller did not ask for
                # (e.g. eval tools with default config): adopt it so
                # ``eval_params`` automatically serves the EMA weights
                log.info("checkpoint carries EMA params; restoring them for eval")
                state_template = state_template.replace(
                    ema_params=state_template.params
                )
            else:
                log.info("checkpoint carries EMA params; dropping for EMA-off training")
                payload["state"]["ema_params"] = None
        elif disk_ema == "drop":
            payload["state"]["ema_params"] = None
        state = serialization.from_state_dict(state_template, payload["state"])
        epoch = int(payload["meta"]["epoch"])
        log.info("restored checkpoint step=%d epoch=%d from %s", step, epoch, self._dir)
        return state, epoch

    def close(self):
        self._mgr.close()
