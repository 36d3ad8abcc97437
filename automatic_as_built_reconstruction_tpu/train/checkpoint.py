"""Checkpointing with latest-index semantics (orbax-backed).

The reference keeps ``<model_dir>/latest-checkpoints.json`` and
``voxelnet-<step>.tckpt`` files [ref: torchplus/train/checkpoint.py —
UNVERIFIED].  Here: orbax ``CheckpointManager`` under
``<model_dir>/checkpoints`` storing the whole train-state pytree
(params, batch_stats, opt_state, step), with the same restore-latest
behavior and bounded retention.
"""
from __future__ import annotations

import pathlib
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, model_dir: str | pathlib.Path, max_to_keep: int = 8):
        self._dir = pathlib.Path(model_dir).absolute() / "checkpoints"
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template`` (abstract ok)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def close(self):
        self._mgr.close()


def try_restore_latest(model_dir, state_template):
    """(state, step) from the latest checkpoint, or (None, 0)."""
    mgr = CheckpointManager(model_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None, 0
    state = mgr.restore(state_template, step)
    mgr.close()
    return state, step
