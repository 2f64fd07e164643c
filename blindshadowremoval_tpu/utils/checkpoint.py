"""Checkpoint / resume with restore-latest semantics.

The reference uses `tf.train.Checkpoint` over generator + 3 discriminators +
both optimizers, saving once per epoch and restoring the latest with the
epoch parsed from the filename (train_test_GSC.py:142-148,166-173).  Here the
entire `TrainState` pytree (params, batch stats, both optimizer states, step)
is saved with Orbax — async-capable and preemption-safe, with the same
resume-from-latest contract.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin Orbax wrapper: save(step, state) / restore_latest(template)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> tuple[Any, int]:
        """Restore the newest checkpoint into `template`'s structure.

        Returns (state, step); (template, 0) if nothing saved yet —
        mirroring the reference's restore-or-init (train_test_GSC.py:168-173).
        """
        step = self._mgr.latest_step()
        if step is None:
            return template, 0
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        return restored, step

    def close(self):
        self._mgr.close()
