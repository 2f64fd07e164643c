"""Checkpoint / resume with restore-latest semantics.

The reference uses `tf.train.Checkpoint` over generator + 3 discriminators +
both optimizers, saving once per epoch and restoring the latest with the
epoch parsed from the filename (train_test_GSC.py:142-148,166-173).  Here the
entire `TrainState` pytree (params, batch stats, both optimizer states, step)
is saved with Orbax — async-capable and preemption-safe, with the same
resume-from-latest contract.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin Orbax wrapper: save(step, state) / restore_latest(template).

    Besides the rolling latest-N set (the resume contract), an optional
    best-by-metric slot lives under `<dir>/best`: `save_best(step, state,
    metric)` keeps the single highest-metric checkpoint, so long runs cannot
    silently regress past their best validation score (the reference keeps
    only the rolling window, train_test_GSC.py:187 — and the 11k-step demo
    documented in docs/demo/README.md regressed 19.04 -> 17.59 dB that way).
    """

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best_mgr: Optional[ocp.CheckpointManager] = None

    # ------------------------------------------------------------- best
    @property
    def _best_meta_path(self) -> str:
        return os.path.join(self.directory, "best_metric.json")

    def best_record(self) -> Optional[dict]:
        """{'step': int, 'metric': float} of the retained best, or None."""
        try:
            with open(self._best_meta_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _best(self) -> ocp.CheckpointManager:
        if self._best_mgr is None:
            self._best_mgr = ocp.CheckpointManager(
                os.path.join(self.directory, "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, create=True),
            )
        return self._best_mgr

    def save_best(self, step: int, state: Any, metric: float) -> bool:
        """Retain `state` under <dir>/best iff `metric` beats the record.

        Returns True when the best slot was updated.  The metric survives
        restarts (best_metric.json), so a resumed run keeps comparing
        against the all-time best, not just this process's."""
        rec = self.best_record()
        if rec is not None and metric <= rec["metric"]:
            return False
        best = self._best()
        best.save(step, args=ocp.args.StandardSave(state))
        best.wait_until_finished()
        with open(self._best_meta_path, "w") as f:
            json.dump({"step": step, "metric": float(metric)}, f)
        return True

    def restore_best(self, template: Any) -> tuple[Any, int]:
        """Restore the best-by-metric checkpoint; (template, 0) if none."""
        rec = self.best_record()
        if rec is None:
            return template, 0
        best = self._best()
        restored = best.restore(
            rec["step"], args=ocp.args.StandardRestore(template))
        return restored, rec["step"]

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_eval(self, gen_params: Any, gen_stats: Any) -> tuple[Any, int]:
        """Restore ONLY the generator sub-tree of the newest checkpoint.

        Eval paths need gen params + batch stats, nothing else; a partial
        restore skips the optimizer moments (2x the param bytes) AND is
        robust to optimizer-state tree changes between the training run
        and the eval process — e.g. a checkpoint trained with the LR-decay
        schedule (whose optax state carries a schedule counter) evaluates
        fine from a default-config process, where a full StandardRestore
        would fail on the tree mismatch.

        Returns ({'params': ..., 'batch_stats': ...}, step); the untouched
        template variables and step 0 when nothing is saved yet."""
        step = self._mgr.latest_step()
        variables = {"params": gen_params, "batch_stats": gen_stats}
        if step is None:
            return variables, 0
        item = {"gen_params": gen_params, "gen_stats": gen_stats}
        restored = self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    item),
                partial_restore=True))
        return {"params": restored["gen_params"],
                "batch_stats": restored["gen_stats"]}, step

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
        if self._best_mgr is not None:
            self._best_mgr.close()
