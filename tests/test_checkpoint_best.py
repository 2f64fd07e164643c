"""Best-by-metric checkpoint retention (CheckpointManager.save_best).

The rolling latest-N window alone lets a long run silently regress past its
best eval score (the documented 11k-step demo case, docs/demo/README.md);
the best slot under <dir>/best must keep the highest-metric state across
saves AND across process restarts.
"""

import numpy as np

from blindshadowremoval_tpu.utils.checkpoint import CheckpointManager


def _state(scale: float) -> dict:
    return {"w": np.arange(4.0) * scale, "step": np.full((), scale, np.int32)}


def test_save_best_retains_max(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save_best(1, _state(1), 10.0)        # first always retained
    assert not mgr.save_best(2, _state(2), 9.0)     # worse: kept out
    assert mgr.save_best(3, _state(3), 11.5)        # better: replaces
    restored, step = mgr.restore_best(_state(0))
    assert step == 3
    assert np.allclose(restored["w"], np.arange(4.0) * 3)
    assert mgr.best_record() == {"step": 3, "metric": 11.5}
    mgr.close()

    # the record survives a restart: a fresh manager keeps comparing
    # against the all-time best, not this process's
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    assert not mgr2.save_best(4, _state(4), 11.0)
    restored, step = mgr2.restore_best(_state(0))
    assert step == 3
    mgr2.close()


def test_restore_best_empty(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    template = _state(0)
    restored, step = mgr.restore_best(template)
    assert step == 0 and restored is template
    mgr.close()
