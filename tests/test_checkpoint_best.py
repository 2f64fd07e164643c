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


def test_restore_eval_is_partial_and_optimizer_agnostic(tmp_path):
    """restore_eval pulls ONLY gen params+stats from a full TrainState
    checkpoint — including one whose optimizer state tree differs from the
    current process's (e.g. trained with the LR-decay schedule, whose
    optax state carries a schedule counter a default config lacks)."""
    import jax.numpy as jnp
    import optax

    from blindshadowremoval_tpu.train.trainer import TrainState

    gen_params = {"conv": {"kernel": np.arange(6.0).reshape(2, 3)}}
    # schedule-bearing optimizer: state tree has a ScaleByScheduleState
    # counter that a constant-LR process's template would not
    tx = optax.adam(optax.exponential_decay(1e-4, 10, 0.9, staircase=True))
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_stats={"bn": {"mean": np.ones(3)}},
        disc_params={"d": np.zeros(2)},
        disc_stats={},
        vgg_params={"v": np.zeros(1)},
        gen_opt_state=tx.init(gen_params),
        disc_opt_state=optax.adam(1e-4).init({"d": np.zeros(2)}),
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state, wait=True)
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    variables, step = mgr2.restore_eval(
        {"conv": {"kernel": np.zeros((2, 3))}},
        {"bn": {"mean": np.zeros(3)}})
    assert step == 7
    np.testing.assert_array_equal(variables["params"]["conv"]["kernel"],
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(variables["batch_stats"]["bn"]["mean"],
                                  np.ones(3))
    mgr2.close()

    # empty dir: the untouched template comes back at step 0
    mgr3 = CheckpointManager(str(tmp_path / "empty"))
    v0, s0 = mgr3.restore_eval({"w": np.zeros(2)}, {})
    assert s0 == 0 and np.all(v0["params"]["w"] == 0)
    mgr3.close()
