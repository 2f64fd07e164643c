"""The epoch-level training loop.

Re-design of `FSRNet.train` (train_test_GSC.py:166-197): restore-or-init
from the latest checkpoint, `max_epoch` epochs of `steps_per_epoch` train
steps, a val pass of steps/10 with `train=False`, checkpoint per epoch.
Batches stream from the host thread-pool loader; each step is one fused
jitted G+D update.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp

from blindshadowremoval_tpu.config import Config
from blindshadowremoval_tpu.train.trainer import Trainer
from blindshadowremoval_tpu.utils.checkpoint import CheckpointManager
from blindshadowremoval_tpu.utils.logging import TrainLogger


# [0,1]-bounded planes shipped as uint16 fixed-point under
# config.compact_ingress (train wire format; the step dequantizes in-graph)
_COMPACT_KEYS = ("img_dark", "gt", "mask")


def _next_batch(feed, batch_size: int, compact: bool = False,
                u8: bool = False) -> dict:
    """Assemble `batch_size` parsed samples (2 mirrored views each) into one
    [2*batch_size, ...] batch. The reference trains with batch 1 (one
    mirrored pair, train_test_GSC.py:43); larger sizes stack pairs.

    `compact=True` ships the [0,1]-bounded image planes as uint16
    fixed-point — the train batch is the dominant host->device transfer on
    remote-attached chips (docs/perf.md "fit() end-to-end"); quantization
    step 1/65535, dequantized in the jitted step.

    CONTRACT: the compact wire CLAMPS `gt`/`img_dark` to [0,1] — a
    deliberate change vs the reference's unclipped feed, whose CTM
    extrapolations reach ~[-0.25, 1.3] (utils.py:497-527).  The clamp is
    stability-load-bearing: unclamped excursions destabilize the bf16 train
    step within ~10 steps at batch 32 (NaN) where the clamped wire is
    measured stable (data/synthesis.py:derive_darkened_views carries the
    same clamp for the same reason, so every ingress variant trains on the
    identical display-range distribution).  Covered incl. out-of-range
    inputs by tests/test_trainer.py::test_compact_ingress_train_step.

    `u8=True` (config.ingress_u8, requires `compact`) quantizes at 1/255
    instead of 1/65535 — the source images are 8-bit PNGs, so this sits at
    the source quantization; measured loss deltas in docs/perf.md."""
    import numpy as np

    views = [next(feed) for _ in range(batch_size)]
    if batch_size == 1:
        out = {k: np.asarray(v) for k, v in views[0].items()}
    else:
        out = {k: np.concatenate([np.asarray(v[k]) for v in views], axis=0)
               for k in views[0]}
    if compact:
        scale, dtype = (255.0, np.uint8) if u8 else (65535.0, np.uint16)
        for k in _COMPACT_KEYS:
            if k in out:
                out[k] = np.round(
                    np.clip(out[k], 0.0, 1.0) * scale).astype(dtype)
    return {k: jnp.asarray(v) for k, v in out.items()}


class _BatchPrefetcher:
    """One-thread double buffer for the fit() inner loop: host-parse AND
    host->device upload of batch i+1 overlap step i's device execution.

    `jnp.asarray` inside `_next_batch` starts the transfer; on a
    remote-attached chip the upload is the dominant per-step cost
    (docs/perf.md "fit() end-to-end"), and without this buffer it
    serializes with the device step.  `depth` bounds device-resident
    staged batches (depth 1 = classic double buffering; more buys nothing
    once the link is saturated but holds extra HBM)."""

    def __init__(self, feed, batch_size: int, compact: bool, u8: bool,
                 depth: int = 1):
        import queue
        import threading

        self._queue_mod = queue
        self._q = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()

        def work():
            while not self._stop.is_set():
                try:
                    b = _next_batch(feed, batch_size, compact=compact, u8=u8)
                except BaseException as e:        # surface on the consumer
                    self._q.put(e)
                    return
                while not self._stop.is_set():
                    try:
                        self._q.put(b, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=work, daemon=True,
                                        name="bsr-batch-prefetch")
        self._thread.start()

    def __next__(self) -> dict:
        b = self._q.get()
        if isinstance(b, BaseException):
            raise b
        return b

    def close(self) -> None:
        self._stop.set()
        # drain so a put-blocked worker can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except self._queue_mod.Empty:
            pass
        self._thread.join(timeout=5.0)


class _UCBProbe:
    """Per-epoch UCB-subset quality probe for best-checkpoint selection.

    A tiny version of the real UCB eval (the reference's `test()`,
    train_test_GSC.py:360-748): `n_images` anchor images at `eval_views=1`
    through the fused single-device-call eval step, mean PSNR out.  Eval
    batches and part masks are parsed once and cached; the evaluator (and
    so the fused jitted step) is built once and only its variables swap per
    epoch — the probe costs one compile on first use, then ~n_images
    device calls per epoch.
    """

    metric_name = "PSNR"
    metric_unit = "dB"

    def __init__(self, config: Config, n_images: int = 20):
        from blindshadowremoval_tpu.data.dataset import Dataset
        from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator

        probe_cfg = dataclasses.replace(
            config, mode="ucb", eval_views=1, fold_bn=False,
            int8_head=False, egress_dtype="float32")
        if not probe_cfg.data_dirs_test or not probe_cfg.part_mask_root:
            raise ValueError(
                "select_best needs config.data_dirs_test (UCB input glob) "
                "and config.part_mask_root (the UCB_input_images_* parent) "
                "to run the quality probe")
        ds = Dataset(probe_cfg, "test")
        self._ev = UCBEvaluator(probe_cfg, variables=None)
        self._batches = []
        it = iter(ds)
        for i in range(min(n_images, len(ds.name_list))):
            batch, box, name = next(it)
            # name-keyed mask pairing (the run() default): a misordered
            # mask dir must fail loudly, not silently skew the probe
            parts = self._ev._load_part_masks(probe_cfg.part_mask_root, i,
                                              sample_name=name)
            self._batches.append((batch, box, name, parts))

    def __call__(self, state) -> float:
        self._ev.variables = {"params": state.gen_params,
                              "batch_stats": state.gen_stats}
        psnrs = [self._ev.run_one_fused(b, box, name, parts)["psnr"]
                 for b, box, name, parts in self._batches]
        return float(sum(psnrs) / len(psnrs))


class _SFWProbe:
    """Per-epoch SFW shadow-segmentation AUC probe for best-checkpoint
    selection — the quality axis the reference's TSM variant is actually
    evaluated on (testsfw pixel ROC-AUC of the predicted shadow map against
    `*_label.png` class 2, train_with_TSM.py:619-707).

    Frames parse once from an SFW-contract directory (config.data_dirs_test;
    tools/make_sfw_eval_set.py synthesizes one with exact labels) and cache;
    per epoch only the shared evaluator's variables swap, so each probe is
    one jitted forward + one on-device AUC per frame — no metric-irrelevant
    SSIM/figure work from SFWEvaluator.run_one.
    """

    metric_name = "AUC"
    metric_unit = ""

    def __init__(self, config: Config, n_images: int = 20):
        from blindshadowremoval_tpu.data.dataset import Dataset
        from blindshadowremoval_tpu.eval.evaluators import SFWEvaluator

        probe_cfg = dataclasses.replace(
            config, mode="sfw", fold_bn=False, int8_head=False,
            int8_head_split=False, egress_dtype="float32")
        if not probe_cfg.data_dirs_test:
            raise ValueError(
                "select_best with probe_metric='auc' needs "
                "config.data_dirs_test pointing at an SFW-format directory "
                "glob (tools/make_sfw_eval_set.py builds one with exact "
                "synthesized labels)")
        ds = Dataset(probe_cfg, "test", dset="sfw")
        if not ds.name_list:
            raise ValueError(
                f"no SFW frames ({probe_cfg.data_dirs_test!r} matched "
                "nothing with the <frame>_label.png contract)")
        self._ev = SFWEvaluator(probe_cfg, variables=None)
        it = iter(ds)
        self._batches = [next(it)
                         for _ in range(min(n_images, len(ds.name_list)))]
        from blindshadowremoval_tpu.ops.auc import roc_auc_with_sentinels

        self._auc = jax.jit(roc_auc_with_sentinels)

    def __call__(self, state) -> float:
        import numpy as np

        self._ev.variables = {"params": state.gen_params,
                              "batch_stats": state.gen_stats}
        aucs = []
        for batch, _box, _name in self._batches:
            _, _, _, mask_pred, face = self._ev.forward(
                batch, frame=2, share=True)
            shadow_gt = (np.asarray(batch["label"][0]) == 2
                         ).astype(np.float32)
            aucs.append(float(self._auc(jnp.asarray(shadow_gt),
                                        jnp.asarray(mask_pred[0] * face[0]))))
        return float(sum(aucs) / len(aucs))


def fit(config: Config, dataset_train, dataset_val=None,
        trainer: Optional[Trainer] = None, seed: int = 0,
        select_best: bool = False, probe_images: int = 20,
        probe_metric: str = "psnr"):
    """Run the full training schedule; returns the final TrainState.

    With `select_best=True`, every epoch additionally runs a UCB-subset
    quality probe (`probe_images` images, eval_views=1, fused eval) and
    retains the best-by-PSNR checkpoint under `<checkpoint_dir>/best`
    (CheckpointManager.save_best) — so a long run cannot silently regress
    past its best eval score while train losses keep improving (the
    documented 11k-step case, docs/demo/README.md)."""
    trainer = trainer or Trainer.shared(config)
    key = jax.random.PRNGKey(seed)
    state = trainer.init_state(key)

    mgr = CheckpointManager(config.checkpoint_dir)
    state, last_epoch = mgr.restore_latest(state)
    print("**********************************************************")
    print(f"Restore from Epoch {last_epoch}")
    print("**********************************************************")

    log = TrainLogger(config.checkpoint_dir, config.img_log_freq,
                      config.txt_log_freq, config.fig_size)
    feed = iter(dataset_train)
    feed_val = iter(dataset_val) if dataset_val is not None else None
    # build the probe eagerly so a misconfigured select_best fails before
    # the first epoch, not after it (batches parse on host; the fused eval
    # step compiles at the first probe call)
    probe = None
    if select_best:
        if probe_metric not in ("psnr", "auc"):
            raise ValueError(f"probe_metric must be 'psnr' or 'auc', got "
                             f"{probe_metric!r}")
        probe = (_SFWProbe if probe_metric == "auc"
                 else _UCBProbe)(config, probe_images)

    # the loop owns the state exclusively, so donate it: the old TrainState
    # (~250 MB of params + Adam moments) is reused in place instead of
    # copied every step.  (Trainer.train_step itself does not donate —
    # callers that reuse a state after stepping, e.g. tests, stay valid.)
    raw_step = type(trainer).train_step.__wrapped__
    step_fn = jax.jit(functools.partial(raw_step, trainer),
                      static_argnames=("train",),
                      donate_argnames=("state",))

    # double buffer: batch i+1's host parse + upload overlap step i's
    # device execution (the upload dominates on remote-attached chips)
    prefetch = _BatchPrefetcher(
        feed, config.batch_size, compact=config.compact_ingress,
        u8=getattr(config, "ingress_u8", False))
    try:
        for epoch in range(last_epoch, config.max_epoch):
            t0 = time.time()
            for step in range(config.steps_per_epoch):
                batch = next(prefetch)
                key, sub = jax.random.split(key)
                state, losses, figs = step_fn(state, batch, sub, train=True)
                # fetching losses synchronizes the device; throttle on TPU
                # via config.log_every_steps (figure dumps keep their own
                # schedule)
                if step % config.log_every_steps == 0:
                    log.display(losses, epoch, step, True,
                                config.steps_per_epoch)
                    log.save_figures([figs["img"], figs["gt"], figs["pred"],
                                      figs["gs"], figs["mask_edge"]], True)

            mgr.save(epoch + 1, state)
            if probe is not None:
                p = probe(state)
                updated = mgr.save_best(epoch + 1, state, p)
                rec = mgr.best_record()
                print(f"probe: {len(probe._batches)}-image mean "
                      f"{probe.metric_name} {p:.4f} "
                      f"{probe.metric_unit}".rstrip()
                      + (" -> new best retained" if updated else
                         f" (best {rec['metric']:.4f} @ epoch "
                         f"{rec['step']})"))
            if feed_val is not None:
                for step in range(config.steps_per_epoch // 10):
                    batch = _next_batch(feed_val, config.batch_size,
                                        compact=config.compact_ingress,
                                        u8=getattr(config, "ingress_u8",
                                                   False))
                    key, sub = jax.random.split(key)
                    # the eval step returns the state unchanged; rebind it
                    # (the input buffers were donated)
                    state, losses, figs = step_fn(state, batch, sub,
                                                  train=False)
                    log.display(losses, epoch, step, False,
                                config.steps_per_epoch // 10)
                    log.save_figures([figs["img"], figs["gt"], figs["pred"]],
                                     False)
            print(f"\n*****Time for epoch {epoch + 1} is "
                  f"{int(time.time() - t0)} sec*****")
    finally:
        prefetch.close()

    mgr.close()
    return state
