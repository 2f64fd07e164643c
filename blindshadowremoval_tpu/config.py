"""Configuration system.

The reference configures everything through a Python class of UPPERCASE
constants edited in-source (train_test_GSC.py:18-79; variant selection is
literally "edit the source", README.md:46-58).  Here configuration is a frozen
dataclass with named presets selectable from code or CLI, so every mode the
reference supports (`train`, `ucb`, `sfw`, `sfw_video`, `in_the_wild`) is one
function call.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class Config:
    """Hyper-parameters and paths.

    Field defaults mirror the reference `Config` (train_test_GSC.py:18-53)
    where a counterpart exists; TPU-specific fields are new.
    """

    # --- data -----------------------------------------------------------
    data_dirs: Sequence[str] = ()
    data_dirs_val: Sequence[str] = ()
    data_dirs_test: Sequence[str] = ("sample_imgs/*",)
    shadow_mask_dir: str = ""          # library of external shadow PNGs (ShadowMaker)
    part_mask_root: str = ""           # UCB_input_images_* directories for UCB eval

    # --- geometry -------------------------------------------------------
    img_size: int = 256                # IMG_SIZE (train_test_GSC.py:31)
    map_size: int = 32                 # MAP_SIZE — bottleneck feature resolution
    fig_size: int = 128                # FIG_SIZE — logging figure resolution

    # --- schedule -------------------------------------------------------
    steps_per_epoch: int = 2000        # train_test_GSC.py:35
    max_epoch: int = 300               # train_test_GSC.py:38
    batch_size: int = 1                # per-view batch; each sample carries 2 mirrored views
    learning_rate: float = 1e-4        # train_test_GSC.py:47
    lr_decay_factor: float = 1.0       # staircase LR decay (1.0 = constant).
                                       # The reference declares the schedule
                                       # (LEARNING_RATE_DECAY_FACTOR=0.9,
                                       # NUM_EPOCHS_PER_DECAY=10 and an
                                       # update_lr() helper,
                                       # train_test_GSC.py:41,48,162-164) but
                                       # never calls it; here it is a real,
                                       # tested opt-in (see train/trainer.py)
    lr_decay_epochs: float = 10.0      # epochs between decay steps
                                       # (train_test_GSC.py:41)
    img_log_freq: int = 100            # IMG_LOG_FR
    txt_log_freq: int = 1000           # TXT_LOG_FR
    log_every_steps: int = 1           # loss-fetch cadence; raise on TPU so
                                       # the device pipeline is not synced
                                       # every step (reference prints per
                                       # step, utils.py:152-171)

    # --- model ----------------------------------------------------------
    eval_views: int = 10               # views per UCB/in-the-wild eval sample
                                       # (anchor + eval_views-1 random refs,
                                       # dataset.py:148-302).  The refs only
                                       # influence TSM (cross-view sharing);
                                       # for gsc/rgb, eval_views=1 gives
                                       # statistically equivalent metrics at
                                       # ~10x less parse+forward work/image
    n_layer_d: int = 4                 # discriminator depth (train_test_GSC.py:53)
    n_res: int = 6                     # ResBottleneck count in the generator
    variant: str = "gsc"               # 'gsc' | 'tsm' | 'rgb'

    # --- tpu ------------------------------------------------------------
    mesh_shape: Sequence[int] = (1, 1)     # (data, frame) mesh axes
    mesh_axis_names: Sequence[str] = ("data", "frame")
    compute_dtype: str = "bfloat16"        # activations/matmul dtype on TPU
    vgg_dtype: str = "bfloat16"            # perceptual-backbone dtype.
                                           # Measured single-step effect of
                                           # bf16 vs f32: only the `per`
                                           # loss moves, by 0.018% (2e-7 of
                                           # the weighted total) — far
                                           # inside training noise, for
                                           # -7..15% step time.  Set
                                           # "float32" to reproduce the
                                           # TF-parity-validated numerics
                                           # exactly.
    remat: bool = False                    # rematerialize bottleneck blocks in training
    int8_head: bool = False                # serve the 7x7 output head int8
                                           # (~+11% e2e; parity figures in
                                           # docs/perf.md)
    int8_head_scale: object = 0.0          # static activation bound(s) for
                                           # the int8 head.  0.0 = AUTO:
                                           # derive per-channel bounds from
                                           # the restored checkpoint's own
                                           # BatchNorm statistics at restore
                                           # time (ops/calibration.py) — the
                                           # default every restore path uses.
                                           # tuple = explicit per-channel
                                           # bounds; float > 0 = one scalar
                                           # bound; < 0 = dynamic per-sample
                                           # max (costs an extra bandwidth
                                           # pass; ops/quant.py)
    int8_head_split: bool = False          # split-precision head: int8 for
                                           # the `con` offset channel only,
                                           # compute_dtype for the tanh-gain
                                           # channel that feeds the dif>0.1
                                           # binarization.  Measured — see
                                           # docs/perf.md "Quality context"
    s2d_convs: bool = False                # compute the lane-starved 7x7
                                           # convs (conv1, output heads) via
                                           # 2x2 space-to-depth (identical
                                           # math, 4x MXU lane use).  MEASURED
                                           # SLOWER on v5e inference (3762 vs
                                           # 4050 faces/s: XLA's own lowering
                                           # + the repack overhead win at
                                           # these shapes) — kept as a tested
                                           # option for other hw/shapes.
    fold_bn: bool = False                  # serving: fold every eval-mode
                                           # BatchNorm into its conv's
                                           # kernel/bias (models/folding.py)
                                           # — identical math, fewer
                                           # elementwise HBM passes.  The
                                           # restore paths fold the restored
                                           # variables automatically when set.
                                           # Serving-only: training needs
                                           # live statistics.
    egress_dtype: str = "float32"          # dtype of the generator's returned
                                           # images.  "bfloat16" halves the
                                           # output HBM writes for serving;
                                           # the f32 default preserves the
                                           # evaluators' TF-parity numerics.
    device_darken: bool = False            # derive the jittered (gt,
                                           # img_dark) pair in the jitted
                                           # train step instead of on host
                                           # (synthesis.derive_darkened_
                                           # views): drops img_dark from
                                           # the host->device wire and the
                                           # per-sample host tone-curve
                                           # work.  Distributional parity:
                                           # same draws, device PRNG stream
                                           # — EXCEPT that the derived pair
                                           # is clamped to [0,1] (CTM
                                           # extrapolations reach ~[-0.25,
                                           # 1.3] unclamped), matching the
                                           # compact_ingress wire's clamp;
                                           # with compact_ingress=False the
                                           # host f32 path stays unclamped,
                                           # so that one combination
                                           # differs from host darkening by
                                           # the clamp (stability-load-
                                           # bearing in bf16, synthesis.py)
    device_geometry: bool = False          # rasterize UV/offset/face maps
                                           # in-graph from landmarks instead
                                           # of on the host (train pipeline)
    compact_ingress: bool = False          # ship [0,1] eval view arrays to
                                           # the device as uint16 fixed-point
                                           # (dequantized in-graph) instead
                                           # of f32 — 2x less host->device
                                           # traffic, which dominates eval
                                           # wall time on a remote-attached
                                           # chip.  Quantization step 1/65535
                                           # is far below the bf16 compute
                                           # noise; metrics move < 0.001 dB.
                                           # Off at the library surface (an
                                           # ingress contract change); the
                                           # CLI eval commands enable it.
    ingress_u8: bool = False               # with compact_ingress: ship the
                                           # [0,1] train image planes as
                                           # uint8 (1/255 fixed point)
                                           # instead of uint16 — half the
                                           # remaining wire again.  The
                                           # source images are 8-bit PNGs,
                                           # so 1/255 sits at the source
                                           # quantization; measured loss
                                           # deltas vs the u16 wire in
                                           # docs/perf.md "fit() end-to-
                                           # end".  CLI train default; the
                                           # library surface stays u16.
    param_dtype: str = "float32"
    checkpoint_dir: str = "./checkpoints"
    mode: str = "in_the_wild"

    @property
    def num_views(self) -> int:
        """Views packed per sample (2 mirrored train views; eval_views at test)."""
        return 2 if self.mode == "train" else self.eval_views


_PRESETS = {
    # In-the-wild single-image inference (reference: testFFHQ, README.md:31-35).
    "in_the_wild": dict(mode="in_the_wild"),
    # UCB quantitative eval with part-mask post-processing
    # (reference: test(), train_test_GSC.py:360-748).
    "ucb": dict(mode="ucb", part_mask_root="."),
    # SFW shadow-segmentation eval (reference: testsfw, train_test_GSC.py:750-838).
    "sfw": dict(mode="sfw", variant="tsm"),
    # SFW per-frame video removal (reference: testsfw_video).
    "sfw_video": dict(mode="sfw_video", variant="tsm"),
    # GAN training (reference: train(), train_test_GSC.py:166-197).
    "train": dict(mode="train"),
}


def get_config(preset: str = "in_the_wild", **overrides) -> Config:
    """Build a config from a named preset plus keyword overrides."""
    if preset not in _PRESETS:
        raise ValueError(f"unknown preset {preset!r}; choose from {sorted(_PRESETS)}")
    kwargs = dict(_PRESETS[preset])
    kwargs.update(overrides)
    return Config(**kwargs)
