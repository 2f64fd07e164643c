"""GAN training orchestrator (the reference's FSRNet, TPU-native).

Re-design of `FSRNet.__init__/train/train_step` (train_test_GSC.py:117-358):

  * one jitted train step fuses the on-device augmentation (saturation
    jitter, shadow compositing, mirror-consistency swap), generator +
    3-discriminator forward, the full loss stack, and both Adam updates —
    the reference splits augmentation between host numpy and tf.cond graph
    code;
  * parallelism: batches are sharded over the mesh "data" axis; XLA inserts
    the gradient all-reduce (the reference is single-device, batch 1);
  * randomness: a single PRNG key per step, folded per-sample — deterministic
    and resumable;
  * two optax Adam optimizers (lr 1e-4, eps 1e-7 to match Keras), generator
    and discriminators updated from separate losses within one step, exactly
    like the reference's dual GradientTape.

Loss assembly (train_test_GSC.py:287-336):
  g_total = recon * 400 + gan + perceptual * 0.005 + grad * 2
  d_total = hinge(real, 1) + hinge(fake, -1)  over 3 scales
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import freeze

from blindshadowremoval_tpu.config import Config
from blindshadowremoval_tpu.data.synthesis import (
    compose_shadow_image,
    derive_darkened_views,
)
from blindshadowremoval_tpu.models.discriminator import MultiScaleDiscriminators
from blindshadowremoval_tpu.models.generator import GSCGenerator
from blindshadowremoval_tpu.models.generator_rgb import RGBGenerator
from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator
from blindshadowremoval_tpu.models.vgg import VGG19Features, preprocess
from blindshadowremoval_tpu.ops.filters import find_edge
from blindshadowremoval_tpu.ops.image import adjust_saturation, flip_left_right, rgb_to_grayscale
from blindshadowremoval_tpu.train.losses import (
    hinge_loss,
    l1_loss,
    multi_scale_gradient_loss,
    reconstruction_losses,
    style_content_loss_pair,
)


_SHARED_TRAINERS: dict = {}   # Config -> Trainer (see Trainer.shared)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    gen_params: Any
    gen_stats: Any
    disc_params: Any
    disc_stats: Any
    vgg_params: Any                 # frozen
    gen_opt_state: Any
    disc_opt_state: Any


def build_generator(config: Config, axis_name: Optional[str] = None):
    dtype = jnp.dtype(config.compute_dtype)
    int8_head = getattr(config, "int8_head", False)
    s2d = getattr(config, "s2d_convs", False)
    head_scale = getattr(config, "int8_head_scale", 0.0)
    fold_bn = getattr(config, "fold_bn", False)
    egress = jnp.dtype(getattr(config, "egress_dtype", "float32"))
    if config.variant == "tsm":
        return TSMGenerator(n_res=config.n_res, axis_name=axis_name,
                            remat=config.remat, int8_head=int8_head,
                            int8_head_scale=head_scale, fold_bn=fold_bn,
                            s2d_convs=s2d, dtype=dtype, egress_dtype=egress)
    if config.variant == "rgb":
        return RGBGenerator(n_res=config.n_res, remat=config.remat,
                            fold_bn=fold_bn, s2d_convs=s2d, dtype=dtype,
                            egress_dtype=egress)
    return GSCGenerator(n_res=config.n_res, remat=config.remat,
                        int8_head=int8_head, int8_head_scale=head_scale,
                        int8_head_split=getattr(config, "int8_head_split",
                                                False),
                        fold_bn=fold_bn, s2d_convs=s2d, dtype=dtype,
                        egress_dtype=egress)


def init_generator_vars(config: Config, seed: int = 0) -> tuple:
    """(generator module, host-numpy init variables) for `config`.

    Everything — dummy-input creation included — runs under a host-CPU
    default device: eager Flax init on a (remote-)attached accelerator
    dispatches hundreds of small RPCs (the init_state docstring's
    measured ~4 min), and threefry is backend-deterministic so CPU init
    is bit-identical.  Leaves come back as numpy so they are
    placement-neutral as checkpoint-restore templates (CPU-committed
    jax.Arrays would pin downstream jits to the CPU backend).

    The shared template path for every generator-only consumer: the CLI's
    eval restore, serving benches, tools."""
    import contextlib

    import numpy as np

    gen = build_generator(config)
    try:
        _ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:                   # no CPU backend registered
        _ctx = contextlib.nullcontext()
    s = config.img_size
    b2 = config.batch_size * 2
    with _ctx:
        zi = jnp.zeros((b2, s, s, 3), jnp.float32)
        zr = jnp.zeros((b2, s, s, 6), jnp.float32)
        if config.variant == "tsm":
            gvars = gen.init(jax.random.PRNGKey(seed), zi, zi, zr, frame=2)
        else:
            gvars = gen.init(jax.random.PRNGKey(seed), zi, zi, zr)
    return gen, jax.tree.map(np.asarray, gvars)


@dataclasses.dataclass(eq=False)   # identity hash: instance is a static jit arg
class Trainer:
    """Owns model definitions, optimizers, and the jitted step.

    COMPILE-CACHE CAVEAT: because `self` is a static jit argument hashed by
    IDENTITY, each Trainer instance compiles its own train_step executable
    (one per `train` flag value).  Construct ONE Trainer per config and
    share it (evaluators already reuse `build_generator` rather than a
    second Trainer); a second instance with an equal config silently pays
    the full compile again — 2.5-10 min per step variant on a
    remote-attached TPU (docs/perf.md).
    """

    config: Config
    vgg_weights: Any = None          # optional pretrained VGG param tree

    @classmethod
    def shared(cls, config: Config, vgg_weights: Any = None) -> "Trainer":
        """Process-wide Trainer for `config`: constructs at most one.

        Because `self` is a static jit argument hashed by IDENTITY (see the
        class docstring), a second Trainer built from an equal config pays
        the full train_step compile again — 2.5-10 min per step variant on
        a remote-attached TPU.  This constructor makes reuse the default;
        explicit `vgg_weights` (an unhashable pytree) are cached by object
        identity — the cache entry keeps the weights alive, so the id
        cannot be recycled while the key exists.
        """
        key = (config, id(vgg_weights)) if vgg_weights is not None else config
        t = _SHARED_TRAINERS.get(key)
        if t is None:
            t = _SHARED_TRAINERS[key] = cls(config, vgg_weights)
        return t

    def __post_init__(self):
        cfg = self.config
        self.gen = build_generator(cfg)
        self.disc = MultiScaleDiscriminators(
            num_layers=cfg.n_layer_d, dtype=jnp.dtype(cfg.compute_dtype))
        self.vgg = VGG19Features(
            dtype=jnp.dtype(getattr(cfg, "vgg_dtype", "float32")))
        # LR: constant by default (the reference declares a 0.9-every-10-
        # epochs staircase + update_lr() but never invokes either,
        # train_test_GSC.py:41,48,162-164).  lr_decay_factor < 1.0 opts into
        # that declared schedule for real, as an optax staircase keyed on
        # the optimizer step count — same Adam state tree plus a schedule
        # counter, so it is NOT checkpoint-state-compatible with constant-LR
        # runs (start a fresh ckpt dir when flipping it).
        if getattr(cfg, "lr_decay_factor", 1.0) != 1.0:
            lr = optax.exponential_decay(
                init_value=cfg.learning_rate,
                transition_steps=max(
                    1, int(cfg.lr_decay_epochs * cfg.steps_per_epoch)),
                decay_rate=cfg.lr_decay_factor,
                staircase=True)
        else:
            lr = cfg.learning_rate
        self.gen_tx = optax.adam(lr, eps=1e-7)
        self.disc_tx = optax.adam(lr, eps=1e-7)

    # ------------------------------------------------------------- state
    def init_state(self, key: jax.Array) -> TrainState:
        """Build the initial TrainState ON HOST CPU.

        Eager Flax `init` dispatches hundreds of small ops; on a
        remote-attached accelerator each is an RPC round trip (measured
        ~4 minutes of wall before the first real step through the dev
        tunnel).  The init values are either overwritten by a checkpoint
        restore or uploaded in ONE bulk transfer by the first jitted step,
        so there is nothing to gain from initializing on the accelerator —
        and the threefry PRNG is backend-deterministic, so CPU init
        produces bit-identical parameters."""
        try:
            _cpu = jax.local_devices(backend="cpu")[0]
            _ctx = jax.default_device(_cpu)
        except RuntimeError:            # no CPU backend registered
            import contextlib

            _ctx = contextlib.nullcontext()
        with _ctx:
            state = self._init_state(key)
        # hand back HOST numpy leaves: CPU-resident jax.Arrays flow into
        # checkpoint-restore templates and would pin every downstream jit
        # (eval forwards, the fused UCB step) to the CPU backend via
        # committed-input device inference; numpy is placement-neutral
        import numpy as np

        return jax.tree.map(np.asarray, state)

    def _init_state(self, key: jax.Array) -> TrainState:
        cfg = self.config
        s = cfg.img_size
        b2 = cfg.batch_size * 2
        kg, kd, kv = jax.random.split(key, 3)
        img = jnp.zeros((b2, s, s, 3), jnp.float32)
        uv = jnp.zeros((b2, s, s, 3), jnp.float32)
        reg = jnp.zeros((b2, s, s, 6), jnp.float32)

        if cfg.variant == "tsm":
            gvars = self.gen.init(kg, img, uv, reg, frame=2)
        else:
            gvars = self.gen.init(kg, img, uv, reg)
        dvars = self.disc.init(kd, jnp.zeros((2 * b2, s, s, 6), jnp.float32))
        if self.vgg_weights is not None:
            vparams = freeze(self.vgg_weights)["params"]
        else:
            if cfg.mode == "train":
                import sys

                print(
                    "WARNING: no pretrained VGG-19 weights supplied — the "
                    "perceptual loss uses a RANDOM-init backbone (a valid "
                    "random-projection feature loss, but NOT the "
                    "reference's ImageNet-VGG loss). Convert the Keras h5 "
                    "with tools/convert_vgg_weights.py and pass "
                    "--vgg-weights / Trainer.shared(cfg, vgg_weights).",
                    file=sys.stderr, flush=True)
            vparams = self.vgg.init(
                kv, jnp.zeros((1, s, s, 3), jnp.float32))["params"]

        return TrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gvars["params"],
            gen_stats=gvars.get("batch_stats", {}),
            disc_params=dvars["params"],
            disc_stats=dvars.get("batch_stats", {}),
            vgg_params=vparams,
            gen_opt_state=self.gen_tx.init(gvars["params"]),
            disc_opt_state=self.disc_tx.init(dvars["params"]),
        )

    # ------------------------------------------------------- augmentation
    def _saturation_aug(self, key, gt, img_dark):
        """Per-pair random saturation (train_test_GSC.py:220-238):
        one gate per pair, independent factors for gt vs dark twin."""
        b2 = gt.shape[0]
        groups = b2 // 2
        gtg = gt.reshape((groups, 2) + gt.shape[1:])
        dkg = img_dark.reshape((groups, 2) + img_dark.shape[1:])
        keys = jax.random.split(key, groups)

        def per_group(k, g, d):
            k1, k2, k3 = jax.random.split(k, 3)
            rd = jax.random.uniform(k1)
            fg = jax.random.uniform(k2, (), minval=0.5, maxval=2.0)
            fd = jax.random.uniform(k3, (), minval=0.5, maxval=2.0)
            g = jnp.where(rd > 0.5, g, adjust_saturation(g, fg))
            d = jnp.where(rd > 0.5, d, adjust_saturation(d, fd))
            return g, d

        gtg, dkg = jax.vmap(per_group)(keys, gtg, dkg)
        return gtg.reshape(gt.shape), dkg.reshape(img_dark.shape)

    def _mirror_consistency(self, key, img):
        """65%: replace each pair with (view0, flip(view0))
        (train_test_GSC.py:240-250)."""
        left = img[0::2]
        right = flip_left_right(left)
        img0 = jnp.stack([left, right], axis=1).reshape(img.shape)
        return jnp.where(jax.random.uniform(key) > 0.35, img0, img)

    # -------------------------------------------------------------- step
    @functools.partial(jax.jit, static_argnames=("self", "train"))
    def train_step(self, state: TrainState, batch: dict, key: jax.Array,
                   train: bool = True):
        """One fused G+D step.  `batch` keys: img_dark, gt [B2,S,S,3],
        mask, face [B2,S,S,1], uv [B2,S,S,3], reg [B2,S,S,6].

        [0,1]-bounded image planes may arrive as uint16 fixed-point
        (config.compact_ingress wire format, loop._next_batch): the train
        batch is the dominant host->device transfer (118 MB/step at batch
        32 in f32, docs/perf.md "fit() end-to-end"), and the 1/65535
        quantization step is far below the bf16 compute noise.  Dequantize
        in-graph — dtype is part of the jit signature, so the f32 path
        compiles without this code."""
        batch = {k: (v.astype(jnp.float32) / 65535.0
                     if v.dtype == jnp.uint16 else
                     v.astype(jnp.float32) / 255.0
                     if v.dtype == jnp.uint8 else v)
                 for k, v in batch.items()}
        cfg = self.config
        if "img_dark" not in batch:
            # config.device_darken wire: the parser shipped the RAW crop;
            # derive the jittered (gt, img_dark) pair in-graph, one draw
            # per mirrored pair like the host parser
            key, k_dark = jax.random.split(key)
            gt_j, dark_j = derive_darkened_views(k_dark, batch["gt"])
            batch = {**batch, "gt": gt_j, "img_dark": dark_j}
        k_sat, k_comp, k_mirror, k_share = jax.random.split(key, 4)
        # TSM: frame=1 with a random share gate during training, always-on
        # share in the val pass (train_with_TSM.py:216-221)
        if train:
            share = jax.random.uniform(k_share) > 0.5
        else:
            share = jnp.asarray(True)

        gt = batch["gt"]
        img_dark = batch["img_dark"]
        if train:
            gt, img_dark = self._saturation_aug(k_sat, gt, img_dark)

        if "lm" in batch:
            # device_geometry: rasterize UV/offset/face maps in-graph from
            # landmarks + host-extracted Delaunay topologies
            from blindshadowremoval_tpu.geometry.triangulation import (
                device_geometry_maps,
            )

            maps = device_geometry_maps(
                batch["lm"], batch["face_pts"], batch["uv_tris"],
                batch["face_tris"], batch["reg_tris"], cfg.img_size)
            uv, reg, face = maps["uv"], maps["reg"], maps["face"]
            # the devgeo loader ships the occluder mask UNGATED (no host
            # face rasterization); gate by the in-graph face here —
            # identical numerics to the host path's canvas * face
            # (utils.py:1013)
            ext_mask = batch["mask"] * face
        else:
            uv, reg, face = batch["uv"], batch["reg"], batch["face"]
            ext_mask = batch["mask"]

        img, mask_sv, _ = compose_shadow_image(
            k_comp, ext_mask, gt, img_dark, face)
        if train:
            img = self._mirror_consistency(k_mirror, img)
        else:
            img = gt                           # val pass (train_test_GSC.py:252)
        mask_bi = (mask_sv > 0.01).astype(jnp.float32)
        mask_edge = find_edge(mask_sv)
        gray_gt = rgb_to_grayscale(gt)

        mutable = ["batch_stats"] if train else False

        # ---------------- generator loss ------------------------------
        def g_loss_fn(gen_params):
            gvars = {"params": gen_params, "batch_stats": state.gen_stats}
            if cfg.variant == "tsm":
                out = self.gen.apply(gvars, img, uv, reg, frame=1,
                                     share=share, train=train,
                                     mutable=mutable)
            else:
                out = self.gen.apply(gvars, img, uv, reg,
                                     train=train, mutable=mutable)
            out, new_gen_stats = (
                out if train else (out, {"batch_stats": state.gen_stats}))
            if cfg.variant == "rgb":
                # single-branch ablation: direct RGB output, no grayscale
                # head (train_RGB_test.py: recon = recon_c only)
                rgb = out
                gs = rgb_to_grayscale(rgb)
                mask22 = jnp.zeros_like(rgb)
                dif = gs - rgb_to_grayscale(img)
            else:
                gs, rgb, mask22, dif = out

            d_img = jnp.concatenate([gt, rgb], axis=0)
            d_mask = jnp.concatenate([mask_sv, mask_sv], axis=0)
            d_in = jnp.concatenate([d_img, d_mask], axis=3)
            d_outs, _ = self.disc.apply(
                {"params": state.disc_params, "batch_stats": state.disc_stats},
                d_in, train=train, mutable=["batch_stats"])

            recon_gs, recon_c = reconstruction_losses(
                gs, rgb, gt, gray_gt, mask_bi, mask_edge)
            if cfg.variant == "rgb":
                recon = recon_c
            else:
                recon = (recon_gs + recon_c) / 2.0
            gan = -sum(jnp.mean(fake) for _, fake in d_outs)
            # real/fake VGG taps computed separately (identical numerics to
            # the concat form, utils.py:104-114) so the real half runs under
            # stop_gradient and XLA skips its VGG backward — the perceptual
            # pass is the largest FLOP block of the step
            feats_real = self.vgg.apply(
                {"params": state.vgg_params},
                preprocess(jax.lax.stop_gradient(gt)))
            feats_fake = self.vgg.apply({"params": state.vgg_params},
                                        preprocess(rgb))
            per = style_content_loss_pair(feats_real, feats_fake)
            grad_l = multi_scale_gradient_loss(rgb, gt, mask_bi, mask_edge)
            total = recon * 400.0 + gan + per * 0.005 + grad_l * 2.0

            aux = {
                "rgb": rgb, "gs": gs, "mask22": mask22, "dif": dif,
                "new_gen_stats": new_gen_stats["batch_stats"],
                "losses": {
                    "recon_gs": recon_gs, "recon_c": recon_c,
                    "grad": grad_l, "gen": gan, "per": per,
                    "mask": l1_loss(mask22, mask_bi),
                },
            }
            return total, aux

        if train:
            (g_total, g_aux), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.gen_params)
        else:
            g_total, g_aux = g_loss_fn(state.gen_params)
            g_grads = None

        fake = jax.lax.stop_gradient(g_aux["rgb"])

        # ---------------- discriminator loss --------------------------
        def d_loss_fn(disc_params):
            d_img = jnp.concatenate([gt, fake], axis=0)
            d_mask = jnp.concatenate([mask_sv, mask_sv], axis=0)
            d_in = jnp.concatenate([d_img, d_mask], axis=3)
            out = self.disc.apply(
                {"params": disc_params, "batch_stats": state.disc_stats},
                d_in, train=train, mutable=mutable)
            d_outs, new_disc_stats = (
                out if train else (out, {"batch_stats": state.disc_stats}))
            d_loss_r = sum(hinge_loss(r, 1.0) for r, _ in d_outs)
            d_loss_s = sum(hinge_loss(f, -1.0) for _, f in d_outs)
            return d_loss_r + d_loss_s, {
                "d_real": d_loss_r, "d_fake": d_loss_s,
                "new_disc_stats": new_disc_stats["batch_stats"],
            }

        if train:
            (d_total, d_aux), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.disc_params)
            g_updates, gen_opt_state = self.gen_tx.update(
                g_grads, state.gen_opt_state, state.gen_params)
            d_updates, disc_opt_state = self.disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params)
            state = state.replace(
                step=state.step + 1,
                gen_params=optax.apply_updates(state.gen_params, g_updates),
                gen_stats=g_aux["new_gen_stats"],
                disc_params=optax.apply_updates(state.disc_params, d_updates),
                disc_stats=d_aux["new_disc_stats"],
                gen_opt_state=gen_opt_state,
                disc_opt_state=disc_opt_state,
            )
        else:
            d_total, d_aux = d_loss_fn(state.disc_params)

        losses = dict(g_aux["losses"])
        losses["disc_real"] = d_aux["d_real"]
        losses["disc_fake"] = d_aux["d_fake"]
        figs = {"img": img, "gt": gt, "pred": g_aux["rgb"],
                "gs": g_aux["gs"], "mask_edge": mask_edge}
        return state, losses, figs
