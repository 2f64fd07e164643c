"""Single-device-call UCB evaluation step.

The host-orchestrated UCB pipeline (eval/postprocess.py) pays 4+ device
round trips per image — forward, label_components, filter_components,
metrics — which dominates eval wall-clock on a remote-attached TPU
(~3 s/image through the tunnel, docs/perf.md).  This module fuses the whole
per-image computation into ONE jitted function:

    forward -> dynamic resize/pad into the crop box -> face gating ->
    mustache/mouth suppression -> spatially-varying threshold (with the
    data-dependent band gates as in-graph selects) -> connected components
    -> hair veto -> nose veto -> composite -> PSNR/SSIM

Everything data-dependent that the reference computes with host `if`s on
scalars derived from mask_pred (train_test_GSC.py:541-663) is expressed as
`jnp.where` on traced booleans — same numerics, no host sync.  Geometry
that depends only on the part masks (bounding boxes, region rectangles) is
precomputed on host by `prep_part_inputs` — it is input data, not control
flow.

The crop-box resize (`tf.image.resize(x, [size, size])` + pad to 256,
train_test_GSC.py:438-476) has a data-dependent SIZE; with static shapes it
becomes out = A @ x @ A^T where A is a 256x256 bilinear sampling matrix
built in-graph from the traced scalar `size` (rows >= size are zero — the
pad).  That reformulation keeps XLA shapes static and runs on the MXU.

Parity: tests/test_fused_eval.py checks the fused step against the
host-orchestrated pipeline on the reference-golden images — identical
detected masks and composites.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from blindshadowremoval_tpu.eval.postprocess import PostprocessParams, _bbox
from blindshadowremoval_tpu.ops.components import (
    filter_components,
    label_components,
)
from blindshadowremoval_tpu.ops.image import psnr as psnr_fn
from blindshadowremoval_tpu.ops.image import ssim as ssim_fn


def dynamic_resize_matrix(size: jax.Array, n: int = 256) -> jax.Array:
    """[n, n] bilinear matrix equivalent to resize(n -> size) + zero-pad.

    Row i < size samples the input at the half-pixel source coordinate
    (i + 0.5) * n/size - 0.5 (tf.image.resize / cv2.INTER_LINEAR
    convention, coordinates clamped); rows i >= size are zero.
    `size` is a traced scalar — shapes stay static.
    """
    size = jnp.asarray(size, jnp.float32)
    i = jnp.arange(n, dtype=jnp.float32)
    src = jnp.clip((i + 0.5) * (n / size) - 0.5, 0.0, n - 1.0)
    j0 = jnp.floor(src)
    frac = src - j0
    j0i = j0.astype(jnp.int32)
    j1i = jnp.minimum(j0i + 1, n - 1)
    eye = jnp.eye(n, dtype=jnp.float32)
    a = (1.0 - frac)[:, None] * eye[j0i] + frac[:, None] * eye[j1i]
    return a * (i < size)[:, None]


def resize_into_box(img: jax.Array, a: jax.Array) -> jax.Array:
    """Apply the dynamic resize matrix on both spatial axes of [H, W, C]."""
    tmp = jnp.einsum("ij,jwc->iwc", a, img)
    return jnp.einsum("wl,ilc->iwc", a, tmp)


@dataclasses.dataclass
class PartInputs:
    """Host-precomputed, part-mask-derived inputs to the fused step.

    All fields are plain data (256x256x1 float32 maps); nothing here
    depends on the model's outputs.  Registered as a jax pytree so it can
    ride into the jitted step as one argument.
    """

    face_hair: np.ndarray
    hair_region: np.ndarray
    mustache_rect: np.ndarray
    mouth_rect: np.ndarray
    below_mouth_roi: np.ndarray     # below-mouth rectangle * face_no_hair
    forehead_rect: np.ndarray       # zeros when the eyebrow gate is off
    brow_edge_gate: np.ndarray      # zeros when the left-brow gate is off
    nose_mask: np.ndarray
    nose_veto_short: np.ndarray     # rectangle for the dark-image reach
    nose_veto_long: np.ndarray


jax.tree_util.register_dataclass(
    PartInputs,
    data_fields=[f.name for f in dataclasses.fields(PartInputs)],
    meta_fields=[])


def prep_part_inputs(part: dict, params: PostprocessParams) -> PartInputs:
    """Build PartInputs from resized/rounded/padded part masks (the same
    dict UCBEvaluator feeds ucb_postprocess).  Mirrors the host-side
    geometry of eval/postprocess.py exactly."""
    p = params
    s = part["face_hair"].shape[0]

    def rect(r0, r1, c0, c1):
        m = np.zeros((s, s, 1), np.float32)
        m[int(r0):int(r1), int(c0):int(c1)] = 1.0
        return m

    zeros = np.zeros((s, s, 1), np.float32)
    nose_box = _bbox(part["nose"][..., 0])
    mouth_box = _bbox(part["mouth"][..., 0])

    mustache_rect, mouth_rect, below_roi = zeros, zeros, zeros
    if nose_box and mouth_box:
        mid_nose_h = (nose_box[0] + nose_box[1]) / 2.0
        mustache_rect = rect(mid_nose_h, mouth_box[0],
                             mouth_box[2], mouth_box[3])
        mouth_rect = rect(mouth_box[0], mouth_box[1],
                          mouth_box[2], mouth_box[3])
    if mouth_box:
        below = rect(mouth_box[0], s, 0, s)
        below_roi = below * part["face_no_hair"][..., :1]

    forehead_rect = zeros
    # all-channel sum, like the reference's np.sum(curr_eyebrow_mask)
    # (train_test_GSC.py:528) and the host twin (eval/postprocess.py)
    if part["eyebrow"].sum() > p.forehead_min_eyebrow:
        brow_box = _bbox(part["eyebrow"][..., 0])
        fh = np.array(part["face_no_hair"], copy=True)
        fh[brow_box[0]:s, :, :] = 0
        fh_box = _bbox(fh[..., 0])
        if fh_box:
            forehead_rect = rect(fh_box[0] + 20, brow_box[0] - 40,
                                 fh_box[2] + 40, fh_box[3] - 40)

    brow_edge_gate = zeros
    if part["eyebrow"][..., 0].sum() > 0:
        brow_box = _bbox(part["eyebrow"][..., 0])
        face_box = _bbox(part["face_no_hair"][..., 0])
        if brow_box and face_box and (brow_box[2] - face_box[2]) == 0:
            mid_face = face_box[2] * 0.8 + face_box[3] * 0.2
            left = rect(0, s, 0, mid_face)
            brow_edge_gate = part["eyebrow"][..., :1] * left

    nose_short, nose_long = zeros, zeros
    if nose_box:
        mid_nose_h = (nose_box[0] + nose_box[1]) / 2.0
        mid_nose_w = (nose_box[2] + nose_box[3]) / 2.0
        nose_short = rect(mid_nose_h, nose_box[1] + p.nose_veto_short,
                          mid_nose_w - p.nose_veto_halfwidth,
                          mid_nose_w + p.nose_veto_halfwidth)
        nose_long = rect(mid_nose_h, nose_box[1] + p.nose_veto_long,
                         mid_nose_w - p.nose_veto_halfwidth,
                         mid_nose_w + p.nose_veto_halfwidth)

    return PartInputs(
        face_hair=part["face_hair"][..., :1].astype(np.float32),
        hair_region=(part["face_hair"][..., :1]
                     - part["face_no_hair"][..., :1]).astype(np.float32),
        mustache_rect=mustache_rect, mouth_rect=mouth_rect,
        below_mouth_roi=below_roi.astype(np.float32),
        forehead_rect=forehead_rect, brow_edge_gate=brow_edge_gate,
        nose_mask=part["nose"][..., :1].astype(np.float32),
        nose_veto_short=nose_short, nose_veto_long=nose_long)


def fused_postprocess(mask_pred: jax.Array, tmp: jax.Array, pi: Any,
                      params: PostprocessParams) -> jax.Array:
    """In-graph twin of eval/postprocess.py:ucb_postprocess.

    mask_pred: [256,256,1] resized/padded shadow map (pre face gating);
    tmp: [256,256,3] resized/padded input.  Returns detected [256,256,1].
    """
    p = params
    mp = mask_pred * pi.face_hair
    intensity = jnp.mean(tmp, axis=2, keepdims=True)

    if p.mustache_mouth_suppression:
        # mustache / mouth false-positive suppression (:480-497)
        mp = mp * ~((mp < p.mustache_prob) & (pi.mustache_rect == 1))
        mp = mp * ~((mp < p.mouth_prob) & (pi.mouth_rect == 1))

    # spatially varying threshold (:518-539); the TSM protocol runs the
    # flat base threshold only (train_with_TSM.py:495-517)
    thr = jnp.full_like(mp, p.base_threshold)
    if p.adaptive_thresholds:
        thr = jnp.where(pi.hair_region > 0, p.hair_threshold, thr)
        thr = jnp.where((pi.hair_region > 0)
                        & (intensity < p.dark_hair_intensity),
                        p.dark_hair_threshold, thr)
        thr = jnp.where((pi.forehead_rect > 0)
                        & (intensity < p.forehead_intensity),
                        p.forehead_threshold, thr)

        # mouth-and-below false-positive bands (:541-557) — the reference's
        # host `if`s on mask-derived scalars, as traced selects
        roi = pi.below_mouth_roi
        over = (mp > p.base_threshold).astype(jnp.float32)
        roi_sum = jnp.maximum(roi.sum() * 3.0, 1e-6)   # 3-channel ref sums
        frac = (over * roi).sum() * 3.0 / roi_sum
        denom = jnp.maximum((roi * over).sum(), 1e-6)
        mean_mnb = (roi * over * intensity).sum() / denom
        band_hit = jnp.zeros((), bool)
        for lo, hi, min_int in p.mouth_frac_bands:
            hit = (frac > lo) & (frac < hi)
            if min_int is not None:
                hit = hit & (mean_mnb > min_int)
            band_hit = band_hit | hit
        thr = jnp.where(band_hit & (roi > 0), 1.0, thr)

        # left-eyebrow-at-face-edge gate (:558-572)
        thr = jnp.where((pi.brow_edge_gate > 0) & (intensity > 0.1), 1.0,
                        thr)

    detected = (mp > thr).astype(jnp.float32)

    # connected components + hair veto (:585-611)
    labels = label_components(detected[..., 0])
    kept = filter_components(
        detected[..., 0], labels, jnp.asarray(p.min_frac_of_max),
        veto_region=pi.hair_region[..., 0],
        veto_max_overlap=jnp.asarray(p.hair_veto_overlap))[..., None]

    # nose veto (:647-663)
    shadow_img = kept * intensity
    mean_int = shadow_img.sum() / jnp.maximum(kept.sum(), 1e-6)
    frac_nose = ((pi.nose_mask * shadow_img) > 0).sum() / \
        jnp.maximum(pi.nose_mask.sum(), 1e-6)
    nose_hit = jnp.zeros((), bool)
    for lo, hi in p.nose_frac_bands:
        nose_hit = nose_hit | ((frac_nose > lo) & (frac_nose < hi))
    veto_rect = jnp.where(mean_int < p.nose_dark_intensity,
                          pi.nose_veto_short, pi.nose_veto_long)
    kept = jnp.where(nose_hit & (veto_rect > 0), 0.0, kept)
    return kept


def _make_ucb_step(forward_fn, params: PostprocessParams,
                   img_size: int, protocol: str):
    """The unjitted per-image fused step shared by the single-image and
    batched builders."""
    s = img_size

    def step(variables, batch, size, pi):
        # compact ingress (config.compact_ingress): uint16 arrays are [0,1]
        # fixed-point — half the host->device bytes of f32, dequantized here
        # as a fused elementwise pass (evaluators.py:_ingress quantizes)
        batch = {k: v.astype(jnp.float32) / 65535.0
                 if v.dtype == jnp.uint16 else v
                 for k, v in batch.items()}
        _, rgb, _, mask_pred = forward_fn(variables, batch)
        a = dynamic_resize_matrix(size, s)
        gt_sc = resize_into_box(batch["gt"][0].astype(jnp.float32), a)

        if protocol == "tsm":
            tmp = batch["img"][0].astype(jnp.float32)
            mp = mask_pred[0]
            kept = fused_postprocess(mp, tmp, pi, params)
            out = jnp.clip(rgb[0] * kept + tmp * (1.0 - kept), 0.0, 1.0)
            out = resize_into_box(out, a)
            mp = mp * pi.face_hair   # the diagnostic panel (gated map)
        else:
            tmp = resize_into_box(batch["img"][0].astype(jnp.float32), a)
            pred = resize_into_box(jnp.clip(rgb[0], 0.0, 1.0), a)
            mp = resize_into_box(mask_pred[0], a)
            kept = fused_postprocess(mp, tmp, pi, params)
            out = jnp.clip(pred * kept + tmp * (1.0 - kept), 0.0, 1.0)
        psnr = psnr_fn(gt_sc[None], out[None])[0]
        ssim = ssim_fn(gt_sc[None], out[None])[0]
        # compact egress: metrics are computed ON DEVICE from the f32
        # composite above; only the fetched arrays quantize (uint8 pred —
        # results are written as 8-bit images anyway — and a bool mask).
        # ~1 MB -> ~0.3 MB per image, which matters when the chip is behind
        # a slow tunnel (docs/perf.md).
        out_u8 = jnp.round(out * 255.0).astype(jnp.uint8)
        # the resized shadow map rides along (64 KB) so the caller can save
        # the same 5-panel diagnostic strip as the host-orchestrated path
        mp_u8 = jnp.round(jnp.clip(mp, 0.0, 1.0) * 255.0).astype(jnp.uint8)
        return kept.astype(bool), out_u8, mp_u8, psnr, ssim

    return step


def build_fused_ucb_step(forward_fn, params: PostprocessParams,
                         img_size: int = 256, protocol: str = "gsc"):
    """Returns a jitted fn(variables, batch, size, part_inputs) ->
    (detected [S,S,1], composite [S,S,3] uint8, shadow map [S,S,1] uint8,
    psnr, ssim) — one device call per image.  `forward_fn(variables,
    batch)` must return the generator 4-tuple (gs, rgb, mask22, dif);
    `batch` is the dataset's dict of view arrays (host-rasterized maps OR
    device_geometry primitives — the forward decides), which must include
    "img" and "gt".

    protocol="tsm" fuses the structurally different TSM pipeline
    (train_with_TSM.py:420-617): heuristics at full resolution against the
    UNRESIZED part masks, composite BEFORE the resize-into-box."""
    return jax.jit(_make_ucb_step(forward_fn, params, img_size, protocol))


def build_fused_ucb_batch_step(forward_fn, params: PostprocessParams,
                               img_size: int = 256, protocol: str = "gsc"):
    """The k-image twin of `build_fused_ucb_step`: every array input gains
    a leading image axis (batch leaves [k,V,S,S,C], size [k], PartInputs
    leaves [k,S,S,1]) and every output a leading [k].

    vmap turns the per-image step into one device program over the stack —
    the k generator forwards become one conv batch of k*V views on the MXU,
    and the k heuristic/CC passes run as batched VPU work (the label-
    propagation while_loop iterates until the slowest image converges).
    One call per k images amortizes the per-call tunnel latency that
    serializes UCB-100 wall time (docs/perf.md); the caller pads the tail
    chunk to the warm k, so any image count runs through ONE executable.
    """
    step = _make_ucb_step(forward_fn, params, img_size, protocol)
    return jax.jit(jax.vmap(step, in_axes=(None, 0, 0, 0)))
