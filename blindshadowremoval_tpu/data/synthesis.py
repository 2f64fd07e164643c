"""Shadow synthesis: supervised pair generation from clean faces.

Two halves, mirroring the reference's split:

  * `compose_shadow_image` — the in-graph compositor (`process_mask`,
    train_test_GSC.py:81-105), fully on-device and key-driven: random mask
    source (external mask vs face-gated perlin), random softening
    (subsurface scattering vs plain inversion), random brightness field;
    composites `img = gt * mask_ss + img_dark * mask_sv * intensity`.

  * `ShadowMaker` / `shadow_synthesis_host` — the host-side external-shadow
    generator (utils.py:902-1055): an external occluder mask from a PNG
    library (or a procedural perlin fallback when no library is configured —
    the reference hardcodes a cluster path at utils.py:942), randomly scaled,
    rotated, blurred and translated over the face, with motion parameters so
    video frames get temporally coherent shadows.

Randomness: host side uses numpy Generators, device side jax PRNG keys —
distributional parity with the reference's RNG soup (SURVEY.md hard part 3).
"""

from __future__ import annotations

import glob as _glob
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blindshadowremoval_tpu.geometry.crop import rotate_center
from blindshadowremoval_tpu.geometry.landmarks import forehead_points
from blindshadowremoval_tpu.ops.perlin import brightness_mask, render_perlin_mask
from blindshadowremoval_tpu.ops.ssscatter import apply_ss_shadow_map
from blindshadowremoval_tpu.ops.tonecurve import face_darken
from blindshadowremoval_tpu.utils.hostdev import host_cpu_device

# compiled once for the host parse path: eagerly dispatched, the ~30 small
# jnp ops inside face_darken cost ~50 ms/sample on a 1-core host (26 ms
# alone in an uncompiled random.split); jitted, the whole thing is ~2 ms.
# jax.jit is lazy (first call compiles), so this touches no backend at import.
_face_darken_jit = jax.jit(face_darken)


def derive_darkened_views(key: jax.Array, gt_raw: jax.Array):
    """In-graph twin of the host parser's `face_darken` stage.

    `gt_raw`: [2B,S,S,3] raw crops with mirrored pairs adjacent (even rows
    unflipped — the parse_train layout).  One tone-curve draw per PAIR,
    shared by its mirror exactly as the host path shares one `face_darken`
    result across view0/view1 (dataset.py parse_train).  Returns (gt,
    img_dark) with both views interleaved back.  Under
    `config.device_darken` this removes `img_dark` (3 of 7 image channels)
    from the host->device wire and the ~per-sample host darkening cost."""
    even = gt_raw[0::2]
    keys = jax.random.split(key, even.shape[0])
    img_aug, img_dark, _ = jax.vmap(face_darken)(keys, even)
    # clamp the CTM extrapolations to display range: the compact wire
    # (config.compact_ingress, the CLI default) clips the host-derived pair
    # to [0,1] at quantization, and unclamped excursions (CTM fits reach
    # ~[-0.25, 1.3]) destabilize the bf16 train step within ~10 steps at
    # batch 32 (NaN) where the clipped wire is measured stable
    img_aug = jnp.clip(img_aug, 0.0, 1.0)
    img_dark = jnp.clip(img_dark, 0.0, 1.0)

    def interleave(x):
        return jnp.stack([x, x[:, :, ::-1]], axis=1).reshape(gt_raw.shape)

    return interleave(img_aug), interleave(img_dark)


def _compose_one(key: jax.Array, mask: jax.Array, gt: jax.Array,
                 img_dark: jax.Array, face: jax.Array):
    """Single-sample compositor; shapes (S,S,{1,3})."""
    s = gt.shape[0]
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)

    # 60% keep the external-shadow mask, else a fresh face-gated perlin mask
    mask = jax.lax.cond(
        jax.random.uniform(k1) > 0.4,
        lambda: mask,
        lambda: face * render_perlin_mask(k2, (s, s)),
    )
    # 75% subsurface-scattered lit map, else hard inversion broadcast to RGB
    mask_ss = jax.lax.cond(
        jax.random.uniform(k3) > 0.25,
        lambda: apply_ss_shadow_map(k4, 1.0 - mask),
        lambda: jnp.concatenate([1.0 - mask] * 3, axis=-1),
    )
    mask_sv = 1.0 - mask_ss
    intensity = jax.lax.cond(
        jax.random.uniform(k5) > 0.5,
        lambda: brightness_mask(k6, (s, s), min_val=0.3),
        lambda: brightness_mask(k7, (s, s), min_val=0.5),
    )[..., None]

    img = gt * mask_ss + img_dark * mask_sv * intensity
    img = jnp.clip(img, 0.0, 1.0)
    mask_edge = jnp.abs(mask_sv - mask)
    return img, mask_sv, mask_edge


def compose_shadow_image(key: jax.Array, mask: jax.Array, gt: jax.Array,
                         img_dark: jax.Array, face: jax.Array):
    """Batched compositor: mask/face [B,S,S,1], gt/img_dark [B,S,S,3].

    Returns (img, mask_sv, mask_edge), each [B,S,S,3].
    """
    keys = jax.random.split(key, gt.shape[0])
    return jax.vmap(_compose_one)(keys, mask, gt, img_dark, face)


class ShadowMaker:
    """External-occluder shadow mask generator (utils.py:902-1013).

    Draws a random mask from a PNG library (else procedural perlin), places
    it relative to a random facial landmark, with per-instance motion
    (translate/shake/scale), rotation, scale and blur; `compute_mask(t)`
    renders the mask at time t so video clips get coherent moving shadows.
    """

    def __init__(self, face: Optional[np.ndarray], lm: np.ndarray,
                 mask_dir: Optional[str] = None,
                 rng: Optional[np.random.Generator] = None,
                 size: Optional[int] = None):
        """`face=None` (with `size`) skips the face gating: compute_mask
        returns the raw occluder canvas and the caller multiplies by its
        own face map — the device_geometry train path, where the face
        region is rasterized IN-GRAPH (identical numerics,
        tests/test_device_geometry.py) and a host rasterization would be
        pure duplicate work (~15 ms/sample on a 1-core host)."""
        self.rng = rng if rng is not None else np.random.default_rng()
        self.face = face
        self.size = face.shape[0] if face is not None else int(size)
        self.lm = lm
        self.motion = self.rng.integers(1, 3)          # 1 trans, 2 shake
        self.spd_x = self.rng.uniform(0.1, 10.0)
        self.spd_y = self.rng.uniform(0.1, 10.0)
        self.scale = self.rng.uniform(1.0, 2.5)
        self.rot = self.rng.uniform(0.0, 365.0)
        self.blur = int(self.rng.integers(10, 15))
        self.mask_dir = mask_dir
        self._compile_mask()

    # -- internals -----------------------------------------------------
    def _load_library_mask(self) -> Optional[np.ndarray]:
        if not self.mask_dir:
            return None
        files = sorted(_glob.glob(self.mask_dir.rstrip("/") + "/*.png"))
        if not files:
            return None
        import cv2

        path = files[int(self.rng.integers(0, len(files)))]
        return (cv2.imread(path, 0) / 255.0).astype(np.float32)

    # class-level pool of procedural occluder masks: each mask is randomly
    # scaled / rotated / blurred / translated downstream, so drawing from a
    # slowly refreshed pool is distributionally close to generating one per
    # sample at a fraction of the cost (the per-sample perlin render was the
    # single most expensive host-parse item on a 1-core host).  1-in-16
    # draws regenerates a random slot, so long runs keep seeing fresh base
    # shapes instead of freezing at the first pool-full contents.
    _MASK_POOL: list = []
    _MASK_POOL_SIZE = 32

    def _render_mask(self) -> np.ndarray:
        key = jax.random.PRNGKey(int(self.rng.integers(0, 2 ** 31)))
        with jax.default_device(host_cpu_device()):
            pm = np.asarray(render_perlin_mask(key, (256, 256)))[..., 0]
        # float32 end to end: the reference's float64 numpy default doubles
        # every cv2 resize/blur/rotate and copy in the hot parse path for
        # an augmentation mask that is box-blurred anyway
        return (pm > 0.5).astype(np.float32)

    def _procedural_mask(self) -> np.ndarray:
        """Perlin-thresholded occluder when no mask library is configured."""
        pool = ShadowMaker._MASK_POOL
        if len(pool) < ShadowMaker._MASK_POOL_SIZE:
            pool.append(self._render_mask())
            return pool[-1]
        if self.rng.uniform() < 1.0 / 16.0:
            slot = int(self.rng.integers(0, len(pool)))
            pool[slot] = self._render_mask()
            return pool[slot]
        return pool[int(self.rng.integers(0, len(pool)))]

    def _compile_mask(self):
        import cv2

        mask = self._load_library_mask()
        if mask is None:
            mask = self._procedural_mask()
        if self.rng.uniform(0.0, 1.0) > 0.75:
            mask = 1.0 - mask

        lm = self.lm * self.size
        lmp = forehead_points(lm, 0.6)
        lm = np.concatenate([lm, lmp], axis=0)

        length = max((lm[:, 0].max() - lm[:, 0].min()) / 2,
                     (lm[:, 1].max() - lm[:, 1].min()) / 2)
        start_center_idx = int(self.rng.integers(17, 67))
        start_center = np.array(lm[start_center_idx, :])
        if self.rng.uniform(-1.0, 1.0) > 0:
            # face-covering placement (utils.py:954-963)
            start_center[0] = (lm[:, 0].max() + lm[:, 0].min()) / 2
            start_center[1] = (lm[:, 1].max() + lm[:, 1].min()) / 2
            shape = max(int(length * 2), 10)
            mask = cv2.resize(mask, (shape, shape))
            mask = cv2.blur(mask, (self.blur // 2, self.blur // 2))
        else:
            # landmark-anchored placement (utils.py:964-975)
            start_center[0] += length * self.rng.uniform(-0.05, 0.05)
            start_center[1] += length * self.rng.uniform(-0.05, 0.05)
            shape = max(int(length * self.scale * 2), 10)
            mask = cv2.resize(mask, (shape, shape))
            # reference: ndimage.rotate (utils.py:968); rotate_center is the
            # cv2 equivalent (interpolation-order delta is washed out by the
            # cv2.blur that follows)
            mask = rotate_center(mask, self.rot)
            mask = cv2.blur(mask, (self.blur, self.blur))
        self.mask = mask[..., None]
        self.mask_shape = shape
        self.mask_center = start_center

    # -- api -----------------------------------------------------------
    def compute_mask(self, time: float):
        """Render the (mask * face, face) pair at time step `time`
        (utils.py:981-1013).  With face=None the ungated canvas is
        returned (see __init__)."""
        face = self.face
        fh = fw = self.size
        ms = self.mask_shape
        cx = int(self.mask_center[0] + self.spd_x * time)
        cy = int(self.mask_center[1] + self.spd_y * time)

        box = [cx - ms // 2, cy - ms // 2,
               cx + ms - ms // 2, cy + ms - ms // 2]
        mbox = [0, 0, ms, ms]
        if box[0] < 0:
            mbox[0] = -box[0]
        if box[2] > fw:
            mbox[2] = ms - (box[2] - fw)
        if box[1] < 0:
            mbox[1] = -box[1]
        if box[3] > fh:
            mbox[3] = ms - (box[3] - fh)
        box = [max(box[0], 0), max(box[1], 0), min(box[2], fw), min(box[3], fh)]

        canvas = np.zeros(
            (fh, fw, face.shape[2] if face is not None else 1), np.float32)
        canvas[box[1]:box[3], box[0]:box[2], :] = \
            self.mask[mbox[1]:mbox[3], mbox[0]:mbox[2], :]
        if face is None:
            return canvas, None
        return canvas * face, face


def shadow_synthesis_host(gt: np.ndarray, lm: np.ndarray, time: float = 0.0,
                          mask_dir: Optional[str] = None,
                          rng: Optional[np.random.Generator] = None,
                          seed: Optional[int] = None,
                          rasterize_face: bool = True,
                          darken: bool = True):
    """Full host-side pair synthesis (utils.py:1025-1055).

    Returns (img, img_dark, mask, color_matrix, face): the color-jittered
    face, its globally darkened twin, the external shadow mask, the 3x3 CTM,
    and the soft face region.

    `rasterize_face=False` skips the host face rasterization and returns
    (img, img_dark, UNGATED mask, ctm, None) — the device_geometry train
    path gates `mask` by the in-graph face map instead (train/trainer.py),
    which is numerically identical and saves the most expensive remaining
    host-parse item on a small host (docs/perf.md "Host data pipeline").
    """
    rng = rng if rng is not None else np.random.default_rng(seed)
    width = gt.shape[0]
    if rasterize_face:
        from blindshadowremoval_tpu.geometry.triangulation import (
            generate_face_region,
        )

        face = generate_face_region(lm, width)
    else:
        face = None

    if darken:
        key = jax.random.PRNGKey(int(rng.integers(0, 2 ** 31)))
        with jax.default_device(host_cpu_device()):
            img, img_dark, ctm = _face_darken_jit(
                key, jnp.asarray(gt, jnp.float32))
        img, img_dark, ctm = (np.asarray(img), np.asarray(img_dark),
                              np.asarray(ctm))
    else:
        # config.device_darken: ship the RAW crop; the jitted train step
        # derives (gt, img_dark) in-graph (derive_darkened_views)
        img, img_dark, ctm = np.asarray(gt, np.float32), None, None

    maker = ShadowMaker(face, lm, mask_dir=mask_dir, rng=rng, size=width)
    mask, face = maker.compute_mask(time)
    return (img, img_dark, mask.astype(np.float32), ctm,
            face.astype(np.float32) if face is not None else None)
