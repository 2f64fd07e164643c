"""2D-FAN facial-landmark network (Face Alignment Network), TPU-native.

The reference's offline preprocessing step runs the `face_alignment`
package's PyTorch FAN CNN to produce the 68x2 landmark `.npy` files that
drive every crop/warp downstream (`bmvc2022-dataprocess.py:10-29`).  SURVEY
SS2b scoped that model as "pluggable, optionally a JAX port later" — this
module is that port: the stacked-hourglass architecture of Bulat & Tzimiropoulos,
"How far are we from solving the 2D & 3D Face Alignment problem?" (ICCV'17),
in NHWC Flax, jittable end-to-end including heatmap decoding.

Weights are NOT bundled (no network egress in this environment; the
published checkpoints are ~90 MB).  `tools/convert_fan_weights.py` converts
a `face_alignment` 2DFAN checkpoint (plain PyTorch state dict, e.g.
`2DFAN4-*.pth.tar`) to an `.npz` this module loads — the same
convert-offline contract as the VGG-19 perceptual backbone.  The Keras->Flax
style of machine verification applies: `tests/test_fan.py` checks this
implementation + the converter against an independently written PyTorch
oracle of the published architecture with synthetic weights.

Scope note: `face_alignment` brackets FAN with an SFD face *detector* to get
the face box.  That detector is also ported in-repo (`models/sfd.py`);
callers can alternatively pass an explicit box or default to the whole
frame.

TPU notes: everything from the 7x7 stem down to the 1x1 heads is
conv-shaped and MXU-friendly; the hourglass runs at 64^2..4^2 x 256
channels.  BatchNorm is inference-mode (running stats).  The decode step
(argmax + quarter-pixel nudge) is vectorized — no per-landmark host loop as
in the reference stack.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# face_alignment's FaceAlignment.get_landmarks box->center/scale convention:
# scale divides the box perimeter/2 by this reference extent, and the center
# is shifted up by 12% of the box height before cropping.
_REFERENCE_SCALE = 195.0
_CENTER_SHIFT = 0.12
INPUT_RES = 256      # network input resolution
HEATMAP_RES = 64     # output heatmap resolution
N_LANDMARKS = 68


def _bn(name: str, dtype) -> nn.BatchNorm:
    # torch BatchNorm2d defaults: eps 1e-5; inference uses running stats
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        dtype=dtype, name=name)


def _conv3(feat: int, name: str, dtype) -> nn.Conv:
    return nn.Conv(feat, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                   dtype=dtype, name=name)


class FANConvBlock(nn.Module):
    """FAN's residual block: three BN-ReLU-conv3x3 stages at C/2, C/4, C/4
    channels, concatenated, plus a (BN-ReLU-conv1x1) projection shortcut
    when the channel count changes."""

    in_planes: int
    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half, quarter = self.out_planes // 2, self.out_planes // 4
        out1 = _conv3(half, "conv1", self.dtype)(
            nn.relu(_bn("bn1", self.dtype)(x)))
        out2 = _conv3(quarter, "conv2", self.dtype)(
            nn.relu(_bn("bn2", self.dtype)(out1)))
        out3 = _conv3(quarter, "conv3", self.dtype)(
            nn.relu(_bn("bn3", self.dtype)(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if self.in_planes != self.out_planes:
            res = nn.Conv(self.out_planes, (1, 1), use_bias=False,
                          dtype=self.dtype, name="down_conv")(
                nn.relu(_bn("down_bn", self.dtype)(x)))
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    """Recursive hourglass, unrolled statically (depth is a Python int, so
    the trace is a fixed pyramid — no dynamic control flow under jit)."""

    depth: int = 4
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f, dt = self.features, self.dtype

        def level(lvl: int, inp: jax.Array) -> jax.Array:
            up1 = FANConvBlock(f, f, dt, name=f"b1_{lvl}")(inp)
            low = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low = FANConvBlock(f, f, dt, name=f"b2_{lvl}")(low)
            if lvl > 1:
                low2 = level(lvl - 1, low)
            else:
                low2 = FANConvBlock(f, f, dt, name=f"b2_plus_{lvl}")(low)
            low3 = FANConvBlock(f, f, dt, name=f"b3_{lvl}")(low2)
            # nearest-neighbor 2x upsample
            up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
            return up1 + up2

        return level(self.depth, x)


class FAN(nn.Module):
    """Stacked-hourglass landmark network (2DFAN-4 by default).

    Input: [B, 256, 256, 3] RGB in [0, 1].
    Output: list of num_modules heatmap tensors [B, 64, 64, 68]; the last
    one is the prediction (intermediate ones exist for deep supervision and
    for state-dict parity with the published checkpoints).
    """

    num_modules: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        dt = self.dtype
        x = x.astype(dt)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    dtype=dt, name="conv1")(x)
        x = nn.relu(_bn("bn1", dt)(x))
        x = nn.avg_pool(FANConvBlock(64, 128, dt, name="conv2")(x),
                        (2, 2), strides=(2, 2))
        x = FANConvBlock(128, 128, dt, name="conv3")(x)
        x = FANConvBlock(128, 256, dt, name="conv4")(x)

        previous, outputs = x, []
        for i in range(self.num_modules):
            hg = HourGlass(4, 256, dt, name=f"m{i}")(previous)
            ll = FANConvBlock(256, 256, dt, name=f"top_m_{i}")(hg)
            ll = nn.relu(_bn(f"bn_end{i}", dt)(
                nn.Conv(256, (1, 1), dtype=dt, name=f"conv_last{i}")(ll)))
            tmp_out = nn.Conv(N_LANDMARKS, (1, 1), dtype=dt,
                              name=f"l{i}")(ll)
            outputs.append(tmp_out.astype(jnp.float32))
            if i < self.num_modules - 1:
                previous = (previous
                            + nn.Conv(256, (1, 1), dtype=dt,
                                      name=f"bl{i}")(ll)
                            + nn.Conv(256, (1, 1), dtype=dt,
                                      name=f"al{i}")(tmp_out))
        return outputs


# ---------------------------------------------------------------------------
# box -> center/scale, crop, and heatmap decoding
# ---------------------------------------------------------------------------

def box_to_center_scale(box: Sequence[float]) -> tuple[np.ndarray, float]:
    """[x1, y1, x2, y2] face box -> (center[2], scale), the face_alignment
    convention (center raised by 12% of box height; scale = semiperimeter
    over 195)."""
    x1, y1, x2, y2 = (float(v) for v in box)
    center = np.array([x2 - (x2 - x1) / 2.0, y2 - (y2 - y1) / 2.0])
    center[1] -= (y2 - y1) * _CENTER_SHIFT
    return center, (x2 - x1 + y2 - y1) / _REFERENCE_SCALE


def crop_for_fan(image: np.ndarray, center: np.ndarray, scale: float,
                 resolution: int = INPUT_RES) -> np.ndarray:
    """Crop + resize the face region to the network input (host-side).

    Maps the `resolution`-sized output square back onto the image through
    the center/scale similarity (window side = 200*scale pixels), zero-pads
    out-of-frame regions, and resizes.  uint8/float RGB in, float32 RGB in
    [0, 1] out, shape [resolution, resolution, 3].
    """
    import cv2

    h = 200.0 * scale
    # original-image coords of the output square's corners
    ul = np.floor(np.array([center[0] - h / 2.0, center[1] - h / 2.0]))
    br = ul + np.ceil(h)
    ul, br = ul.astype(int), br.astype(int)
    side = br[0] - ul[0]
    out = np.zeros((side, side, 3), dtype=np.float32)
    ih, iw = image.shape[:2]
    sx0, sy0 = max(ul[0], 0), max(ul[1], 0)
    sx1, sy1 = min(br[0], iw), min(br[1], ih)
    if sx1 > sx0 and sy1 > sy0:
        out[sy0 - ul[1]:sy1 - ul[1], sx0 - ul[0]:sx1 - ul[0]] = \
            np.asarray(image, np.float32)[sy0:sy1, sx0:sx1, :3]
    out = cv2.resize(out, (resolution, resolution),
                     interpolation=cv2.INTER_LINEAR)
    if image.dtype == np.uint8 or np.asarray(image).max() > 2.0:
        out /= 255.0
    return out


def decode_heatmaps(hm: jax.Array) -> jax.Array:
    """[B, H, W, 68] heatmaps -> [B, 68, 2] (x, y) heatmap-space coords.

    The face_alignment decode, vectorized: per-landmark argmax, then a
    +/-0.25-pixel nudge toward the larger 4-neighbor (only for interior
    maxima), then the +0.5 half-pixel center offset.  Runs entirely
    on-device (gathers instead of the reference stack's Python loop).
    """
    b, hgt, wid, c = hm.shape
    flat = hm.reshape(b, hgt * wid, c)
    idx = jnp.argmax(flat, axis=1)                      # [B, 68]
    px = (idx % wid).astype(jnp.float32)
    py = (idx // wid).astype(jnp.float32)

    def at(dy: int, dx: int) -> jax.Array:
        yy = jnp.clip(py.astype(jnp.int32) + dy, 0, hgt - 1)
        xx = jnp.clip(px.astype(jnp.int32) + dx, 0, wid - 1)
        lin = yy * wid + xx
        return jnp.take_along_axis(
            flat, lin[:, None, :], axis=1)[:, 0, :]    # [B, 68]

    dx = at(0, 1) - at(0, -1)
    dy = at(1, 0) - at(-1, 0)
    # the reference nudges only maxima interior in BOTH dims (joint gate)
    interior = ((px > 0) & (px < wid - 1) & (py > 0) & (py < hgt - 1))
    px = px + jnp.where(interior, jnp.sign(dx) * 0.25, 0.0)
    py = py + jnp.where(interior, jnp.sign(dy) * 0.25, 0.0)
    return jnp.stack([px + 0.5, py + 0.5], axis=-1)


def heatmap_to_image_coords(pts: jax.Array, center, scale: float,
                            resolution: int = HEATMAP_RES) -> jax.Array:
    """Heatmap-space (x, y) -> original-image pixel coords via the inverse
    of the center/scale similarity (window side = 200*scale)."""
    h = 200.0 * scale
    c = jnp.asarray(center, jnp.float32)
    return pts * (h / resolution) + (c - h / 2.0)


def landmarks_from_image(variables, image: np.ndarray,
                         box: Sequence[float] | None = None,
                         num_modules: int = 4,
                         apply_fn=None) -> np.ndarray:
    """Full driver: image (+ optional face box) -> 68x2 landmarks (float
    pixels).  With no box, the whole frame is treated as the face region
    (the SFD detector that face_alignment brackets FAN with stays
    pluggable).  The reference's `.npy` files hold these truncated to int
    (fa `utils.transform` casts); callers wanting bit-parity can
    `np.trunc` the result.
    """
    ih, iw = np.asarray(image).shape[:2]
    if box is None:
        box = (0.0, 0.0, float(iw), float(ih))
    center, scale = box_to_center_scale(box)
    inp = crop_for_fan(np.asarray(image), center, scale)[None]
    if apply_fn is None:
        apply_fn = jax.jit(
            lambda v, x: FAN(num_modules=num_modules).apply(v, x)[-1])
    hm = apply_fn(variables, jnp.asarray(inp))
    pts = decode_heatmaps(hm)[0]
    return np.asarray(heatmap_to_image_coords(pts, center, scale))


class LandmarkAligner:
    """Warm, batched FAN: K face boxes -> K 68x2 landmark sets in one
    device call (plus a padded tail), compiled once.

    `landmarks_from_image` dispatches one jitted call per face;
    every detected face pays one full 256x256 FAN pass, so the batched path
    is what makes the landmark stage a production stage rather than an
    offline script (the reference runs eager torch per image,
    bmvc2022-dataprocess.py:19).  Crops happen on the host
    (`crop_for_fan`), the stacked batch runs forward + the vectorized
    heatmap decode fused under one jit, and the center/scale similarity
    back to image coordinates is a two-flop numpy affine per face.

    dtype=bfloat16 keeps the hourglass on the MXU at full rate; the decode
    argmax runs on the f32 head output either way, and a quarter-pixel
    heatmap nudge is the decode's own resolution floor, far above bf16
    noise.
    """

    def __init__(self, variables, num_modules: int = 4,
                 batch_size: int = 16, dtype: Any = jnp.float32,
                 ingress_u8: bool = False, warm: bool = True):
        self.variables = variables
        self.batch_size = batch_size
        # ingress_u8: ship crops as uint8 fixed-point (1/255 step,
        # dequantized in-graph) — 4x fewer host->device bytes, which is
        # what bounds the align stage on a remote-attached chip
        # (docs/perf.md "Landmark stage").  The 1/255 input quantization is
        # within the interpolated crop's own resample noise but can move
        # the sub-pixel decode nudge, so the exact-contract default is f32.
        self.ingress_u8 = ingress_u8
        fan = FAN(num_modules=num_modules, dtype=dtype)
        if ingress_u8:
            def apply(v, x):
                return decode_heatmaps(
                    fan.apply(v, x.astype(jnp.float32) / 255.0)[-1])
        else:
            def apply(v, x):
                return decode_heatmaps(fan.apply(v, x)[-1])
        self._apply = jax.jit(apply)
        if warm:
            z = jnp.zeros((batch_size, INPUT_RES, INPUT_RES, 3),
                          jnp.uint8 if ingress_u8 else jnp.float32)
            jax.block_until_ready(self._apply(self.variables, z))

    def __call__(self, images, boxes) -> list[np.ndarray]:
        """Per-face (image, [x1,y1,x2,y2] box) pairs -> list of 68x2
        float-pixel landmark arrays in original image coordinates."""
        cs = [box_to_center_scale(b) for b in boxes]
        out: list[np.ndarray] = []
        bs = self.batch_size
        for start in range(0, len(images), bs):
            chunk = list(zip(images[start:start + bs], cs[start:start + bs]))
            n = len(chunk)
            crops = np.stack([crop_for_fan(np.asarray(im), c, s)
                              for im, (c, s) in chunk])
            if self.ingress_u8:
                crops = np.rint(np.clip(crops, 0.0, 1.0)
                                * 255.0).astype(np.uint8)
            if n < bs:
                crops = np.concatenate(
                    [crops, np.zeros((bs - n,) + crops.shape[1:],
                                     crops.dtype)])
            pts = np.asarray(self._apply(self.variables,
                                         jnp.asarray(crops)))[:n]
            for (im, (c, s)), p in zip(chunk, pts):
                h = 200.0 * s    # heatmap -> image similarity, host numpy
                out.append((p * (h / HEATMAP_RES)
                            + (np.asarray(c) - h / 2.0)).astype(np.float32))
        return out


def variables_from_flat(flat: dict):
    """'<collection>/<module path>/<leaf>' -> array mapping into the nested
    {params, batch_stats} variable collections FAN.apply expects."""
    variables: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = variables
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return variables


def load_fan_npz(path: str):
    """Load converted FAN weights (tools/convert_fan_weights.py)."""
    raw = np.load(path)
    return variables_from_flat({k: raw[k] for k in raw.files})
