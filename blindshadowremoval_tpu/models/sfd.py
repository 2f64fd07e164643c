"""S3FD face detector (SFD), TPU-native — the detection half of the
reference's landmark step.

`face_alignment` brackets its FAN landmark CNN with the S3FD single-shot
face detector (Zhang et al., ICCV'17) to find the face box
(`bmvc2022-dataprocess.py:10` constructs `FaceAlignment`, whose
`get_landmarks` runs SFD detection first).  `models/fan.py` ports the
landmark CNN; this module ports the detector, so the whole
image -> box -> crop -> heatmaps -> 68x2 pipeline runs in-repo.

Architecture: VGG16 conv1_1..conv5_3, fc6/fc7 as convs, two extra conv
stages, channel-wise L2Norm on the conv3_3/4_3/5_3 taps, and six
(conf, loc) head pairs at strides 4..128.  The first conf head uses a
max-out background label (3 bg channels reduced by max, concatenated with
the face channel).  The conv trunk runs jitted on device; box decoding +
NMS are a few hundred candidates of host numpy (offline preprocessing, not
a hot path — the reference stack does the same on the host).

Numeric contract is `face_alignment`'s `detection/sfd/detect.py`, including
its quirks: the [104, 117, 123] mean subtraction applied to the RGB frame
as-is, SSD decode with variances (0.1, 0.2) and per-scale square priors of
side 4*stride, greedy NMS at IoU 0.3 with the +1-pixel area convention, and
the 0.5 final score filter.  Weights convert offline from the published
`s3fd-*.pth` state dict via `tools/convert_sfd_weights.py`; the mapping and
this implementation are machine-verified against an independent torch
oracle in `tests/test_sfd.py` (synthetic weights — same pattern as the VGG
and FAN chains).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (name, width, convs-in-block) for the VGG16 trunk
_TRUNK = (("conv1", 64, 2), ("conv2", 128, 2), ("conv3", 256, 3),
          ("conv4", 512, 3), ("conv5", 512, 3))
_L2NORM_TAPS = {"conv3_3": 256, "conv4_3": 512, "conv5_3": 512}
_MEAN = (104.0, 117.0, 123.0)   # fa subtracts these from the RGB frame as-is
_VARIANCES = (0.1, 0.2)


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with a learned per-channel scale."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("weight", nn.initializers.ones, (self.channels,))
        norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
        return x / (norm + 1e-10) * scale.astype(x.dtype)


class S3FD(nn.Module):
    """Input [B, H, W, 3]: RGB float minus `_MEAN` (see `preprocess`).
    Returns six (conf, loc) pairs, conf already softmaxed with the max-out
    background reduction applied at the stride-4 head."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[tuple[jax.Array, jax.Array]]:
        dt = self.dtype
        x = x.astype(dt)

        def conv(feat, name, k=3, stride=1, pad=None):
            p = (k // 2) if pad is None else pad
            return nn.Conv(feat, (k, k), strides=(stride, stride),
                           padding=((p, p), (p, p)), dtype=dt, name=name)

        taps = {}
        for block, width, n in _TRUNK:
            for i in range(1, n + 1):
                x = nn.relu(conv(width, f"{block}_{i}")(x))
                if f"{block}_{i}" in _L2NORM_TAPS:
                    taps[f"{block}_{i}"] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(conv(1024, "fc6", k=3, pad=3)(x))
        x = taps["fc7"] = nn.relu(conv(1024, "fc7", k=1)(x))
        x = nn.relu(conv(256, "conv6_1", k=1)(x))
        x = taps["conv6_2"] = nn.relu(conv(512, "conv6_2", stride=2)(x))
        x = nn.relu(conv(128, "conv7_1", k=1)(x))
        taps["conv7_2"] = nn.relu(conv(256, "conv7_2", stride=2)(x))

        outs = []
        for i, name in enumerate(("conv3_3", "conv4_3", "conv5_3",
                                  "fc7", "conv6_2", "conv7_2")):
            t = taps[name]
            head = name + "_norm" if name in _L2NORM_TAPS else name
            if name in _L2NORM_TAPS:
                t = L2Norm(_L2NORM_TAPS[name], dt, name=head)(t)
            n_conf = 4 if i == 0 else 2
            conf = conv(n_conf, f"{head}_mbox_conf")(t).astype(jnp.float32)
            loc = conv(4, f"{head}_mbox_loc")(t).astype(jnp.float32)
            if i == 0:   # max-out background: max of 3 bg channels vs face
                bg = jnp.max(conf[..., :3], axis=-1, keepdims=True)
                conf = jnp.concatenate([bg, conf[..., 3:]], axis=-1)
            outs.append((jax.nn.softmax(conf, axis=-1), loc))
        return outs


def preprocess(rgb: np.ndarray) -> np.ndarray:
    """uint8/float RGB frame -> the detector's input (fa detect.py:
    subtract (104, 117, 123) from the frame without channel reorder)."""
    return np.asarray(rgb, np.float32) - np.asarray(_MEAN, np.float32)


def decode_detections(outs, score_thresh: float = 0.05,
                      index: int = 0) -> np.ndarray:
    """Six softmaxed (conf, loc) head pairs -> [N, 5] (x1, y1, x2, y2,
    score) candidates above `score_thresh` (host numpy; vectorized over the
    anchor grid instead of fa's per-position Python loop).  `index` selects
    the batch element to decode (the batched FaceDetector path)."""
    boxes = []
    for i, (conf, loc) in enumerate(outs):
        stride = 2 ** (i + 2)
        score = np.asarray(conf)[index, :, :, 1]
        reg = np.asarray(loc)[index]
        hi, wi = np.nonzero(score > score_thresh)
        if hi.size == 0:
            continue
        acx = stride / 2.0 + wi * stride
        acy = stride / 2.0 + hi * stride
        side = stride * 4.0
        l = reg[hi, wi]                              # [n, 4]
        cx = acx + l[:, 0] * _VARIANCES[0] * side
        cy = acy + l[:, 1] * _VARIANCES[0] * side
        w = side * np.exp(l[:, 2] * _VARIANCES[1])
        h = side * np.exp(l[:, 3] * _VARIANCES[1])
        boxes.append(np.stack([cx - w / 2, cy - h / 2,
                               cx + w / 2, cy + h / 2,
                               score[hi, wi]], axis=1))
    if not boxes:
        return np.zeros((0, 5), np.float32)
    return _canonical_order(np.concatenate(boxes, axis=0))


def _canonical_order(boxes: np.ndarray) -> np.ndarray:
    """Sort candidates by (score desc, x1, y1): greedy NMS tie-breaking is
    input-order-dependent for EXACTLY tied scores (constant letterbox
    padding produces them), so the dense and top-k decoders impose the
    same canonical order to stay bit-equivalent."""
    order = np.lexsort((boxes[:, 1], boxes[:, 0], -boxes[:, 4]))
    return boxes[order].astype(np.float32)


def nms(dets: np.ndarray, thresh: float = 0.3) -> np.ndarray:
    """Greedy NMS with the reference stack's +1-pixel area convention."""
    if len(dets) == 0:
        return np.zeros(0, np.int64)
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = (np.maximum(0.0, xx2 - xx1 + 1)
                 * np.maximum(0.0, yy2 - yy1 + 1))
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


def detect_faces(variables, image: np.ndarray, apply_fn=None,
                 filter_threshold: float = 0.5) -> np.ndarray:
    """RGB frame -> [N, 5] face boxes (x1, y1, x2, y2, score), best first.

    The conv trunk runs on device (jitted per input shape — offline
    preprocessing recompiles per image size, as any static-shape XLA
    program does); candidate decode + NMS + the 0.5 score filter run on
    the host, matching `face_alignment`'s SFDDetector end to end.
    """
    if apply_fn is None:
        apply_fn = jax.jit(lambda v, x: S3FD().apply(v, x))
    inp = jnp.asarray(preprocess(image))[None]
    dets = decode_detections(apply_fn(variables, inp))
    dets = dets[nms(dets)]
    return dets[dets[:, 4] > filter_threshold]


def letterbox(image: np.ndarray, det_size: int) -> tuple[np.ndarray, float]:
    """Scale the frame to fit a `det_size` square (preserving aspect) and
    zero-pad bottom/right.  Returns (canvas RGB in the input's dtype,
    scale) where original coords = canvas coords / scale.  uint8 input
    stays uint8 — the batched detector uploads the canvas raw (4x fewer
    bytes than f32 on the wire) and subtracts the channel means on device.

    This is the canonical-input-size trick that lets the batched detector
    compile ONCE for arbitrary in-the-wild image sizes: any static-shape XLA
    program recompiles per distinct shape, so the per-image shape variance
    moves to a cheap host resize instead (the reference stack resizes on the
    host too — torch SFD just hides the per-shape cost as CUDA kernel
    re-selection rather than recompilation).
    """
    import cv2

    h, w = image.shape[:2]
    scale = det_size / max(h, w)
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    image = np.asarray(image)
    dt = image.dtype if image.dtype == np.uint8 else np.float32
    resized = cv2.resize(image.astype(dt), (nw, nh),
                         interpolation=cv2.INTER_LINEAR)
    canvas = np.zeros((det_size, det_size, 3), dt)
    canvas[:nh, :nw] = resized[..., :3]
    return canvas, scale


class FaceDetector:
    """Warm, batched S3FD at a canonical input size — one compile total.

    The per-image `detect_faces` path jits per input shape (every distinct
    in-the-wild image size recompiles, ~20-40 s each on this stack); this
    class letterboxes every frame to `det_size` on the host, runs the conv
    trunk batched (padding tail batches to the warm shape), and rescales the
    decoded boxes back to original-image coordinates.  Decode + NMS + the
    0.5 score filter stay host-side per image, matching face_alignment's
    SFDDetector numeric contract on the letterboxed frame.

    dtype=bfloat16 runs the trunk on the MXU at full rate; scores shift by
    ~1e-2 versus float32 (enough to flip boxes within ~1e-2 of the 0.5
    filter, not enough to move a confident detection), and boxes by well
    under a pixel at det_size 640.
    """

    def __init__(self, variables, det_size: int = 640, batch_size: int = 4,
                 dtype: Any = jnp.float32, filter_threshold: float = 0.5,
                 score_thresh: float = 0.05, topk: int = 256,
                 warm: bool = True):
        self.variables = variables
        self.det_size = det_size
        self.batch_size = batch_size
        self.filter_threshold = filter_threshold
        # anchor-candidate floor (face_alignment's 0.05 default); benches
        # on random-init weights raise it so the host NMS sees a realistic
        # candidate count
        self.score_thresh = score_thresh
        self.topk = topk
        net = S3FD(dtype=dtype)
        # mean subtraction in-graph: the canvas uploads RAW (uint8 for
        # uint8 frames — 4x fewer wire bytes; f32→uint8 conversion of an
        # integer canvas is exact, so this matches host `preprocess`)
        mean = jnp.asarray(_MEAN, jnp.float32)

        def apply(v, x):
            outs = net.apply(v, x.astype(jnp.float32) - mean)
            # compact egress: the full head maps are ~0.9 MB/image of
            # device->host traffic (the serving bottleneck on a remote
            # chip); fetch only each scale's top-k candidates instead
            # (~topk * 6 floats/image).  Identical to the dense decode
            # whenever fewer than k anchors clear the score floor — true
            # for real faces at face_alignment's 0.05 (a face yields tens
            # of candidates per scale, not hundreds).
            cands = []
            for conf, loc in outs:
                b = conf.shape[0]
                score = conf[..., 1].reshape(b, -1).astype(jnp.float32)
                k = min(self.topk, score.shape[1])
                val, idx = jax.lax.top_k(score, k)
                sel = jnp.take_along_axis(
                    loc.reshape(b, -1, 4).astype(jnp.float32),
                    idx[..., None], axis=1)
                cands.append((val, idx.astype(jnp.int32), sel))
            return cands

        # head spatial widths for unflattening idx, from shape inference
        shapes = jax.eval_shape(
            net.apply, variables,
            jax.ShapeDtypeStruct((batch_size, det_size, det_size, 3),
                                 jnp.float32))
        self._head_ws = [conf.shape[2] for conf, _ in shapes]
        self._apply = jax.jit(apply)
        if warm:
            z = jnp.zeros((batch_size, det_size, det_size, 3), jnp.uint8)
            jax.block_until_ready(self._apply(self.variables, z))

    def _decode_topk(self, cands, index: int) -> np.ndarray:
        """Per-scale (scores, flat indices, locs) -> [N, 5] candidates
        above score_thresh — decode_detections' anchor math over the
        device-side top-k instead of the dense grid."""
        boxes = []
        for i, (val, idx, sel) in enumerate(cands):
            stride = 2 ** (i + 2)
            ws = self._head_ws[i]
            v = np.asarray(val[index])
            keep = v > self.score_thresh
            if not keep.any():
                continue
            flat = np.asarray(idx[index])[keep]
            l = np.asarray(sel[index])[keep]
            hi, wi = flat // ws, flat % ws
            acx = stride / 2.0 + wi * stride
            acy = stride / 2.0 + hi * stride
            side = stride * 4.0
            cx = acx + l[:, 0] * _VARIANCES[0] * side
            cy = acy + l[:, 1] * _VARIANCES[0] * side
            w = side * np.exp(l[:, 2] * _VARIANCES[1])
            h = side * np.exp(l[:, 3] * _VARIANCES[1])
            boxes.append(np.stack([cx - w / 2, cy - h / 2,
                                   cx + w / 2, cy + h / 2,
                                   v[keep]], axis=1))
        if not boxes:
            return np.zeros((0, 5), np.float32)
        return _canonical_order(np.concatenate(boxes, axis=0))

    def __call__(self, images) -> list[np.ndarray]:
        """RGB frames (any sizes) -> per-image [N, 5] boxes (x1, y1, x2,
        y2, score) in ORIGINAL image coordinates, best-scoring first."""
        results: list[np.ndarray] = []
        bs = self.batch_size
        for start in range(0, len(images), bs):
            chunk = images[start:start + bs]
            n = len(chunk)
            pairs = [letterbox(im, self.det_size) for im in chunk]
            batch = np.stack([c for c, _ in pairs])
            if n < bs:   # pad the tail to the warm shape
                batch = np.concatenate(
                    [batch, np.zeros((bs - n,) + batch.shape[1:],
                                     batch.dtype)])
            cands = jax.device_get(self._apply(self.variables,
                                               jnp.asarray(batch)))
            for i in range(n):
                dets = self._decode_topk(cands, index=i)
                dets = dets[nms(dets)]
                dets = dets[dets[:, 4] > self.filter_threshold]
                dets[:, :4] /= pairs[i][1]     # back to original coords
                results.append(dets)
        return results


def load_sfd_npz(path: str):
    """Load converted S3FD weights (tools/convert_sfd_weights.py)."""
    from blindshadowremoval_tpu.models.fan import variables_from_flat

    raw = np.load(path)
    return variables_from_flat({k: raw[k] for k in raw.files})
