"""TPU throughput of the in-repo landmark stack (S3FD detect + 2D-FAN align).

The reference's preprocessing step (`bmvc2022-dataprocess.py:10-29`) runs
`face_alignment.get_landmarks` per image, eager torch on a GPU.  Our port
(`models/sfd.py`, `models/fan.py`) jits both networks, so the offline
landmark pass can be batched onto the TPU.  This tool measures:

  * FAN forward + heatmap decode (the per-face cost: every detected face
    pays one 256x256 FAN pass), batched, bf16 — reported as faces/s.
  * S3FD trunk forward (the per-image cost), batched at a static input
    size — reported as images/s.  Host decode+NMS run per image on the CPU
    and are timed separately on synthetic logits (they overlap device work
    in a pipeline, so the device number is the ceiling).

Weights are random-init: throughput is shape-determined, and the published
checkpoints are external downloads (tools/convert_{fan,sfd}_weights.py).

Usage: python tools/bench_landmarks.py [--batch 32] [--det-size 640]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


# bench.py is the repo-root driver harness, not part of the installed
# package -- resolve it relative to this file
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import timed_scan_fn  # noqa: E402  (shared measurement harness)


def bench_fan(batch: int, iters: int, dtype) -> float:
    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from blindshadowremoval_tpu.models.fan import FAN, decode_heatmaps

    fan = FAN(dtype=dtype)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(batch, 256, 256, 3)).astype(np.float32))
    variables = jax.jit(fan.init)(jax.random.PRNGKey(0), img)

    def step(v, i):
        pts = decode_heatmaps(fan.apply(v, i)[-1])   # [B, 68, 2]
        return jnp.mean(pts.astype(jnp.float32))

    best = timed_scan_fn(step, variables, img, iters=iters)
    return batch * iters / best


def bench_sfd(batch: int, size: int, iters: int, dtype) -> float:
    import jax
    import jax.numpy as jnp

    from blindshadowremoval_tpu.models.sfd import S3FD

    net = S3FD(dtype=dtype)
    rng = np.random.default_rng(1)
    img = jnp.asarray(
        rng.uniform(-120, 130, size=(batch, size, size, 3)).astype(np.float32))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0), img)

    def step(v, i):
        outs = net.apply(v, i)
        return sum(jnp.mean(c.astype(jnp.float32))
                   + jnp.mean(l.astype(jnp.float32)) for c, l in outs)

    best = timed_scan_fn(step, variables, img, iters=iters)
    return batch * iters / best


def time_host_decode(size: int, n: int = 20) -> float:
    """Per-image host decode+NMS seconds on synthetic detector outputs."""
    from blindshadowremoval_tpu.models.sfd import decode_detections, nms

    rng = np.random.default_rng(2)
    outs = []
    for k in range(6):
        s = size // (4 * 2 ** k)
        # realistic softmaxed conf: near-zero face probability everywhere
        # with a few dozen peaked positions (a multi-face frame) — uniform
        # noise would put half the anchor grid above threshold and time the
        # NMS loop on tens of thousands of boxes no real image produces
        face = rng.uniform(0.0, 0.02, size=(1, s, s)).astype(np.float32)
        n_peaks = max(1, 32 >> k)
        ph = rng.integers(0, s, n_peaks)
        pw = rng.integers(0, s, n_peaks)
        face[0, ph, pw] = rng.uniform(0.3, 1.0, n_peaks)
        conf = np.stack([1.0 - face, face], axis=-1)
        loc = rng.uniform(-1, 1, size=(1, s, s, 4)).astype(np.float32)
        outs.append((conf, loc))
    t0 = time.perf_counter()
    for _ in range(n):
        dets = decode_detections(outs)
        if len(dets):
            nms(dets)
    return (time.perf_counter() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--det-batch", type=int, default=8)
    ap.add_argument("--det-size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax.numpy as jnp

    dtype = jnp.dtype(args.dtype)
    faces_s = bench_fan(args.batch, args.iters, dtype)
    print(f"FAN align (batch {args.batch}, 256x256, {args.dtype}): "
          f"{faces_s:.1f} faces/s")
    imgs_s = bench_sfd(args.det_batch, args.det_size, args.iters, dtype)
    print(f"S3FD detect trunk (batch {args.det_batch}, "
          f"{args.det_size}x{args.det_size}, {args.dtype}): "
          f"{imgs_s:.1f} images/s")
    host_s = time_host_decode(args.det_size)
    print(f"S3FD host decode+NMS: {host_s * 1e3:.2f} ms/image "
          f"({1.0 / host_s:.0f} images/s ceiling on one core)")


if __name__ == "__main__":
    main()
