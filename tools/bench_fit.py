"""End-to-end `fit()`-path training throughput through the REAL host loader.

`tools/bench_train.py` measures the device-only step rate (one synthetic
batch pre-staged on device, K steps chained in a scan).  This tool measures
what the `fit()` inner loop actually achieves when every step's batch must
come from `Dataset._train_iter` (thread-pool parse: decode -> crop ->
shadow synthesis -> geometry primitives) and be shipped to the device —
and it decomposes the result so the bottleneck is named, not guessed:

  * loader-only  : samples/s through the real thread-pool iterator;
  * upload-only  : host->device transfer rate for one assembled batch
                   (dominant through the axon tunnel; negligible on a
                   host-attached deployment);
  * end-to-end   : the fit() loop itself — _next_batch + donated jitted
                   step — timed over N steps with a final loss fetch
                   (the tunnel-safe sync; block_until_ready does not wait).

Reference feed: dataset.py:75-109 (single-threaded tf.data-less loop).

Usage: python tools/bench_fit.py [--batch 32] [--steps 12] [--warm 3]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np



def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--loader-samples", type=int, default=48)
    ap.add_argument("--data", default="/root/reference/UCB/train/gt/*")
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--vgg-dtype", default="bfloat16")
    ap.add_argument("--compact", action="store_true",
                    help="uint16 fixed-point train ingress "
                         "(config.compact_ingress wire format)")
    ap.add_argument("--device-darken", action="store_true",
                    help="derive (gt, img_dark) in-graph "
                         "(config.device_darken wire format)")
    ap.add_argument("--u8", action="store_true",
                    help="quantize the compact wire at 1/255 (uint8) "
                         "instead of 1/65535 (config.ingress_u8)")
    ap.add_argument("--prefetch", action="store_true",
                    help="double-buffer host parse + upload of batch i+1 "
                         "behind step i (fit()'s _BatchPrefetcher)")
    ap.add_argument("--sync-every", type=int, default=0,
                    help="fetch a loss scalar every N steps (fit() with "
                         "--log-every N does this); each fetch drains the "
                         "dispatch pipeline, which is where the prefetcher "
                         "pays — without syncs the async dispatch queue "
                         "already overlaps uploads")
    args = ap.parse_args()

    import jax
    from blindshadowremoval_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.data.dataset import Dataset
    from blindshadowremoval_tpu.train.loop import _next_batch
    from blindshadowremoval_tpu.train.trainer import Trainer

    cfg = get_config(
        "train", img_size=256, batch_size=args.batch,
        compute_dtype=args.compute_dtype, vgg_dtype=args.vgg_dtype,
        remat=True, device_geometry=True,
        compact_ingress=args.compact, device_darken=args.device_darken,
        ingress_u8=args.u8,
        data_dirs=(args.data,), checkpoint_dir="/tmp/bench_fit_ckpt")
    ds = Dataset(cfg, "train", seed=0)
    print(f"corpus: {len(ds.name_list)} identities; "
          f"loader workers: {max(2, min(os.cpu_count() or 1, 16))} threads "
          f"on {os.cpu_count()} core(s)")

    # ---- loader-only: samples/s through the real thread-pool iterator
    feed = iter(ds)
    for _ in range(8):      # warm: mask pool, jit of host helpers, caches
        next(feed)
    t0 = time.perf_counter()
    for _ in range(args.loader_samples):
        next(feed)
    dt = time.perf_counter() - t0
    per_sample = dt / args.loader_samples
    loader_rate = 1.0 / per_sample
    print(f"loader-only: {1e3 * per_sample:.1f} ms/sample "
          f"({loader_rate:.1f} samples/s = {2 * loader_rate:.1f} views/s; "
          f"batch {args.batch} needs one batch per device step)")

    # ---- one assembled batch: size + upload rate through this link
    # (assembled on host — np.asarray on an already-device-put batch would
    # measure a device->host fetch instead)
    views = [next(feed) for _ in range(args.batch)]
    up = {k: np.concatenate([np.asarray(v[k]) for v in views], axis=0)
          for k in views[0]}
    if args.compact:
        from blindshadowremoval_tpu.train.loop import _COMPACT_KEYS
        scale, dt = (255.0, np.uint8) if args.u8 else (65535.0, np.uint16)
        for k in _COMPACT_KEYS:
            if k in up:
                up[k] = np.round(
                    np.clip(up[k], 0.0, 1.0) * scale).astype(dt)
    nbytes = sum(v.nbytes for v in up.values())
    jax.block_until_ready(jax.device_put(up))          # warm the path
    t0 = time.perf_counter()
    staged = jax.device_put(up)
    # a fetch is the only reliable remote sync; pull one element per array
    for v in staged.values():
        np.asarray(v[0, 0])
    t_up = time.perf_counter() - t0
    print(f"upload-only: {nbytes / 1e6:.1f} MB/batch, {t_up:.2f} s "
          f"({nbytes / t_up / 1e6:.1f} MB/s through this link)")

    # ---- end-to-end fit() inner loop
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0))
    raw_step = type(trainer).train_step.__wrapped__
    step_fn = jax.jit(functools.partial(raw_step, trainer),
                      static_argnames=("train",),
                      donate_argnames=("state",))
    key = jax.random.PRNGKey(1)

    print("compiling the train step ...", flush=True)
    for _ in range(args.warm):
        b = _next_batch(feed, args.batch, compact=args.compact, u8=args.u8)
        key, sub = jax.random.split(key)
        state, losses, _ = step_fn(state, b, sub, train=True)
    print(f"warm recon_c={float(losses['recon_c']):.4f}", flush=True)

    get_batch = None
    if args.prefetch:
        from blindshadowremoval_tpu.train.loop import _BatchPrefetcher
        get_batch = _BatchPrefetcher(feed, args.batch, compact=args.compact,
                                     u8=args.u8)
        next(get_batch)        # let the buffer fill so step 1 is overlapped

    t0 = time.perf_counter()
    for i in range(args.steps):
        b = (next(get_batch) if get_batch is not None else
             _next_batch(feed, args.batch, compact=args.compact, u8=args.u8))
        key, sub = jax.random.split(key)
        state, losses, _ = step_fn(state, b, sub, train=True)
        if args.sync_every and (i % args.sync_every == 0):
            float(losses["recon_c"])       # the fit() log fetch
    final = float(losses["recon_c"])      # syncs the whole chain
    dt = time.perf_counter() - t0
    if get_batch is not None:
        get_batch.close()
    views = 2 * args.batch
    step_s = dt / args.steps
    print(f"end-to-end fit() loop: {step_s * 1e3:.0f} ms/step at batch "
          f"{args.batch} ({views / step_s:.1f} views/s; "
          f"final recon_c={final:.4f})")
    print(f"decomposition per step: host parse {args.batch * per_sample:.2f}"
          f" s | upload {t_up:.2f} s | measured {step_s:.2f} s")
    feed.close()


if __name__ == "__main__":
    main()
