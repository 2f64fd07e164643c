"""Dynamic-batching frontend vs the raw batch API on the real chip.

Replays N single-image requests (the real 02165 sample face) through
`BatchingFrontend.submit()` from client threads and compares wall/occupancy
against one `remove_shadows` call with the same N — quantifying what the
latency-bounded coalescing costs/buys over the hand-batched path the CLI
uses.  The reference has no serving story (its eval loops are per-image
eager scripts, train_test_GSC.py:840-890).

Usage: python tools/bench_serving_frontend.py [--requests 128]
       [--max-delay-ms 5] [--clients 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REF = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--max-delay-ms", type=float, default=5.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()

    import cv2

    from blindshadowremoval_tpu.config import get_config
    from blindshadowremoval_tpu.eval.serving import (
        BatchingFrontend, ShadowRemovalService)
    from blindshadowremoval_tpu.train.trainer import init_generator_vars
    from blindshadowremoval_tpu.utils.compilecache import (
        enable_persistent_cache)

    enable_persistent_cache()
    cfg = get_config("in_the_wild")
    img = cv2.cvtColor(
        cv2.imread(os.path.join(REF, "sample_imgs", "02165", "02165.png")),
        cv2.COLOR_BGR2RGB) / 255.0
    lm = np.load(os.path.join(REF, "sample_imgs", "02165", "02165.npy"))

    _, variables = init_generator_vars(cfg)
    svc = ShadowRemovalService(cfg, variables, batch_size=args.batch_size,
                               compact_output=True, compact_ingress=True)

    # warm both paths (compile + first transfer)
    svc.remove_shadows([img] * args.batch_size, [lm] * args.batch_size)

    n = args.requests
    # ---- raw batch API: the whole N handed over at once
    t0 = time.perf_counter()
    outs = svc.remove_shadows([img] * n, [lm] * n)
    t_batch = time.perf_counter() - t0
    assert len(outs) == n

    # ---- dynamic frontend: N independent submits from client threads
    import threading

    fe = BatchingFrontend(svc, max_delay_ms=args.max_delay_ms)
    futs = [None] * n
    lat = [0.0] * n

    def client(lo, hi):
        for i in range(lo, hi):
            t = time.perf_counter()
            futs[i] = fe.submit(img, lm)
            futs[i].add_done_callback(
                lambda _f, i=i, t=t: lat.__setitem__(
                    i, time.perf_counter() - t))

    per = (n + args.clients - 1) // args.clients
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c * per,
                                                     min(n, (c + 1) * per)))
               for c in range(args.clients)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    for f in futs:
        f.result(timeout=120.0)
    t_fe = time.perf_counter() - t0
    occ = fe.requests_served / max(1, fe.batches_dispatched)
    fe.close()

    print(f"raw batch API   : {n} requests in {t_batch:.2f} s "
          f"= {n / t_batch:.1f} req/s")
    print(f"dynamic frontend: {n} requests in {t_fe:.2f} s "
          f"= {n / t_fe:.1f} req/s  "
          f"({fe.batches_dispatched} batches, mean occupancy {occ:.1f}/"
          f"{args.batch_size}, max_delay {args.max_delay_ms} ms, "
          f"{args.clients} clients)")
    print(f"request latency : mean {1e3 * float(np.mean(lat)):.0f} ms  "
          f"p95 {1e3 * float(np.percentile(lat, 95)):.0f} ms")


if __name__ == "__main__":
    sys.exit(main())
