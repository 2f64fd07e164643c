"""Headline benchmark: GSC generator inference throughput on one TPU chip.

Prints exactly one JSON line:
  {"metric": "faces_per_sec_per_chip", "value": N, "unit": "faces/s",
   "vs_baseline": N / 500}

The 500 faces/sec/chip @256px target is the BASELINE.md north star (the
reference publishes no numbers; its eval loop is single-image eager TF).
Measured on the flagship GSCGenerator at 256x256 in bfloat16, batch 256.

Measurement design, calibrated against the axon tunnel's semantics:
  * `jax.block_until_ready` does NOT wait for remote execution through the
    tunnel — only an actual device->host fetch does.  Timing loops that only
    block_until_ready report 100-1000x inflated throughput.
  * So the benchmark runs ITERS forwards inside one `lax.scan` reduced to a
    scalar, and times a post-warmup call ending in a scalar fetch: one
    ~40 ms tunnel roundtrip amortized over ITERS batched forwards.
  * Inputs are perturbed per scan step and per call; result values are
    checked to change between calls.

Optimization history (all measured on this harness, batch 128):
  * unfused baseline               ~0.48 ms/face  (2187 faces/s at batch 256)
  * + fused 2-channel output head  ~0.35 ms/face  (a 7x7 conv to 1 channel
    costs the same as to 2 on the MXU; the model had two)
  * + matmul-form bilinear resize  ~0.27 ms/face  (3647 faces/s)
Remaining profile: ~89 us res/NonLocal stack (Pallas-fused attention),
~84 us the fused 7x7 head (XLA's small-output-channel lowering measured
within 2x of alternatives tried: tap-major GEMM + shift-add 155 us,
space-to-depth 94 us), ~100 us encoder/decoder convs near fusion limits.
Round 2: a full space-to-depth path for conv1/head (config.s2d_convs,
models/blocks.py) measured 3762 faces/s vs this 4050 baseline — XLA's own
lowering + the repack overhead win at these shapes; flag defaults off.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FACES_PER_SEC = 500.0
# batch sweep on v5e (32..512): 128 is the throughput sweet spot
BATCH = 128
ITERS = 40


def main() -> None:
    import jax
    import jax.numpy as jnp

    from blindshadowremoval_tpu.models.generator import GSCGenerator

    s = 256
    # serving configuration: bf16 + int8 output head (head-output parity
    # 38-40 dB vs f32; final-output ~22 dB on a trained checkpoint via the
    # mask binarization — the throughput-first opt-in path, docs/perf.md).
    # The static activation bound (18.29, tools/calibrate_int8_head.py on
    # real UCB data with the demo checkpoint) removes the dynamic-max
    # quantize pass so it fuses into the producer (ops/quant.py).
    gen = GSCGenerator(dtype=jnp.bfloat16, int8_head=True,
                       int8_head_scale=18.29)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(BATCH, s, s, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(BATCH, s, s, 3)).astype(np.float32))
    reg = jnp.asarray(
        rng.uniform(-0.02, 0.02, size=(BATCH, s, s, 6)).astype(np.float32))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), img, uv, reg)

    @jax.jit
    def bench(v, i, u, r):
        def body(carry, t):
            _, rgb, _, dif = gen.apply(v, i + t.astype(jnp.float32) * 1e-6,
                                       u, r)
            return carry + jnp.mean(rgb) + jnp.mean(dif), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    # warmup: compile + execute + fetch
    v0 = float(bench(variables, img, uv, reg))

    best = float("inf")
    prev = v0
    for trial in range(1, 4):
        t0 = time.perf_counter()
        val = float(bench(variables, img + jnp.float32(trial * 1e-5), uv, reg))
        dt = time.perf_counter() - t0
        assert val != prev, "benchmark result did not change — stale replay?"
        prev = val
        best = min(best, dt)

    faces_per_sec = BATCH * ITERS / best
    print(json.dumps({
        "metric": "faces_per_sec_per_chip",
        "value": round(faces_per_sec, 2),
        "unit": "faces/s",
        "vs_baseline": round(faces_per_sec / BASELINE_FACES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
