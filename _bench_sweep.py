import json, time, sys
import numpy as np
import jax, jax.numpy as jnp
from blindshadowremoval_tpu.models.generator import GSCGenerator

s = 256
ITERS = 40
gen = GSCGenerator(dtype=jnp.bfloat16, int8_head=True, int8_head_scale=18.29)
rng = np.random.default_rng(0)

for BATCH in [64, 96, 128, 192, 256]:
    img = jnp.asarray(rng.uniform(size=(BATCH, s, s, 3)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(size=(BATCH, s, s, 3)).astype(np.float32))
    reg = jnp.asarray(rng.uniform(-0.02, 0.02, size=(BATCH, s, s, 6)).astype(np.float32))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0), img, uv, reg)

    @jax.jit
    def bench(v, i, u, r):
        def body(carry, t):
            _, rgb, _, dif = gen.apply(v, i + t.astype(jnp.float32) * 1e-6, u, r)
            return carry + jnp.mean(rgb) + jnp.mean(dif), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(ITERS))
        return acc

    v0 = float(bench(variables, img, uv, reg))
    best = float("inf"); prev = v0
    for trial in range(1, 4):
        t0 = time.perf_counter()
        val = float(bench(variables, img + jnp.float32(trial * 1e-5), uv, reg))
        dt = time.perf_counter() - t0
        assert val != prev
        prev = val
        best = min(best, dt)
    print(json.dumps({"batch": BATCH, "faces_per_sec": round(BATCH*ITERS/best, 1)}), flush=True)
