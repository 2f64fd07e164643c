#!/usr/bin/env python
"""Generate golden regression fixtures (tests/goldens/goldens.npz).

Locks the numerics of the geometry/synthesis/model stack on CPU so future
refactors (and future build rounds) can detect unintended drift — the role
the reference's checked-in golden result PNGs play (SURVEY.md §4.3).
Regenerate deliberately with `python tools/make_goldens.py` after an
intentional numerics change.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from blindshadowremoval_tpu.data.synthesis import compose_shadow_image  # noqa: E402
from blindshadowremoval_tpu.geometry.landmarks import LM_REF  # noqa: E402
from blindshadowremoval_tpu.geometry.triangulation import (  # noqa: E402
    generate_face_region,
    generate_offset_map,
    generate_uv_map,
)
from blindshadowremoval_tpu.models.generator import GSCGenerator  # noqa: E402
from blindshadowremoval_tpu.ops.perlin import render_perlin_mask  # noqa: E402
from blindshadowremoval_tpu.ops.ssscatter import apply_ss_shadow_map  # noqa: E402

S = 64
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "goldens.npz")


def main() -> int:
    rng = np.random.default_rng(123)
    lm = (LM_REF + rng.normal(scale=0.01, size=LM_REF.shape)).astype(np.float32)

    uv = generate_uv_map(lm, S)
    off = generate_offset_map(lm, LM_REF, S)
    face = generate_face_region(lm, S)

    pmask = np.asarray(render_perlin_mask(jax.random.PRNGKey(7), (S, S)))
    ss = np.asarray(apply_ss_shadow_map(
        jax.random.PRNGKey(8), jnp.asarray(pmask)))

    gt = rng.uniform(size=(2, S, S, 3)).astype(np.float32)
    dark = (gt * 0.6).astype(np.float32)
    mask = (rng.uniform(size=(2, S, S, 1)) > 0.7).astype(np.float32)
    facex = np.broadcast_to(face[None, :, :, :1], (2, S, S, 1)).astype(np.float32)
    img, mask_sv, _ = compose_shadow_image(
        jax.random.PRNGKey(9), jnp.asarray(mask), jnp.asarray(gt),
        jnp.asarray(dark), jnp.asarray(facex))

    gen = GSCGenerator()
    reg = np.concatenate([off, off], axis=2)[None].astype(np.float32)
    inp = gt[:1]
    variables = gen.init(jax.random.PRNGKey(0), jnp.asarray(inp),
                         jnp.asarray(uv[None]), jnp.asarray(reg))
    gs, rgb, _, dif = gen.apply(variables, jnp.asarray(inp),
                                jnp.asarray(uv[None]), jnp.asarray(reg))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(
        OUT,
        lm=lm,
        uv=uv.astype(np.float16),
        off=off.astype(np.float16),
        face=face.astype(np.float16),
        pmask=pmask.astype(np.float16),
        ss=ss.astype(np.float16),
        synth_img=np.asarray(img).astype(np.float16),
        synth_mask_sv=np.asarray(mask_sv).astype(np.float16),
        gen_rgb=np.asarray(rgb).astype(np.float16),
        gen_dif=np.asarray(dif).astype(np.float16),
    )
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
