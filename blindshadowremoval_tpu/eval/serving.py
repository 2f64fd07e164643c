"""Batched inference service for production serving.

The reference has no serving story (single-image eager eval loops); this
module provides the deployment path: a warm, fixed-shape jitted forward with
request batching and padding, so arbitrary numbers of faces stream through
the TPU at the large-batch operating point (throughput on v5e is ~8x higher
at batch 256 than at batch 8 — the model is HBM-bound and small batches
leave the chip idle between dispatches).

Usage:
    svc = ShadowRemovalService(cfg, variables, batch_size=64)
    outputs = svc.remove_shadows(images, landmarks)   # N images in, N out
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from blindshadowremoval_tpu.config import Config
from blindshadowremoval_tpu.geometry.crop import face_crop_and_resize
from blindshadowremoval_tpu.geometry.landmarks import LM_REF
from blindshadowremoval_tpu.geometry.triangulation import (
    generate_face_region,
    generate_offset_map,
    generate_uv_map,
)
from blindshadowremoval_tpu.train.trainer import build_generator


@dataclasses.dataclass
class ShadowRemovalService:
    """Warm batched inference over the flagship generator."""

    config: Config
    variables: Any
    batch_size: int = 64
    # quantize device->host egress: uint8 predictions + f16 shadow maps are
    # 3.2x fewer bytes than f32 — the fetch, not the compute, bounds serving
    # throughput when the chip is remote (and it's free bandwidth locally).
    # uint8 loses nothing: served predictions are written as 8-bit images.
    compact_output: bool = True

    def __post_init__(self):
        cfg = self.config
        self.gen = build_generator(cfg)
        s = cfg.img_size
        compact = self.compact_output

        def fwd(variables, img, uv, reg):
            if cfg.variant == "tsm":
                out = self.gen.apply(variables, img, uv, reg, frame=1,
                                     share=True, train=False)
            else:
                out = self.gen.apply(variables, img, uv, reg, train=False)
            if cfg.variant == "rgb":
                rgb, dif = jnp.clip(out, 0.0, 1.0), out[..., :1] * 0
            else:
                _, rgb, _, dif = out
                rgb = jnp.clip(rgb, 0.0, 1.0)
            if compact:
                rgb = jnp.round(rgb * 255.0).astype(jnp.uint8)
                dif = dif.astype(jnp.float16)
            return rgb, dif

        self._fwd = jax.jit(fwd)
        # warm the executable at the fixed serving shape
        z = jnp.zeros((self.batch_size, s, s, 3), jnp.float32)
        zr = jnp.zeros((self.batch_size, s, s, 6), jnp.float32)
        self._fwd(self.variables, z, z, zr)

    # ----------------------------------------------------------- pipeline
    def preprocess(self, image: np.ndarray, landmarks: np.ndarray) -> dict:
        """Host side: crop/align one face and build its geometry maps."""
        s = self.config.img_size
        crop, lm, _, box = face_crop_and_resize(image, landmarks, s)
        return {
            "img": crop,
            "uv": generate_uv_map(lm, s),
            "reg": np.concatenate([generate_offset_map(lm, LM_REF, s),
                                   generate_offset_map(LM_REF, lm, s)], 2),
            "face": generate_face_region(lm, s),
            "box": box,
        }

    def remove_shadows(self, images: Sequence[np.ndarray],
                       landmarks: Sequence[np.ndarray]) -> list[dict]:
        """Batched end-to-end: N (image, 68x2 landmark) pairs ->
        [{'pred', 'mask_pred', 'box'}]."""
        views = [self.preprocess(im, lm) for im, lm in zip(images, landmarks)]
        results: list[dict] = []
        bs = self.batch_size
        for start in range(0, len(views), bs):
            chunk = views[start:start + bs]
            n = len(chunk)

            def stack(key):
                arr = np.stack([v[key] for v in chunk]).astype(np.float32)
                if n < bs:   # pad the tail batch to the warm shape
                    pad = np.zeros((bs - n,) + arr.shape[1:], np.float32)
                    arr = np.concatenate([arr, pad])
                return jnp.asarray(arr)

            rgb, dif = self._fwd(self.variables, stack("img"), stack("uv"),
                                 stack("reg"))
            rgb = np.asarray(rgb)[:n]
            dif = np.asarray(dif)[:n]
            if self.compact_output:
                rgb = rgb.astype(np.float32) / 255.0
                dif = dif.astype(np.float32)
            for i, v in enumerate(chunk):
                results.append({
                    "pred": rgb[i],
                    "mask_pred": dif[i] * v["face"],
                    "box": v["box"],
                })
        return results
