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

    def __post_init__(self):
        cfg = self.config
        self.gen = build_generator(cfg)
        s = cfg.img_size

        def fwd(variables, img, uv, reg):
            if cfg.variant == "tsm":
                out = self.gen.apply(variables, img, uv, reg, frame=1,
                                     share=True, train=False)
            else:
                out = self.gen.apply(variables, img, uv, reg, train=False)
            if cfg.variant == "rgb":
                return jnp.clip(out, 0.0, 1.0), out[..., :1] * 0
            _, rgb, _, dif = out
            return jnp.clip(rgb, 0.0, 1.0), dif

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
            for i, v in enumerate(chunk):
                results.append({
                    "pred": rgb[i],
                    "mask_pred": dif[i] * v["face"],
                    "box": v["box"],
                })
        return results
