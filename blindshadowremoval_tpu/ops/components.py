"""Connected components on device via iterative label propagation.

The reference's eval-time post-processing calls OpenCV's CPU
`connectedComponentsWithStats` (train_test_GSC.py:590) to keep only shadow
blobs >= 0.45x the largest.  Here the labeling runs on-device: every
foreground pixel starts with its own linear index as label and a
`lax.while_loop` of 4-neighbor min-propagation (a sliding-window min per
step) runs to a fixed point — O(diameter) steps of cheap VPU work, with an
early-exit convergence check so typical shadow masks converge in tens of
iterations.  Component statistics come from `segment_sum` over the final
labels.

This is the framework's "genuinely novel kernel" obligation from SURVEY.md
§2b; `connected_components_host` remains as an opencv fallback/oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("max_iters", "connectivity"))
def label_components(mask: jax.Array, max_iters: int = 4096,
                     connectivity: int = 4) -> jax.Array:
    """Label 4- (or 8-) connected components of a binary mask.

    mask: (H, W) bool/0-1.  Returns (H, W) int32: -1 for background, else a
    component id equal to the minimum linear index in the component (so ids
    are stable and order-free but NOT dense; see `component_sizes`).
    """
    h, w = mask.shape
    fg = mask.astype(bool)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
           + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    big = jnp.int32(h * w)
    labels = jnp.where(fg, idx, big)

    def neighbor_min(lbl):
        padded = jnp.pad(lbl, 1, constant_values=big)
        m = lbl
        m = jnp.minimum(m, padded[:-2, 1:-1])   # up
        m = jnp.minimum(m, padded[2:, 1:-1])    # down
        m = jnp.minimum(m, padded[1:-1, :-2])   # left
        m = jnp.minimum(m, padded[1:-1, 2:])    # right
        if connectivity == 8:
            m = jnp.minimum(m, padded[:-2, :-2])
            m = jnp.minimum(m, padded[:-2, 2:])
            m = jnp.minimum(m, padded[2:, :-2])
            m = jnp.minimum(m, padded[2:, 2:])
        return jnp.where(fg, m, big)

    def cond(state):
        lbl, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        lbl, _, it = state
        new = neighbor_min(lbl)
        # pointer-jumping: adopt the label of the pixel your label points to —
        # contracts long chains geometrically (union-find style).  Labels are
        # linear indices of foreground pixels (or `big` for background), so
        # extending the flat label array by one `big` entry makes the gather
        # total.
        flat_ext = jnp.append(new.reshape(-1), big)
        jumped = jnp.minimum(new, flat_ext[new].reshape(h, w))
        jumped = jnp.where(fg, jumped, big)
        return jumped, jnp.any(jumped != lbl), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.asarray(True), jnp.int32(0)))
    return jnp.where(fg, labels, -1)


@functools.partial(jax.jit, static_argnames=())
def component_sizes(labels: jax.Array) -> jax.Array:
    """Pixel count per component id -> flat (H*W,) array where entry i is the
    size of the component whose id is i (0 where no such component)."""
    h, w = labels.shape
    flat = labels.reshape(-1)
    ones = (flat >= 0).astype(jnp.int32)
    seg = jnp.where(flat >= 0, flat, 0)
    return jax.ops.segment_sum(ones, seg, num_segments=h * w)


@functools.partial(jax.jit, static_argnames=())
def filter_components(mask: jax.Array, labels: jax.Array,
                      min_frac_of_max: jax.Array,
                      veto_region: jax.Array | None = None,
                      veto_max_overlap: jax.Array | None = None) -> jax.Array:
    """Keep components >= min_frac_of_max * largest size, optionally dropping
    components overlapping `veto_region` by more than `veto_max_overlap`.

    Reproduces the reference's blob filter (train_test_GSC.py:593-611):
    min_size = 0.45 * max(sizes); drop if hair overlap fraction >= 0.8.
    """
    sizes = component_sizes(labels)
    max_size = jnp.max(sizes)
    flat = labels.reshape(-1)
    safe = jnp.where(flat >= 0, flat, 0)
    px_size = jnp.where(flat >= 0, sizes[safe], 0)
    keep = px_size >= min_frac_of_max * max_size

    if veto_region is not None:
        overlap = jax.ops.segment_sum(
            (veto_region.reshape(-1) > 0).astype(jnp.int32) * (flat >= 0),
            jnp.where(flat >= 0, flat, 0),
            num_segments=labels.shape[0] * labels.shape[1])
        frac = overlap[safe] / jnp.maximum(px_size, 1)
        keep = keep & (frac < veto_max_overlap)

    return (keep & (flat >= 0)).astype(jnp.float32).reshape(labels.shape)


def connected_components_host(mask: np.ndarray, connectivity: int = 4):
    """OpenCV oracle/fallback: (num_labels, labels, sizes)."""
    import cv2

    n, lab, stats, _ = cv2.connectedComponentsWithStats(
        mask.astype(np.uint8), connectivity=connectivity)
    return n, lab, stats[:, -1]
