"""Serving-time BatchNorm folding.

In eval mode BatchNorm is a per-channel affine of its (frozen) running
statistics:

    y_c = gamma_c * (x_c - mean_c) / sqrt(var_c + eps) + beta_c

Every BatchNorm in the generator family directly follows a convolution
(ConvBlock / ConvTBlock / ResBottleneck / NonLocalBlock — model.py:115-177's
Conv/Conv2DTranspose + BatchNormalization pairs in the reference), so the
affine folds EXACTLY into that convolution's kernel and bias:

    s_c      = gamma_c / sqrt(var_c + eps)
    kernel'  = kernel * s_c        (output-channel axis)
    bias'    = (bias - mean_c) * s_c + beta_c

The folded model computes the identical function with no BatchNorm ops in
the graph: on TPU the convolutions lower to custom calls whose outputs feed
standalone elementwise fusions, so folding deletes the affine's share of
those HBM round trips (measured in docs/perf.md; the LeakyReLU pass
remains).  Folding is serving-only — training needs live statistics.

Usage: build the generator with `fold_bn=True` (config.fold_bn) and feed it
`fold_batch_norm(variables)` instead of the restored variables.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

BN_EPS = 1e-3   # Keras default, fixed across the model family (blocks.py)


def _fold_pair(conv: dict, bn_params: dict, bn_stats: dict) -> dict:
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    kernel = conv["kernel"] * s          # [..., cout] broadcast
    bias = conv.get("bias", 0.0)
    bias = (bias - bn_stats["mean"]) * s + bn_params["bias"]
    out = dict(conv)
    out["kernel"] = kernel
    out["bias"] = bias
    return out


def _conv_for(bn_name: str, node: dict) -> str | None:
    """The sibling convolution whose output this BatchNorm normalizes.

    Naming is fixed by the block definitions (models/blocks.py): ConvBlock
    pairs BatchNorm_0 with Conv_0, ConvTBlock with ConvTranspose_0,
    ResBottleneck pairs BatchNorm_k with Conv_k, and NonLocalBlock's
    BatchNorm_0 follows its `w` 1x1 conv.
    """
    idx = bn_name.split("_")[-1]
    for cand in (f"Conv_{idx}", f"ConvTranspose_{idx}", "w"):
        if cand in node:
            return cand
    return None


def fold_batch_norm(variables: dict) -> dict:
    """Fold every eval-mode BatchNorm into its producing convolution.

    Takes the generator's restored variable collection ({params,
    batch_stats}) and returns `{"params": ...}` for a generator built with
    `fold_bn=True`: BatchNorm entries are removed and their affine folded
    into the paired convolution's kernel/bias.  Raises if a BatchNorm has
    no identifiable producer (a new block shape would need a rule here).
    """
    def walk(params: Any, stats: Any) -> Any:
        if not isinstance(params, dict):
            return params
        out = {}
        for name, child in params.items():
            if name.startswith("BatchNorm_"):
                continue
            out[name] = walk(child, (stats or {}).get(name))
        for name, child in params.items():
            if not name.startswith("BatchNorm_"):
                continue
            conv = _conv_for(name, params)
            if conv is None:
                raise ValueError(f"BatchNorm {name!r} has no paired conv "
                                 f"among {sorted(params)}")
            out[conv] = _fold_pair(out[conv], child, stats[name])
        return out

    return {"params": walk(variables["params"],
                           variables.get("batch_stats", {}))}
