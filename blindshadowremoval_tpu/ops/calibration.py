"""Checkpoint-derived activation bounds for the int8 output head.

The int8 head (ops/quant.py) needs static activation bounds so the quantize
pass fuses into the producer.  Round-2 shipped a single scalar bound
calibrated offline on one demo checkpoint and hardcoded at call sites — any
other checkpoint silently served with a wrong bound.  This module derives
per-input-channel bounds from the restored checkpoint ITSELF, so every
restore path (CLI, evaluators, serving) is self-calibrating:

The head input is LeakyReLU(BatchNorm(ConvT(...))) — the generator's `up3`
block (models/generator.py, reference head at model.py:243-251).  In eval
mode BatchNorm maps its input distribution (whose mean/var are exactly the
checkpoint's running statistics) to mean `beta_c`, scale `|gamma_c|` per
channel.  A K-sigma envelope through the LeakyReLU therefore bounds the
head input using only checkpoint tensors:

    hi_c = beta_c + K*|gamma_c|,  lo_c = beta_c - K*|gamma_c|
    bound_c = max(|lrelu(hi_c)|, |lrelu(lo_c)|)

tests/test_quant.py validates that the bounds cover the distribution they
model (max of 100k draws through eval-mode BN + LeakyReLU);
tools/calibrate_int8_head.py cross-checks them against measured activation
maxima on real UCB data for a given checkpoint.  K defaults to 8:
activations are not Gaussian, so the envelope is deliberately generous —
with per-channel granularity a loose bound costs little precision (the
quantization step stays ~K/127 of each channel's own scale), while an
undershot bound saturates.
"""

from __future__ import annotations

from typing import Any

import numpy as np

LEAKY_SLOPE = 0.3   # models/blocks.py (Keras default)


def _lrelu(x: np.ndarray) -> np.ndarray:
    return np.where(x > 0, x, LEAKY_SLOPE * x)


def head_input_bounds(variables: Any, k_sigma: float = 8.0,
                      floor: float = 0.05) -> tuple[float, ...]:
    """Per-channel int8 bounds for the generator head input.

    `variables` is the generator's restored variable collection (params +
    batch_stats).  Returns a tuple (hashable — it becomes a static jit
    constant) of per-channel bounds for `up3`'s output, suitable for
    `int8_head_scale`.  `floor` guards channels whose BatchNorm collapsed
    (gamma ~ 0) from producing a degenerate 0 bound.
    """
    params = variables["params"]["up3"]["BatchNorm_0"]
    gamma = np.asarray(params["scale"], np.float32)
    beta = np.asarray(params["bias"], np.float32)
    hi = _lrelu(beta + k_sigma * np.abs(gamma))
    lo = _lrelu(beta - k_sigma * np.abs(gamma))
    bound = np.maximum(np.maximum(np.abs(hi), np.abs(lo)), floor)
    return tuple(float(b) for b in bound)


def calibrate_config(config, variables):
    """Self-calibrate a config's int8 head against restored variables.

    With `int8_head` on and `int8_head_scale` left at the 0.0 AUTO default,
    derive per-channel activation bounds from the checkpoint's own BatchNorm
    statistics — so every restore path (CLI `_restore`, serving init) serves
    with bounds matched to ITS weights instead of a constant calibrated on
    some other checkpoint.  No-op otherwise."""
    import dataclasses

    if ((config.int8_head or getattr(config, "int8_head_split", False))
            and config.int8_head_scale == 0.0 and config.variant != "rgb"):
        config = dataclasses.replace(
            config, int8_head_scale=head_input_bounds(variables))
    return config
