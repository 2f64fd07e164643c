#!/usr/bin/env python
"""Convert a PyTorch 2D-FAN checkpoint to the npz `models/fan.py` loads.

The reference's preprocessing runs the `face_alignment` package's FAN CNN
(`bmvc2022-dataprocess.py:10`); its published checkpoints (e.g.
`2DFAN4-*.pth.tar`) are plain PyTorch state dicts.  This converter maps that
state-dict naming onto the Flax module tree:

    conv1.weight                  -> params/conv1/kernel     (OIHW -> HWIO)
    bn1.{weight,bias}             -> params/bn1/{scale,bias}
    bn1.running_{mean,var}        -> batch_stats/bn1/{mean,var}
    conv2.bn1.* / conv2.conv1.*   -> ConvBlock submodules (same names)
    <block>.downsample.0.*        -> <block>/down_bn/*       (the 1x1 shortcut)
    <block>.downsample.2.*        -> <block>/down_conv/*
    m0.b1_4.* ... l3.* bl2.* al2.*-> same names

Usage:
    python tools/convert_fan_weights.py 2DFAN4-xxxx.pth.tar fan_2dfan4.npz

Accepts a raw state dict, or a dict holding one under 'state_dict'
(optionally 'module.'-prefixed).  Newer face_alignment releases ship
TorchScript archives instead; load those with `torch.jit.load(f).state_dict()`
and re-save, then convert.  The mapping itself is machine-verified against an
independent PyTorch oracle of the published architecture in
`tests/test_fan.py`.
"""

from __future__ import annotations

import sys

import numpy as np


def state_dict_to_npz_dict(state: dict) -> dict:
    """Map a torch FAN state dict (tensors or ndarrays) to flat npz keys."""
    out = {}
    for name, value in state.items():
        v = np.asarray(getattr(value, "numpy", lambda: value)())
        if name.startswith("module."):
            name = name[len("module."):]
        parts = name.split(".")
        leaf = parts[-1]
        mods = parts[:-1]
        # the ConvBlock projection shortcut is an anonymous Sequential in
        # torch: index 0 is the BN, index 2 the 1x1 conv
        if len(mods) >= 2 and mods[-2] == "downsample":
            mods = mods[:-2] + (["down_bn"] if mods[-1] == "0"
                                else ["down_conv"])
        path = "/".join(mods)
        if leaf == "weight" and v.ndim == 4:          # conv kernel
            out[f"params/{path}/kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "weight":                        # BN gamma
            out[f"params/{path}/scale"] = v
        elif leaf == "bias":
            out[f"params/{path}/bias"] = v
        elif leaf == "running_mean":
            out[f"batch_stats/{path}/mean"] = v
        elif leaf == "running_var":
            out[f"batch_stats/{path}/var"] = v
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized state-dict entry: {name}")
    return out


def main(src: str, dst: str) -> None:
    import torch

    state = torch.load(src, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    flat = state_dict_to_npz_dict(state)
    np.savez(dst, **flat)
    n_mod = 1 + max(int(k.split("/")[1][1:]) for k in flat
                    if k.split("/")[1].startswith("m")
                    and k.split("/")[1][1:].isdigit())
    print(f"wrote {dst}: {len(flat)} arrays, {n_mod} hourglass modules")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
