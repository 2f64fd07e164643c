#!/usr/bin/env python
"""Convert a PyTorch S3FD face-detector checkpoint to the npz
`models/sfd.py` loads.

`face_alignment`'s SFD detector ships as a plain state dict (`s3fd-*.pth`);
the module names are flat (`conv1_1`, `fc6`, `conv3_3_norm`,
`conv3_3_norm_mbox_conf`, ...), so the mapping is:

    <name>.weight (4D) -> params/<name>/kernel   (OIHW -> HWIO)
    <name>.bias        -> params/<name>/bias
    <name>.weight (1D) -> params/<name>/weight   (the L2Norm scales)

Usage:
    python tools/convert_sfd_weights.py s3fd-619a316812.pth sfd.npz

Machine-verified against an independent torch oracle of the published
architecture in `tests/test_sfd.py`.
"""

from __future__ import annotations

import sys

import numpy as np


def state_dict_to_npz_dict(state: dict) -> dict:
    out = {}
    for name, value in state.items():
        v = np.asarray(getattr(value, "numpy", lambda: value)())
        if name.startswith("module."):
            name = name[len("module."):]
        mod, leaf = name.rsplit(".", 1)
        if leaf == "weight" and v.ndim == 4:
            out[f"params/{mod}/kernel"] = v.transpose(2, 3, 1, 0)
        elif leaf == "weight" and v.ndim == 1:
            out[f"params/{mod}/weight"] = v          # L2Norm scale
        elif leaf == "bias":
            out[f"params/{mod}/bias"] = v
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
    print(f"wrote {dst}: {len(flat)} arrays")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
