#!/usr/bin/env python
"""Convert Keras VGG19 ImageNet weights (h5) to the npz layout consumed by
`blindshadowremoval_tpu.models.vgg.load_weights_npz`.

Usage:
  python tools/convert_vgg_weights.py vgg19_weights_tf_dim_ordering_tf_kernels_notop.h5 vgg19.npz

The perceptual loss then matches the reference's
`tf.keras.applications.VGG19(weights='imagenet')` tap
(train_test_GSC.py:128-139).  The h5 must be supplied by the user — this
image has no network egress to download it.
"""

import sys

import numpy as np


def main(h5_path: str, npz_path: str) -> int:
    import h5py

    out = {}
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        for name in root:
            if not name.endswith("_conv1") and "conv" not in name:
                continue
            grp = root[name]
            # keras h5 nests <layer>/<layer>/{kernel:0,bias:0}
            inner = grp[name] if name in grp else grp
            for key in inner:
                arr = np.asarray(inner[key])
                clean = key.split(":")[0]
                out[f"{name}/{clean}"] = arr
    np.savez(npz_path, **out)
    print(f"wrote {len(out)} arrays -> {npz_path}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        raise SystemExit(2)
    raise SystemExit(main(sys.argv[1], sys.argv[2]))
