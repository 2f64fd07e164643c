"""TF -> Flax checkpoint bridge (the weight naming contract).

The reference ships `tf.train.Checkpoint` indexes for its three trained
models (log/*/ckpt-{94,110,130}; the `.data` blobs are stripped from the
repo, `.MISSING_LARGE_BLOBS`).  This module defines the bijection between
those TF variable names and this framework's Flax parameter tree, so that

  * the naming contract is machine-checked against the shipped index files
    (names AND shapes — `verify_against_index`), and
  * when real `.data` blobs are available, `load_tf_checkpoint` restores
    them directly into a Flax variables dict.

TF variable layout (observed in ckpt-94):
  generator/{conv1,down1..3,up1..3,clr_up1..3,clr_conv1..3,conv2,conv3}
      /conv/{kernel,bias}, /bnorm/{gamma,beta,moving_mean,moving_variance}
  generator/res_stack/{i}/{conv1..3,bnorm1..3,
      non_local/{g,phi,theta,w,bnorm}}
  discriminator_{1..3}/{conv_stack/{i},conv2}/...

Kernel conventions: Keras Conv2D kernels are HWIO like Flax (identity);
Keras Conv2DTranspose kernels are [kh, kw, OUT, IN] and are applied as the
gradient of a forward conv, whereas Flax's ConvTranspose expects [kh, kw,
IN, OUT] applied as a fractionally-strided correlation — mapping requires a
last-two-axes swap plus a spatial flip.

Mapping entries are (flax_path, tf_name, transform[, dst_slice]).  The
optional dst_slice=(start, stop) lands the TF tensor in a channel slice of
the Flax leaf: the generator's TF conv2/conv3 heads (two 7x7 convs to 1
channel each, model.py:243-251) are fused into one 2-channel "head" conv
here — a 1-output-channel 7x7 conv costs the same as a 2-channel one on the
MXU, so the fusion halves the most expensive op in the model.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

VAL_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def _convt_transform(k: np.ndarray) -> np.ndarray:
    """Keras Conv2DTranspose kernel -> Flax ConvTranspose kernel."""
    return np.ascontiguousarray(k[::-1, ::-1].transpose(0, 1, 3, 2))


def _identity(x: np.ndarray) -> np.ndarray:
    return np.asarray(x)


def _conv_block_entries(tf_prefix: str, has_bn: bool, transpose: bool = False):
    """(flax_subpath, tf_name, transform) triples for one Conv/ConvT block."""
    conv_key = "ConvTranspose_0" if transpose else "Conv_0"
    tr = _convt_transform if transpose else _identity
    entries = [
        (("params", conv_key, "kernel"), f"{tf_prefix}/conv/kernel", tr),
        (("params", conv_key, "bias"), f"{tf_prefix}/conv/bias", _identity),
    ]
    if has_bn:
        entries += [
            (("params", "BatchNorm_0", "scale"), f"{tf_prefix}/bnorm/gamma",
             _identity),
            (("params", "BatchNorm_0", "bias"), f"{tf_prefix}/bnorm/beta",
             _identity),
            (("batch_stats", "BatchNorm_0", "mean"),
             f"{tf_prefix}/bnorm/moving_mean", _identity),
            (("batch_stats", "BatchNorm_0", "var"),
             f"{tf_prefix}/bnorm/moving_variance", _identity),
        ]
    return entries


def _nonlocal_entries(tf_prefix: str):
    entries = []
    for name in ("g", "phi", "theta", "w"):
        entries += [
            (("params", name, "kernel"), f"{tf_prefix}/{name}/kernel",
             _identity),
            (("params", name, "bias"), f"{tf_prefix}/{name}/bias", _identity),
        ]
    entries += [
        (("params", "BatchNorm_0", "scale"), f"{tf_prefix}/bnorm/gamma",
         _identity),
        (("params", "BatchNorm_0", "bias"), f"{tf_prefix}/bnorm/beta",
         _identity),
        (("batch_stats", "BatchNorm_0", "mean"),
         f"{tf_prefix}/bnorm/moving_mean", _identity),
        (("batch_stats", "BatchNorm_0", "var"),
         f"{tf_prefix}/bnorm/moving_variance", _identity),
    ]
    return entries


def _res_bottleneck_entries(tf_prefix: str):
    entries = []
    for i in range(3):
        entries += [
            (("params", f"Conv_{i}", "kernel"),
             f"{tf_prefix}/conv{i + 1}/kernel", _identity),
            (("params", f"Conv_{i}", "bias"),
             f"{tf_prefix}/conv{i + 1}/bias", _identity),
            (("params", f"BatchNorm_{i}", "scale"),
             f"{tf_prefix}/bnorm{i + 1}/gamma", _identity),
            (("params", f"BatchNorm_{i}", "bias"),
             f"{tf_prefix}/bnorm{i + 1}/beta", _identity),
            (("batch_stats", f"BatchNorm_{i}", "mean"),
             f"{tf_prefix}/bnorm{i + 1}/moving_mean", _identity),
            (("batch_stats", f"BatchNorm_{i}", "var"),
             f"{tf_prefix}/bnorm{i + 1}/moving_variance", _identity),
        ]
    for sub, tf_name, tr in _nonlocal_entries(f"{tf_prefix}/non_local"):
        entries.append(((sub[0], "NonLocalBlock_0") + sub[1:], tf_name, tr))
    return entries


def generator_mapping(variant: str = "gsc", n_res: int = 6):
    """[(flax_path, tf_name, transform)] for a generator variant.

    flax_path is (collection, module..., leaf) relative to the generator's
    variables dict.  Variants and their shipped checkpoint contracts:

      * "gsc"  — log/...-reweight-gradients/ckpt-94 (model.py:198-290)
      * "tsm"  — log/...-with-TSM/ckpt-110 (model_with_TSM.py:230-325).
        IDENTICAL variable names to gsc — the weightless ShareLayer only
        widens the inputs of res0/res3/up1/clr_up1 (e.g. res_stack/0/conv1
        is [1,1,291,128] instead of [1,1,99,128]); shapes are derived from
        the caller's Flax variables, so one entry list serves both.
      * "rgb"  — log/...-RGB-model/ckpt-130 (model_RGB.py).  No clr_*
        branch (those layers are constructed but never called, so TF never
        built them into the checkpoint), conv2/conv3 are SEQUENTIAL 3-ch
        convs (not parallel 1-ch heads — no head fusion), doubled up-conv
        widths.
    """
    if variant not in ("gsc", "tsm", "rgb"):
        raise ValueError(f"unknown generator variant {variant!r}")
    entries = []

    def add(flax_module: str, triples):
        for sub, tf_name, tr in triples:
            entries.append(((sub[0], flax_module) + sub[1:], tf_name, tr))

    add("conv1", _conv_block_entries("generator/conv1", True))
    if variant == "rgb":
        add("conv2", _conv_block_entries("generator/conv2", False))
        add("conv3", _conv_block_entries("generator/conv3", False))
    else:
        # conv2/conv3 (the tanh-gain and offset heads, no norm) are fused
        # into the 2-channel "head" conv; each TF variable lands in a
        # channel slice
        for i, tf_layer in enumerate(("conv2", "conv3")):
            for leaf in ("kernel", "bias"):
                entries.append(
                    (("params", "head", "Conv_0", leaf),
                     f"generator/{tf_layer}/conv/{leaf}", _identity,
                     (i, i + 1)))
    for i in (1, 2, 3):
        add(f"down{i}", _conv_block_entries(f"generator/down{i}", True))
        add(f"up{i}", _conv_block_entries(f"generator/up{i}", True,
                                          transpose=True))
        if variant != "rgb":
            add(f"clr_up{i}", _conv_block_entries(f"generator/clr_up{i}",
                                                  True, transpose=True))
    if variant != "rgb":
        add("clr_conv1", _conv_block_entries("generator/clr_conv1", True))
        add("clr_conv2", _conv_block_entries("generator/clr_conv2", True))
        add("clr_conv3", _conv_block_entries("generator/clr_conv3", False))
    if variant == "rgb":
        # the single-branch ablation only ever calls res_stack[0..n_res//2)
        # (model_RGB.py keeps just the first loop), so TF never built the
        # rest into ckpt-130
        n_res = n_res // 2
    for i in range(n_res):
        for sub, tf_name, tr in _res_bottleneck_entries(
                f"generator/res_stack/{i}"):
            entries.append(((sub[0], f"res{i}") + sub[1:], tf_name, tr))
    return entries


def discriminator_mapping(num_layers: int = 4):
    """Mapping for the 3-scale discriminator trio
    (flax: disc{1..3}/conv{i},head; tf: discriminator_{1..3})."""
    entries = []
    for d in (1, 2, 3):
        for i in range(num_layers):
            for sub, tf_name, tr in _conv_block_entries(
                    f"discriminator_{d}/conv_stack/{i}", True):
                entries.append(
                    ((sub[0], f"disc{d}", f"conv{i}") + sub[1:], tf_name, tr))
        for sub, tf_name, tr in _conv_block_entries(
                f"discriminator_{d}/conv2", False):
            entries.append(
                ((sub[0], f"disc{d}", "head") + sub[1:], tf_name, tr))
    return entries


def _tree_get(tree: Any, path: tuple):
    node = tree
    for p in path:
        node = node[p]
    return node


def _tree_set(tree: dict, path: tuple, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def verify_against_index(ckpt_prefix: str, variables: dict,
                         mapping) -> dict:
    """Check every mapped flax leaf against the TF index (name present,
    shape consistent modulo the declared transform).

    Returns {"matched": int, "missing_in_tf": [...], "shape_mismatch": [...],
    "unmapped_tf": [...]} — all empty lists for a complete bridge.
    """
    import tensorflow as tf  # local import; TF is heavyweight

    tf_vars = {name[:-len(VAL_SUFFIX)]: tuple(shape)
               for name, shape in tf.train.list_variables(ckpt_prefix)
               if name.endswith(VAL_SUFFIX) and ".OPTIMIZER_SLOT" not in name}

    missing, mismatch, matched = [], [], 0
    mapped_names = set()
    for flax_path, tf_name, tr, *rest in mapping:
        dst = rest[0] if rest else None
        mapped_names.add(tf_name)
        if tf_name not in tf_vars:
            missing.append(tf_name)
            continue
        leaf = np.asarray(_tree_get(variables, flax_path))
        if dst is not None:
            leaf = leaf[..., dst[0]:dst[1]]
        probe = tr(np.zeros(tf_vars[tf_name], np.float32))
        if tuple(leaf.shape) != tuple(probe.shape):
            mismatch.append((tf_name, tuple(tf_vars[tf_name]),
                             tuple(leaf.shape)))
            continue
        matched += 1
    unmapped = sorted(
        n for n in tf_vars
        if n not in mapped_names and n != "_CHECKPOINTABLE_OBJECT_GRAPH"
        and not n.startswith("save_counter"))
    return {"matched": matched, "missing_in_tf": missing,
            "shape_mismatch": mismatch, "unmapped_tf": unmapped}


def _apply_weights(get_tensor: Callable[[str], np.ndarray], variables: dict,
                   mapping) -> dict:
    """Apply mapped TF tensors (fetched via `get_tensor(tf_name)`) onto a
    (copied) flax variables dict."""
    import jax.numpy as jnp

    out: dict = {}
    for flax_path, tf_name, tr, *rest in mapping:
        dst = rest[0] if rest else None
        value = get_tensor(tf_name)
        if dst is None:
            _tree_set(out, flax_path, jnp.asarray(tr(value)))
            continue
        # slice destination: accumulate into a buffer seeded from `variables`
        # (np.array, not asarray: device arrays view as read-only)
        try:
            buf = np.array(_tree_get(out, flax_path))
        except KeyError:
            buf = np.array(_tree_get(variables, flax_path))
        buf[..., dst[0]:dst[1]] = tr(value)
        _tree_set(out, flax_path, jnp.asarray(buf))

    # functional merge: restored leaves override, everything else kept
    def merge(dst, src):
        merged = {}
        for k, v in dst.items():
            if k not in src:
                merged[k] = v
            elif hasattr(v, "items"):
                merged[k] = merge(dict(v), src[k])
            else:
                merged[k] = src[k]
        return merged

    return merge({k: dict(v) for k, v in variables.items()}, out)


def load_tf_checkpoint(ckpt_prefix: str, variables: dict, mapping) -> dict:
    """Restore TF checkpoint values into a (copied) flax variables dict.

    Requires the checkpoint `.data` shards (the repo ships only indexes);
    raises with a clear message when blobs are missing.
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_prefix)

    def get_tensor(tf_name: str) -> np.ndarray:
        try:
            return reader.get_tensor(tf_name + VAL_SUFFIX)
        except Exception as e:  # stripped blobs
            raise RuntimeError(
                f"cannot read {tf_name!r} from {ckpt_prefix!r} — the "
                "reference repo ships index files only "
                "(.MISSING_LARGE_BLOBS); supply a full checkpoint") from e

    return _apply_weights(get_tensor, variables, mapping)


def load_weights_dict(weights: dict, variables: dict, mapping) -> dict:
    """Apply a {tf_name: array} dict (e.g. from `synthetic_tf_weights` or a
    converted checkpoint) onto a flax variables dict via the mapping."""
    return _apply_weights(lambda name: weights[name], variables, mapping)


def tf_shape_for(flax_shape: tuple, tr: Callable) -> tuple:
    """TF-side variable shape whose `tr(...)` lands on `flax_shape`.

    Both transforms in this module are shape-involutions: identity, and the
    ConvTranspose last-two-axes swap (the spatial flip keeps the shape)."""
    if tr is _convt_transform:
        return tuple(flax_shape[:2]) + (flax_shape[3], flax_shape[2])
    return tuple(flax_shape)


def synthetic_tf_weights(variables: dict, mapping, seed: int = 0) -> dict:
    """Deterministic random {tf_name: np.float32 array} covering a mapping.

    Used by the model-level parity harness (tools/make_tf_ref_goldens.py and
    tests/test_tf_model_parity.py): both the TF reference model and the Flax
    model are loaded with THESE weights — a pure function of (tf_name, seed)
    — so forward outputs can be compared without shipping weight blobs.
    Values are sized so 40+ stacked conv+BN layers stay numerically sane at
    inference time: glorot-ish kernels, near-identity BN statistics.
    """
    import zlib

    out = {}
    for flax_path, tf_name, tr, *rest in mapping:
        dst = rest[0] if rest else None
        leaf = np.asarray(_tree_get(variables, flax_path))
        if dst is not None:
            leaf = leaf[..., dst[0]:dst[1]]
        shape = tf_shape_for(leaf.shape, tr)
        rng = np.random.default_rng(
            (zlib.crc32(tf_name.encode()) << 8) ^ seed)
        leafname = tf_name.rsplit("/", 1)[-1]
        if leafname == "kernel" and len(shape) == 4:
            fan_in = shape[0] * shape[1] * shape[2]
            fan_out = shape[0] * shape[1] * shape[3]
            std = np.sqrt(2.0 / (fan_in + fan_out))
            val = rng.normal(0.0, std, shape)
        elif leafname == "gamma":
            val = 1.0 + rng.normal(0.0, 0.05, shape)
        elif leafname == "moving_variance":
            val = rng.uniform(0.5, 1.5, shape)
        else:  # bias / beta / moving_mean
            val = rng.normal(0.0, 0.05, shape)
        out[tf_name] = val.astype(np.float32)
    return out
