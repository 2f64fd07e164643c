"""Generate model-level TF-reference parity goldens.

Builds the ACTUAL reference generators (/root/reference/model.py:198-290,
model_with_TSM.py, model_RGB.py) in TF on CPU, loads them with the
deterministic synthetic weights from
`blindshadowremoval_tpu.models.tf_checkpoint.synthetic_tf_weights` (a pure
function of the TF variable name + seed — the same dict the Flax side
reconstructs in tests/test_tf_model_parity.py), runs forwards on seeded
inputs, and stores the outputs under tests/goldens/tf_ref/.

This is the harness for BASELINE.md's parity north star: identical weights
through the tf_checkpoint bridge, reference TF forward vs Flax forward.
Run once to (re)generate fixtures:

    python tools/make_tf_ref_goldens.py

Notes:
  * tensorflow_addons is not installed in this image; the only symbol the
    reference imports from it is SpectralNormalization, which Keras 3 ships
    natively — shimmed below.  The generator paths never invoke it.
  * Every TF variable of each built model must be covered by the mapping —
    the tool fails loudly on unassigned variables, which is exactly the
    bridge-completeness check the shipped ckpt indexes can't give us for
    free (their .data blobs are stripped).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "goldens", "tf_ref")


# ---- jax on CPU first (no tunnel) -----------------------------------------
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax.extend import backend as _jeb  # noqa: E402

_jeb.clear_backends()
assert jax.default_backend() == "cpu"

import tensorflow as tf  # noqa: E402

# ---- tensorflow_addons shim (Keras 3 has SpectralNormalization) -----------
_tfa = types.ModuleType("tensorflow_addons")
_tfa.layers = types.SimpleNamespace(
    SpectralNormalization=tf.keras.layers.SpectralNormalization)
sys.modules.setdefault("tensorflow_addons", _tfa)

sys.path.insert(0, REF)

SEED = 0
INPUT_SEED = 123
SIZE = 128            # resolution-independent weights; 128 keeps fixtures small


def resolve_tf_variable(model, tf_name: str):
    """Map a checkpoint object-path name (sans the model root, e.g.
    'generator/conv1/conv/kernel') to the live Keras variable.

    tf.train.Checkpoint names mirror Python attribute paths: numeric parts
    index lists (res_stack/0), everything else is getattr.
    """
    obj = model
    for part in tf_name.split("/")[1:]:
        obj = obj[int(part)] if part.isdigit() else getattr(obj, part)
    return obj


def assign_weights(model, root: str, weights: dict) -> int:
    """Assign every `root/...` entry of the weights dict; verify complete
    coverage of the model's variables; return the number assigned."""
    n = 0
    for tf_name, value in weights.items():
        if not tf_name.startswith(root + "/"):
            continue
        var = resolve_tf_variable(model, tf_name)
        if tuple(var.shape) != tuple(value.shape):
            raise ValueError(
                f"{tf_name}: model shape {tuple(var.shape)} != synthetic "
                f"{tuple(value.shape)}")
        var.assign(value)
        n += 1
    unassigned = len(model.variables) - n
    if unassigned:
        assigned_ids = {
            id(resolve_tf_variable(model, name))
            for name in weights if name.startswith(root + "/")}
        leftovers = [v.path if hasattr(v, "path") else v.name
                     for v in model.variables if id(v) not in assigned_ids]
        raise ValueError(
            f"{root}: mapping does not cover {unassigned} model variables: "
            f"{leftovers[:10]}")
    return n


def seeded_inputs(size: int, n_reg: int = 6):
    rng = np.random.default_rng(INPUT_SEED)
    img = rng.uniform(0.0, 1.0, (1, size, size, 3)).astype(np.float32)
    uv = rng.uniform(0.0, 1.0, (1, size, size, 3)).astype(np.float32)
    reg = rng.uniform(-0.02, 0.02, (1, size, size, n_reg)).astype(np.float32)
    return img, uv, reg


def patch_keras3_compat():
    """Make Keras 3 accept the reference's TF-2.3-era calling conventions.

    Three incompatibilities, each patched surgically:
      1. Layer.__call__ rejects non-tensor positional args (`training`,
         `chuck` are passed positionally throughout the reference).  The
         opt-out is an instance attribute assigned in Layer.__init__, so
         shadow it with a class-level data descriptor (wins over the
         instance dict) that always reads True.
      2. Keras injects the resolved `training` value as a kwarg even when it
         was already bound positionally -> "got multiple values for
         'training'".  Skip the injection when the user passed it
         positionally (it is in user_arguments_dict but was not a kwarg).
      3. CallSpec binds args against call()'s signature, which raises for
         calls that omit a required `training` (e.g. `self.non_local(y)`,
         model.py:106 — Keras 2 auto-propagated it).  Give context args a
         None default in the layer's cached signature so bind succeeds and
         Keras's context propagation fills the value, as Keras 2 did."""
    import inspect

    from keras.src.layers import Layer

    Layer._allow_non_tensor_positional_args = property(
        lambda self: True, lambda self, value: None)

    orig_resolve = Layer._resolve_and_populate_arg

    def resolve(self, arg_name, call_spec, call_context, kwargs):
        was_kwarg = arg_name in kwargs
        orig_resolve(self, arg_name, call_spec, call_context, kwargs)
        if (not was_kwarg and arg_name in kwargs
                and arg_name in call_spec.user_arguments_dict):
            del kwargs[arg_name]  # already bound positionally

    Layer._resolve_and_populate_arg = resolve

    orig_init = Layer.__init__

    def init(self, *args, **kwargs):
        orig_init(self, *args, **kwargs)
        sig = self._call_signature
        params, changed = [], False
        for p in sig.parameters.values():
            if (p.name in self._call_context_args
                    and p.default is inspect.Parameter.empty
                    and p.kind in (inspect.Parameter.POSITIONAL_OR_KEYWORD,
                                   inspect.Parameter.KEYWORD_ONLY)):
                params.append(p.replace(default=None))
                changed = True
            else:
                params.append(p)
        if changed:
            self._call_signature = sig.replace(parameters=params)

    Layer.__init__ = init


def patch_sharelayer(ref_module):
    """The reference's ShareLayer.__init__ calls `super().__init__(self)`
    (model.py:181) — old Keras swallowed the stray positional arg, Keras 3
    raises.  The layer holds no variables; re-init it cleanly."""
    def _init(self):
        tf.keras.layers.Layer.__init__(self)

    ref_module.ShareLayer.__init__ = _init


def make_gsc_golden():
    import model as ref_model  # /root/reference/model.py

    patch_sharelayer(ref_model)

    from blindshadowremoval_tpu.models.generator import GSCGenerator
    from blindshadowremoval_tpu.models.tf_checkpoint import (
        generator_mapping, synthetic_tf_weights)

    gen = ref_model.Generator()
    img, uv, reg = seeded_inputs(SIZE)
    gen(tf.constant(img), tf.constant(uv), tf.constant(reg), 1, False)

    fgen = GSCGenerator()
    variables = fgen.init(jax.random.PRNGKey(0),
                          np.zeros((1, 64, 64, 3), np.float32),
                          np.zeros((1, 64, 64, 3), np.float32),
                          np.zeros((1, 64, 64, 6), np.float32))
    weights = synthetic_tf_weights(variables, generator_mapping(), seed=SEED)
    n = assign_weights(gen, "generator", weights)
    print(f"gsc: assigned {n} variables")

    out = {}
    # TF self-noise floor: the train-mode forward (batch-stat BN with random
    # gamma through 40+ layers) is ill-conditioned w.r.t. float rounding —
    # merely toggling oneDNN moves outputs by ~4e-3.  Measure the reference
    # against ITSELF under a different execution order (eager vs tf.function
    # graph fusion) and store the per-output max discrepancy; the parity
    # test scales its tolerance by this floor instead of pretending a
    # cross-framework 1e-4 is meaningful where TF-vs-TF already isn't.
    graph_fn = tf.function(
        lambda i, u, r, training: gen(i, u, r, 1, training))
    # eval mode first and graph-before-train: a training=True call updates
    # BN moving averages in place, which would shift later eval outputs
    for mode, training in (("eval", False), ("train", True)):
        gs, con_rgb, mask22, dif = gen(
            tf.constant(img), tf.constant(uv), tf.constant(reg), 1, training)
        for name, t in (("gs", gs), ("con_rgb", con_rgb),
                        ("mask22", mask22), ("dif", dif)):
            arr = np.asarray(t)
            assert np.isfinite(arr).all(), (mode, name)
            out[f"{mode}_{name}"] = arr
        graph_outs = graph_fn(tf.constant(img), tf.constant(uv),
                              tf.constant(reg), training)
        for name, t in zip(("gs", "con_rgb", "mask22", "dif"), graph_outs):
            noise = float(np.abs(np.asarray(t) - out[f"{mode}_{name}"]).max())
            out[f"{mode}_{name}_selfnoise"] = np.float32(noise)

    np.savez_compressed(os.path.join(OUT_DIR, "gsc_forward.npz"), **out)
    print("gsc: wrote gsc_forward.npz",
          {k: float(np.abs(v).max()) for k, v in out.items()})


def _run_modes(call_eager, call_graph, out_names):
    """Eager + tf.function forwards in eval-then-train order, recording the
    per-output eager-vs-graph self-noise (see make_gsc_golden)."""
    out = {}
    for mode, training in (("eval", False), ("train", True)):
        outs = call_eager(training)
        if not isinstance(outs, (tuple, list)):
            outs = (outs,)
        for name, t in zip(out_names, outs):
            arr = np.asarray(t)
            assert np.isfinite(arr).all(), (mode, name)
            out[f"{mode}_{name}"] = arr
        graph_outs = call_graph(training)
        if not isinstance(graph_outs, (tuple, list)):
            graph_outs = (graph_outs,)
        for name, t in zip(out_names, graph_outs):
            noise = float(np.abs(np.asarray(t) - out[f"{mode}_{name}"]).max())
            out[f"{mode}_{name}_selfnoise"] = np.float32(noise)
    return out


def make_tsm_golden():
    import model_with_TSM as ref_model

    from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator
    from blindshadowremoval_tpu.models.tf_checkpoint import (
        generator_mapping, synthetic_tf_weights)

    patch_sharelayer(ref_model)
    gen = ref_model.Generator()
    # the reference ShareLayer reshapes to [1, frame, ...] — batch == frame
    img, uv, reg = seeded_inputs(SIZE)
    rng = np.random.default_rng(INPUT_SEED + 1)
    img = np.concatenate([img, rng.uniform(0, 1, img.shape)], 0).astype(np.float32)
    uv = np.concatenate([uv, rng.uniform(0, 1, uv.shape)], 0).astype(np.float32)
    reg = np.concatenate(
        [reg, rng.uniform(-0.02, 0.02, reg.shape)], 0).astype(np.float32)
    share = tf.constant(True)   # tf.cond gate (model_with_TSM.py:228)
    gen(tf.constant(img), tf.constant(uv), tf.constant(reg), 2, share, 1,
        False)

    fgen = TSMGenerator()
    variables = fgen.init(jax.random.PRNGKey(0),
                          np.zeros((2, 64, 64, 3), np.float32),
                          np.zeros((2, 64, 64, 3), np.float32),
                          np.zeros((2, 64, 64, 6), np.float32), frame=2)
    weights = synthetic_tf_weights(variables, generator_mapping("tsm"),
                                   seed=SEED)
    n = assign_weights(gen, "generator", weights)
    print(f"tsm: assigned {n} variables")

    graph_fn = tf.function(
        lambda training: gen(tf.constant(img), tf.constant(uv),
                             tf.constant(reg), 2, share, 1, training))
    out = _run_modes(
        lambda training: gen(tf.constant(img), tf.constant(uv),
                             tf.constant(reg), 2, share, 1, training),
        graph_fn, ("gs", "con_rgb", "mask22", "dif"))
    np.savez_compressed(os.path.join(OUT_DIR, "tsm_forward.npz"), **out)
    print("tsm: wrote tsm_forward.npz",
          {k: float(np.abs(v).max()) for k, v in out.items()})


def make_rgb_golden():
    import model_RGB as ref_model

    from blindshadowremoval_tpu.models.generator_rgb import RGBGenerator
    from blindshadowremoval_tpu.models.tf_checkpoint import (
        generator_mapping, synthetic_tf_weights)

    patch_sharelayer(ref_model)
    gen = ref_model.Generator()
    img, uv, reg = seeded_inputs(SIZE)
    gen(tf.constant(img), tf.constant(uv), tf.constant(reg), 1, False)

    fgen = RGBGenerator()
    variables = fgen.init(jax.random.PRNGKey(0),
                          np.zeros((1, 64, 64, 3), np.float32),
                          np.zeros((1, 64, 64, 3), np.float32),
                          np.zeros((1, 64, 64, 6), np.float32))
    weights = synthetic_tf_weights(variables, generator_mapping("rgb"),
                                   seed=SEED)
    n = assign_weights(gen, "generator", weights)
    print(f"rgb: assigned {n} variables")

    graph_fn = tf.function(
        lambda training: gen(tf.constant(img), tf.constant(uv),
                             tf.constant(reg), 1, training))
    out = _run_modes(
        lambda training: gen(tf.constant(img), tf.constant(uv),
                             tf.constant(reg), 1, training),
        graph_fn, ("con",))
    np.savez_compressed(os.path.join(OUT_DIR, "rgb_forward.npz"), **out)
    print("rgb: wrote rgb_forward.npz",
          {k: float(np.abs(v).max()) for k, v in out.items()})


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    tf.random.set_seed(0)
    patch_keras3_compat()
    make_gsc_golden()
    make_tsm_golden()
    make_rgb_golden()


if __name__ == "__main__":
    main()
