"""S3FD face-detector parity tests (same synthetic-weight methodology as
the FAN and VGG chains: independent torch oracle of the published
architecture using face_alignment's state-dict naming, plus a literal
transcription of the reference decode loop)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blindshadowremoval_tpu.models import sfd


# ---------------------------------------------------------------------------
# decode / NMS vs literal transcriptions of face_alignment detect.py/bbox.py
# ---------------------------------------------------------------------------

def _oracle_decode(outs, thresh=0.05):
    """fa detect.py's per-position loop, transcribed (NHWC heads in)."""
    cand = []
    for i, (conf, loc) in enumerate(outs):
        stride = 2 ** (i + 2)
        conf, loc = np.asarray(conf), np.asarray(loc)
        for hi in range(conf.shape[1]):
            for wi in range(conf.shape[2]):
                score = conf[0, hi, wi, 1]
                if score <= thresh:
                    continue
                axc = stride / 2.0 + wi * stride
                ayc = stride / 2.0 + hi * stride
                pw = ph = stride * 4.0
                l = loc[0, hi, wi]
                cx = axc + l[0] * 0.1 * pw
                cy = ayc + l[1] * 0.1 * ph
                w = pw * np.exp(l[2] * 0.2)
                h = ph * np.exp(l[3] * 0.2)
                cand.append([cx - w / 2, cy - h / 2,
                             cx + w / 2, cy + h / 2, score])
    return np.asarray(cand, np.float32).reshape(-1, 5)


def test_decode_matches_reference_loop():
    rng = np.random.default_rng(0)
    outs = []
    for i, (h, w) in enumerate([(16, 24), (8, 12), (4, 6),
                                (2, 3), (1, 2), (1, 1)]):
        conf = rng.uniform(0, 1, (1, h, w, 2)).astype(np.float32)
        loc = rng.standard_normal((1, h, w, 4)).astype(np.float32)
        outs.append((conf, loc))
    got = sfd.decode_detections(outs)
    want = _oracle_decode(outs)
    # order differs (vectorized per scale vs nested loop) — sort both
    key = lambda a: a[np.lexsort(a.T)]
    np.testing.assert_allclose(key(got), key(want), rtol=1e-5, atol=1e-4)


def test_nms_plus_one_convention():
    dets = np.array([
        [10, 10, 50, 50, 0.9],
        [12, 12, 52, 52, 0.8],   # IoU ~0.83 with the first -> suppressed
        [100, 100, 140, 140, 0.7],
        [10, 10, 50, 50, 0.6],   # duplicate of the first -> suppressed
    ], np.float32)
    keep = sfd.nms(dets, 0.3)
    assert list(keep) == [0, 2]
    # exact +1 convention: two boxes sharing only the +1 boundary row
    a = np.array([[0, 0, 10, 10, 0.9], [10, 0, 20, 10, 0.8]], np.float32)
    inter = 1 * 11       # (10-10+1) * (10-0+1)
    union = 11 * 11 * 2 - inter
    keep = sfd.nms(a, inter / union - 1e-6)
    assert list(keep) == [0]     # IoU == threshold boundary suppresses


# ---------------------------------------------------------------------------
# forward + converter parity vs an independent torch oracle
# ---------------------------------------------------------------------------

def _torch_s3fd():
    import torch
    import torch.nn.functional as F
    from torch import nn

    class L2Norm(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(c))

        def forward(self, x):
            norm = x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10
            return x / norm * self.weight.view(1, -1, 1, 1)

    class TorchS3FD(nn.Module):
        def __init__(self):
            super().__init__()
            cfg = [("conv1", 3, 64, 2), ("conv2", 64, 128, 2),
                   ("conv3", 128, 256, 3), ("conv4", 256, 512, 3),
                   ("conv5", 512, 512, 3)]
            for name, ci, co, n in cfg:
                for i in range(1, n + 1):
                    self.add_module(f"{name}_{i}",
                                    nn.Conv2d(ci if i == 1 else co, co,
                                              3, 1, 1))
            self.fc6 = nn.Conv2d(512, 1024, 3, 1, 3)
            self.fc7 = nn.Conv2d(1024, 1024, 1, 1, 0)
            self.conv6_1 = nn.Conv2d(1024, 256, 1, 1, 0)
            self.conv6_2 = nn.Conv2d(256, 512, 3, 2, 1)
            self.conv7_1 = nn.Conv2d(512, 128, 1, 1, 0)
            self.conv7_2 = nn.Conv2d(128, 256, 3, 2, 1)
            self.conv3_3_norm = L2Norm(256)
            self.conv4_3_norm = L2Norm(512)
            self.conv5_3_norm = L2Norm(512)
            heads = [("conv3_3_norm", 256, 4), ("conv4_3_norm", 512, 2),
                     ("conv5_3_norm", 512, 2), ("fc7", 1024, 2),
                     ("conv6_2", 512, 2), ("conv7_2", 256, 2)]
            for name, c, nconf in heads:
                self.add_module(f"{name}_mbox_conf",
                                nn.Conv2d(c, nconf, 3, 1, 1))
                self.add_module(f"{name}_mbox_loc",
                                nn.Conv2d(c, 4, 3, 1, 1))

        def forward(self, x):
            m = self._modules
            for name, _, _, n in [("conv1", 0, 0, 2), ("conv2", 0, 0, 2),
                                  ("conv3", 0, 0, 3), ("conv4", 0, 0, 3),
                                  ("conv5", 0, 0, 3)]:
                for i in range(1, n + 1):
                    x = F.relu(m[f"{name}_{i}"](x))
                    if name == "conv3" and i == 3:
                        f3 = x
                    if name == "conv4" and i == 3:
                        f4 = x
                    if name == "conv5" and i == 3:
                        f5 = x
                x = F.max_pool2d(x, 2, 2)
            x = F.relu(self.fc6(x))
            ffc7 = x = F.relu(self.fc7(x))
            x = F.relu(self.conv6_1(x))
            f62 = x = F.relu(self.conv6_2(x))
            x = F.relu(self.conv7_1(x))
            f72 = F.relu(self.conv7_2(x))

            outs = []
            for i, (tap, name) in enumerate([
                    (f3, "conv3_3_norm"), (f4, "conv4_3_norm"),
                    (f5, "conv5_3_norm"), (ffc7, "fc7"),
                    (f62, "conv6_2"), (f72, "conv7_2")]):
                if name.endswith("_norm"):
                    tap = m[name](tap)
                conf = m[f"{name}_mbox_conf"](tap)
                loc = m[f"{name}_mbox_loc"](tap)
                if i == 0:
                    chunk = torch.chunk(conf, 4, 1)
                    bmax = torch.max(torch.max(chunk[0], chunk[1]), chunk[2])
                    conf = torch.cat([bmax, chunk[3]], dim=1)
                outs.append((F.softmax(conf, dim=1), loc))
            return outs

    torch.manual_seed(0)
    model = TorchS3FD().eval()
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, L2Norm):
                mod.weight.uniform_(2.0, 10.0)
    return model


@pytest.mark.slow   # imports torch
def test_sfd_forward_and_converter_parity():
    import sys
    sys.path.insert(0, "tools")
    import torch
    from convert_sfd_weights import state_dict_to_npz_dict

    model = _torch_s3fd()
    from blindshadowremoval_tpu.models.fan import variables_from_flat
    variables = variables_from_flat(
        state_dict_to_npz_dict(model.state_dict()))

    rng = np.random.default_rng(1)
    x = rng.uniform(-120, 150, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = [(c.permute(0, 2, 3, 1).numpy(), l.permute(0, 2, 3, 1).numpy())
                for c, l in model(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    got = jax.jit(lambda v, a: sfd.S3FD().apply(v, a))(
        variables, jnp.asarray(x))
    assert len(got) == 6
    for (gc, gl), (wc, wl) in zip(got, want):
        assert gc.shape == wc.shape and gl.shape == wl.shape
        np.testing.assert_allclose(np.asarray(gc), wc, atol=2e-3)
        np.testing.assert_allclose(np.asarray(gl), wl, atol=2e-3, rtol=1e-3)


@pytest.mark.slow   # the reference's full landmark step, all in-repo
def test_landmarks_cli_detect_then_align(tmp_path):
    import cv2

    from blindshadowremoval_tpu import cli
    from blindshadowremoval_tpu.models import fan

    def save_npz(variables, path):
        flat = {}
        for coll, tree in variables.items():
            for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                flat[coll + "/" + "/".join(q.key for q in p)] = \
                    np.asarray(leaf)
        np.savez(path, **flat)

    sfd_vars = sfd.S3FD().init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 96, 3)))
    # bias the stride-32 conf head toward 'face' so synthetic weights
    # deterministically detect something
    sfd_vars = jax.tree_util.tree_map(lambda a: a, sfd_vars)  # shallow copy
    conf = dict(sfd_vars["params"]["fc7_mbox_conf"])
    conf["bias"] = conf["bias"].at[1].set(8.0)
    sfd_vars = {"params": {**sfd_vars["params"], "fc7_mbox_conf": conf}}
    save_npz(sfd_vars, tmp_path / "sfd.npz")

    fan_vars = fan.FAN(num_modules=1).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3)))
    save_npz(fan_vars, tmp_path / "fan.npz")

    img = (np.random.default_rng(3).uniform(0, 255, (240, 320, 3))
           .astype(np.uint8))
    cv2.imwrite(str(tmp_path / "face.png"), img)
    rc = cli.main(["landmarks", "--input", str(tmp_path),
                   "--fan-weights", str(tmp_path / "fan.npz"),
                   "--sfd-weights", str(tmp_path / "sfd.npz")])
    assert rc == 0
    pts = np.load(tmp_path / "face.npy")
    assert pts.shape == (68, 2) and np.isfinite(pts).all()


@pytest.mark.slow
def test_detect_faces_smoke():
    m = sfd.S3FD()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))
    img = (np.random.default_rng(2).uniform(0, 255, (64, 96, 3))
           .astype(np.uint8))
    dets = sfd.detect_faces(variables, img, filter_threshold=0.0)
    assert dets.ndim == 2 and dets.shape[1] == 5
    if len(dets):
        assert (dets[:-1, 4] >= dets[1:, 4]).all() or len(dets) == 1
