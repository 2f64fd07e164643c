"""FAN landmark-network parity and decode tests.

The published 2D-FAN checkpoints aren't obtainable in this environment, so —
exactly like the VGG-19 perceptual chain (`tests/test_vgg_parity.py`) — the
architecture + weight-converter contract is machine-verified with SYNTHETIC
weights against an independently written PyTorch oracle of the published
stacked-hourglass architecture (Bulat & Tzimiropoulos ICCV'17, the model the
reference's `bmvc2022-dataprocess.py:10` runs via `face_alignment`).  The
oracle uses `face_alignment`'s state-dict naming, so a real `2DFAN4-*.pth.tar`
goes through the same converter path the test exercises.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blindshadowremoval_tpu.models import fan


# ---------------------------------------------------------------------------
# heatmap decode vs a literal numpy transcription of the reference algorithm
# ---------------------------------------------------------------------------

def _oracle_decode(hm):
    """face_alignment utils.get_preds_fromhm, transcribed per-landmark."""
    b, h, w, c = hm.shape
    preds = np.zeros((b, c, 2), np.float64)
    for bi in range(b):
        for ci in range(c):
            y, x = divmod(int(hm[bi, :, :, ci].argmax()), w)
            fx, fy = x + 1.0, y + 1.0                    # 1-based
            if 0 < x < w - 1 and 0 < y < h - 1:
                fx += 0.25 * np.sign(hm[bi, y, x + 1, ci]
                                     - hm[bi, y, x - 1, ci])
                fy += 0.25 * np.sign(hm[bi, y + 1, x, ci]
                                     - hm[bi, y - 1, x, ci])
            preds[bi, ci] = (fx - 0.5, fy - 0.5)         # fa's add_(-0.5)
    return preds


def test_decode_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    hm = rng.standard_normal((2, 64, 64, 68)).astype(np.float32)
    # put some maxima on borders to exercise the interior gate
    hm[0, 0, 5, 0] = 10.0
    hm[0, 63, 63, 1] = 10.0
    hm[1, 30, 0, 2] = 10.0
    got = np.asarray(fan.decode_heatmaps(jnp.asarray(hm)))
    np.testing.assert_allclose(got, _oracle_decode(hm), atol=1e-5)


def test_image_coord_transform():
    # inverse of fa utils.transform(..., invert=True): x*h/res + c - h/2
    center, scale = np.array([120.0, 80.0]), 1.3
    pts = jnp.asarray([[0.5, 0.5], [32.0, 32.0], [63.5, 63.5]])
    got = np.asarray(fan.heatmap_to_image_coords(pts, center, scale))
    h = 200.0 * scale
    want = np.asarray(pts) * (h / 64.0) + (center - h / 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_box_to_center_scale():
    center, scale = fan.box_to_center_scale((10, 20, 110, 140))
    np.testing.assert_allclose(center, [60.0, 80.0 - 120 * 0.12])
    assert scale == pytest.approx((100 + 120) / 195.0)


# ---------------------------------------------------------------------------
# forward + converter parity vs an independent torch oracle
# ---------------------------------------------------------------------------

def _torch_fan(num_modules):
    import torch
    import torch.nn.functional as F
    from torch import nn

    def conv3x3(i, o):
        return nn.Conv2d(i, o, 3, 1, 1, bias=False)

    class ConvBlock(nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.bn1 = nn.BatchNorm2d(i)
            self.conv1 = conv3x3(i, o // 2)
            self.bn2 = nn.BatchNorm2d(o // 2)
            self.conv2 = conv3x3(o // 2, o // 4)
            self.bn3 = nn.BatchNorm2d(o // 4)
            self.conv3 = conv3x3(o // 4, o // 4)
            self.downsample = None
            if i != o:
                self.downsample = nn.Sequential(
                    nn.BatchNorm2d(i), nn.ReLU(True),
                    nn.Conv2d(i, o, 1, 1, bias=False))

        def forward(self, x):
            out1 = self.conv1(F.relu(self.bn1(x)))
            out2 = self.conv2(F.relu(self.bn2(out1)))
            out3 = self.conv3(F.relu(self.bn3(out2)))
            out = torch.cat([out1, out2, out3], 1)
            res = x if self.downsample is None else self.downsample(x)
            return out + res

    class HourGlass(nn.Module):
        def __init__(self, depth, feat):
            super().__init__()
            self.depth = depth
            for lvl in range(1, depth + 1):
                self.add_module(f"b1_{lvl}", ConvBlock(feat, feat))
                self.add_module(f"b2_{lvl}", ConvBlock(feat, feat))
                if lvl == 1:
                    self.add_module(f"b2_plus_{lvl}", ConvBlock(feat, feat))
                self.add_module(f"b3_{lvl}", ConvBlock(feat, feat))

        def _fwd(self, lvl, inp):
            up1 = self._modules[f"b1_{lvl}"](inp)
            low = self._modules[f"b2_{lvl}"](F.avg_pool2d(inp, 2, stride=2))
            low2 = (self._fwd(lvl - 1, low) if lvl > 1
                    else self._modules[f"b2_plus_{lvl}"](low))
            low3 = self._modules[f"b3_{lvl}"](low2)
            return up1 + F.interpolate(low3, scale_factor=2, mode="nearest")

        def forward(self, x):
            return self._fwd(self.depth, x)

    class TorchFAN(nn.Module):
        def __init__(self, nm):
            super().__init__()
            self.nm = nm
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
            self.bn1 = nn.BatchNorm2d(64)
            self.conv2 = ConvBlock(64, 128)
            self.conv3 = ConvBlock(128, 128)
            self.conv4 = ConvBlock(128, 256)
            for i in range(nm):
                self.add_module(f"m{i}", HourGlass(4, 256))
                self.add_module(f"top_m_{i}", ConvBlock(256, 256))
                self.add_module(f"conv_last{i}", nn.Conv2d(256, 256, 1))
                self.add_module(f"bn_end{i}", nn.BatchNorm2d(256))
                self.add_module(f"l{i}", nn.Conv2d(256, 68, 1))
                if i < nm - 1:
                    self.add_module(f"bl{i}", nn.Conv2d(256, 256, 1))
                    self.add_module(f"al{i}", nn.Conv2d(68, 256, 1))

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            x = F.avg_pool2d(self.conv2(x), 2, stride=2)
            x = self.conv4(self.conv3(x))
            previous, outs = x, []
            for i in range(self.nm):
                ll = self._modules[f"top_m_{i}"](
                    self._modules[f"m{i}"](previous))
                ll = F.relu(self._modules[f"bn_end{i}"](
                    self._modules[f"conv_last{i}"](ll)))
                tmp = self._modules[f"l{i}"](ll)
                outs.append(tmp)
                if i < self.nm - 1:
                    previous = (previous + self._modules[f"bl{i}"](ll)
                                + self._modules[f"al{i}"](tmp))
            return outs

    torch.manual_seed(0)
    model = TorchFAN(num_modules).eval()
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0.0, 0.1)
    return model


@pytest.mark.slow   # imports torch; ~2-module FAN forward on CPU
def test_fan_forward_and_converter_parity():
    import sys
    sys.path.insert(0, "tools")
    import torch
    from convert_fan_weights import state_dict_to_npz_dict

    nm = 2   # covers the inter-module bl/al routing with half the compute
    model = _torch_fan(nm)
    variables = fan.variables_from_flat(
        state_dict_to_npz_dict(model.state_dict()))

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = [o.permute(0, 2, 3, 1).numpy()
                for o in model(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    got = jax.jit(FAN_apply := lambda v, a: fan.FAN(num_modules=nm)
                  .apply(v, a))(variables, jnp.asarray(x))
    assert len(got) == len(want) == nm
    for g, w in zip(got, want):
        assert g.shape == w.shape == (1, 16, 16, 68)
        np.testing.assert_allclose(np.asarray(g), w, atol=2e-3, rtol=1e-3)


@pytest.mark.slow   # full-size random-weight pipeline through the CLI
def test_landmarks_cli_fan_path(tmp_path):
    import cv2

    from blindshadowremoval_tpu import cli

    m = fan.FAN(num_modules=1)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, fan.INPUT_RES, fan.INPUT_RES, 3)))
    flat = {}
    for coll, tree in variables.items():
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = "/".join(p.key for p in path)
            flat[f"{coll}/{key}"] = np.asarray(leaf)
    np.savez(tmp_path / "fan.npz", **flat)
    img = (np.random.default_rng(3).uniform(0, 255, (300, 400, 3))
           .astype(np.uint8))
    cv2.imwrite(str(tmp_path / "face.png"), img)

    rc = cli.main(["landmarks", "--input", str(tmp_path),
                   "--fan-weights", str(tmp_path / "fan.npz"),
                   "--face-box", "80,40,320,280"])
    assert rc == 0
    pts = np.load(tmp_path / "face.npy")
    assert pts.shape == (68, 2) and np.isfinite(pts).all()


@pytest.mark.slow   # full-size random-weight pipeline (one 256^2 forward)
def test_landmarks_from_image_smoke():
    m = fan.FAN(num_modules=1)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, fan.INPUT_RES, fan.INPUT_RES, 3)))
    img = (np.random.default_rng(2).uniform(0, 255, (300, 400, 3))
           .astype(np.uint8))
    pts = fan.landmarks_from_image(variables, img, box=(80, 40, 320, 280),
                                   num_modules=1)
    assert pts.shape == (68, 2)
    assert np.isfinite(pts).all()
    # random weights give arbitrary landmarks, but they must land inside the
    # crop window's coordinate range
    center, scale = fan.box_to_center_scale((80, 40, 320, 280))
    h = 200 * scale
    assert (pts >= np.asarray(center) - h).all()
    assert (pts <= np.asarray(center) + h).all()
