"""On-device connected components + AUC vs. scipy/sklearn oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from blindshadowremoval_tpu.ops.auc import roc_auc, roc_auc_with_sentinels
from blindshadowremoval_tpu.ops.components import (
    component_sizes,
    filter_components,
    label_components,
)


def _random_blobs(rng, shape=(64, 64), p=0.35):
    return (rng.uniform(size=shape) < p).astype(np.float32)


def test_labels_match_scipy(rng):
    from scipy import ndimage

    mask = _random_blobs(rng)
    ours = np.asarray(label_components(jnp.asarray(mask)))
    ref, n_ref = ndimage.label(mask, structure=np.array(
        [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    # same partition: bijection between label sets
    assert (ours >= 0).sum() == (ref > 0).sum()
    pairs = {(int(a), int(b)) for a, b in zip(ours[mask > 0], ref[mask > 0])}
    assert len(pairs) == n_ref  # one-to-one
    assert len({a for a, _ in pairs}) == n_ref
    assert len({b for _, b in pairs}) == n_ref


def test_labels_8_connectivity(rng):
    from scipy import ndimage

    mask = _random_blobs(rng, p=0.25)
    ours = np.asarray(label_components(jnp.asarray(mask), connectivity=8))
    ref, n_ref = ndimage.label(mask, structure=np.ones((3, 3)))
    assert len(np.unique(ours[ours >= 0])) == n_ref


def test_component_sizes(rng):
    mask = np.zeros((32, 32), np.float32)
    mask[2:6, 2:6] = 1          # 16 px
    mask[20:30, 20:25] = 1      # 50 px
    labels = label_components(jnp.asarray(mask))
    sizes = np.asarray(component_sizes(labels))
    nz = sorted(sizes[sizes > 0].tolist())
    assert nz == [16, 50]


def test_filter_components_min_frac():
    mask = np.zeros((32, 32), np.float32)
    mask[2:6, 2:6] = 1          # 16 px — below 0.45 * 50
    mask[20:30, 20:25] = 1      # 50 px — kept
    labels = label_components(jnp.asarray(mask))
    kept = np.asarray(filter_components(jnp.asarray(mask), labels,
                                        jnp.asarray(0.45)))
    assert kept[22, 22] == 1.0
    assert kept[3, 3] == 0.0


def test_filter_components_veto():
    """A large blob mostly inside the veto (hair) region is dropped
    (train_test_GSC.py:609-611)."""
    mask = np.zeros((32, 32), np.float32)
    mask[0:10, 0:10] = 1        # 100 px, fully in veto
    mask[20:30, 20:29] = 1      # 90 px, outside veto
    veto = np.zeros((32, 32), np.float32)
    veto[0:12, 0:12] = 1
    labels = label_components(jnp.asarray(mask))
    kept = np.asarray(filter_components(
        jnp.asarray(mask), labels, jnp.asarray(0.45),
        veto_region=jnp.asarray(veto), veto_max_overlap=jnp.asarray(0.8)))
    assert kept[5, 5] == 0.0      # vetoed despite being largest
    assert kept[25, 25] == 1.0


def test_snake_pattern_converges():
    """Worst-case serpentine: one long thin component."""
    mask = np.zeros((32, 32), np.float32)
    for r in range(0, 32, 2):
        mask[r, :] = 1
        if (r // 2) % 2 == 0 and r + 1 < 32:
            mask[r + 1, -1] = 1
        elif r + 1 < 32:
            mask[r + 1, 0] = 1
    labels = np.asarray(label_components(jnp.asarray(mask)))
    assert len(np.unique(labels[labels >= 0])) == 1


def test_auc_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    labels = (rng.uniform(size=500) > 0.7).astype(np.float32)
    scores = rng.uniform(size=500).astype(np.float32)
    # inject correlation + ties
    scores = np.round(scores * 0.5 + labels * 0.3, 2)
    ours = float(roc_auc(jnp.asarray(labels), jnp.asarray(scores)))
    ref = sklearn.roc_auc_score(labels, scores)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_auc_sentinels_match_reference_recipe(rng):
    sklearn = pytest.importorskip("sklearn.metrics")
    mask = (rng.uniform(size=(16, 16)) > 0.8).astype(np.float32)
    pred = rng.uniform(size=(16, 16)).astype(np.float32)
    ours = float(roc_auc_with_sentinels(jnp.asarray(mask), jnp.asarray(pred)))
    ext = np.array([1.0, 0.0])
    ref = sklearn.roc_auc_score(np.concatenate([ext, mask.reshape(-1)]),
                                np.concatenate([ext, pred.reshape(-1)]))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
