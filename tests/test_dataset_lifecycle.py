"""Train-loader lifecycle: the prefetch thread pool must not outlive its
iterator (a long-lived process that constructs many Datasets — an eval
service that also trains, a notebook — must not accumulate worker threads)."""

import gc
import threading

import numpy as np
from PIL import Image

from blindshadowremoval_tpu.config import get_config
from blindshadowremoval_tpu.data.dataset import Dataset
from blindshadowremoval_tpu.geometry.landmarks import LM_REF


def test_train_iter_releases_threads(tmp_path, rng):
    d = tmp_path / "id0"
    d.mkdir()
    img = (rng.uniform(size=(300, 300, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "f.png")
    np.save(d / "f.npy", (LM_REF * 200 + 50).astype(np.float32))

    cfg = get_config("train", img_size=64, batch_size=1,
                     data_dirs=(str(tmp_path / "*"),), device_geometry=True)

    gc.collect()
    base = threading.active_count()
    for seed in range(4):
        it = iter(Dataset(cfg, "train", seed=seed))
        next(it)   # spin up the pool and drain one sample
        assert threading.active_count() > base
        it.close()   # explicit shutdown path (dropping the ref works too)
        del it
    gc.collect()
    # cancel_futures drops queued work; running parses may take a moment
    for _ in range(50):
        if threading.active_count() <= base:
            break
        import time

        time.sleep(0.2)
    assert threading.active_count() <= base, (
        f"{threading.active_count() - base} leaked loader threads")
