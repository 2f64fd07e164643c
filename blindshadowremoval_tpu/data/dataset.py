"""Data pipeline: host decode/crop + geometry maps -> batch dicts.

Re-design of the reference tf.data pipelines (dataset.py:18-1069,
dataset_with_TSM.py:19-585).  Differences from the reference:

  * batches are **dicts of named arrays** instead of channel-packed tensors
    (`[2,256,256,17]` packs, dataset.py:92); `pack_views`/`unpack_views`
    provide the packed layout for parity tooling;
  * parsing runs in a thread pool with double-buffered prefetch instead of
    tf.data `numpy_function` (image decode via cv2/PIL is I/O, not compute —
    SURVEY.md §2b);
  * geometry maps use the jittable barycentric rasterizer (geometry/) instead
    of per-image matplotlib interpolation.

File-layout contracts preserved exactly:
  * train dirs: `<identity>/<frame>.png` + `<frame>.npy` 68x2 landmarks;
  * UCB test: `<root>/input/<id>/<img>.npy|png` with gt at `<root>/gt/...`
    (dataset.py:151-155);
  * FFHQ / in-the-wild: gt = input (dataset.py:622-623);
  * SFW: `<frame>.png` + `<frame>.npy` + `<frame>_label.png`
    (+ `<frame>_label_cmap.png`);
    video mode picks 10 temporally spread frames with the reference's
    frame-offset schedule (dataset.py:808-867).
"""

from __future__ import annotations

import concurrent.futures as _futures
import glob as _glob
import os
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from blindshadowremoval_tpu.config import Config
from blindshadowremoval_tpu.data.synthesis import shadow_synthesis_host
from blindshadowremoval_tpu.geometry.crop import face_crop_and_resize
from blindshadowremoval_tpu.geometry.landmarks import LM_REF
from blindshadowremoval_tpu.geometry.triangulation import (
    generate_face_region,
    generate_offset_map,
    generate_uv_map,
)

# channel-packed layouts (for parity with the reference's packed tensors)
TRAIN_PACK = ("img_dark", 3), ("gt", 3), ("mask", 1), ("uv", 3), ("reg", 6), ("face", 1)
TEST_PACK = ("img", 3), ("gt", 3), ("uv", 3), ("reg", 6), ("face", 1)


def _natsorted(items):
    """Natural sort (numeric-aware), matching natsort's default for paths."""
    import re

    def key(s):
        return [int(t) if t.isdigit() else t
                for t in re.split(r"(\d+)", str(s))]

    return sorted(items, key=key)


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255.0


def _imread_gray_raw(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, 0)
    if img is None:
        raise FileNotFoundError(path)
    return img[..., None].astype(np.float32)


def _geometry(lm: np.ndarray, size: int) -> dict:
    return {
        "uv": generate_uv_map(lm, size),
        "reg": np.concatenate([generate_offset_map(lm, LM_REF, size),
                               generate_offset_map(LM_REF, lm, size)], axis=2),
        "face": generate_face_region(lm, size),
    }


def _geometry_primitives(lm: np.ndarray) -> dict:
    """Landmarks + Delaunay topologies instead of rasterized maps.

    With `config.device_geometry` the train step rasterizes UV/offset/face
    maps in-graph (`triangulation.device_geometry_maps`); the host ships
    only these tiny arrays (qhull over ≤85 points is microseconds vs tens
    of milliseconds of host rasterization per view)."""
    from blindshadowremoval_tpu.geometry.landmarks import forehead_points
    from blindshadowremoval_tpu.geometry.triangulation import (
        _with_anchors,
        build_triangulation,
    )

    lm = np.asarray(lm, np.float32)
    fp = np.concatenate([lm, forehead_points(lm, 0.8)], axis=0)
    return {
        "lm": lm,
        "face_pts": fp.astype(np.float32),
        "uv_tris": build_triangulation(lm).triangles,
        "face_tris": build_triangulation(fp).triangles,
        "reg_tris": build_triangulation(_with_anchors(lm)).triangles,
    }


def pack_views(view: dict, layout=TEST_PACK) -> np.ndarray:
    """Dict -> channel-packed array (the reference's tensor layout)."""
    return np.concatenate([view[k][..., :c] for k, c in layout], axis=-1)


def unpack_views(packed: np.ndarray, layout=TEST_PACK) -> dict:
    out, ofs = {}, 0
    for k, c in layout:
        out[k] = packed[..., ofs:ofs + c]
        ofs += c
    return out


def prefetch(iterable, depth: int = 2):
    """Background-thread prefetch: parse sample i+1..i+depth on the host
    while the consumer's device work for sample i runs.

    Eval loops are host-parse + device-call pipelines (e.g. UCB: ~0.1-0.3 s
    of decode/crop/rasterize followed by a ~0.22 s fused device call);
    serial execution pays both, prefetching hides the smaller of the two.
    """
    import queue as _queue

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    done = object()
    stop = threading.Event()   # consumer gone: unblock + end the producer

    def put(item) -> bool:
        """Blocking put that gives up once the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not put(item):
                    return
            put(done)
        except BaseException as e:  # surface parser errors at the consumer
            put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer raised or broke out early: stop the producer thread so
        # it (and the parsed batches it holds) don't leak in long-lived
        # processes running many evals
        stop.set()


class Dataset:
    """Mode-dispatching dataset with the reference's `.name_list` contract."""

    def __init__(self, config: Config, mode: str, dset: Optional[str] = None,
                 seed: int = 0):
        self.config = config
        self.mode = mode
        self.dset = dset
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        if mode == "train":
            dirs = config.data_dirs
        elif mode == "val":
            dirs = config.data_dirs_val
        else:
            dirs = config.data_dirs_test
        self.name_list = self._collect(dirs)
        self.feed = iter(self)

    # ----------------------------------------------------------- listing
    def _collect(self, dirs: Sequence[str]) -> list[str]:
        try:
            from natsort import natsorted
        except ImportError:
            natsorted = _natsorted
        samples: list[str] = []
        if self.mode in ("train", "val"):
            for d in dirs:
                samples += _glob.glob(d)
        else:
            # sfw frame eval keys off the label masks
            # (dataset_with_TSM.py:62); video mode and image eval key off the
            # landmark files (dataset.py:56)
            if self.dset == "sfw" and self.config.mode != "sfw_video":
                pattern = "/*_label.png"
            else:
                pattern = "/*.npy"
            for d in dirs:
                for folder in natsorted(_glob.glob(d)):
                    samples += natsorted(_glob.glob(folder + pattern))
        return samples

    # ----------------------------------------------------------- parsers
    def parse_train(self, identity_dir: str,
                    rng: Optional[np.random.Generator] = None) -> dict:
        """One training sample: random frame + mirrored twin
        (dataset.py:75-109).  Returns a dict of [2,S,S,C] arrays.

        `rng` lets each loader thread use its own generator
        (np.random.Generator is not thread-safe)."""
        cfg = self.config
        s = cfg.img_size
        rng = self.rng if rng is None else rng
        lms = _glob.glob(identity_dir + "/*.npy")
        lm_path = lms[int(rng.integers(0, len(lms)))]
        gt_path = lm_path.rsplit(".", 1)[0] + ".png"

        gt0 = _imread_rgb(gt_path)
        gt, lm, lm_mirror, _ = face_crop_and_resize(
            gt0, np.load(lm_path), s, aug=True, rng=rng)
        devgeo = getattr(cfg, "device_geometry", False)
        devdark = getattr(cfg, "device_darken", False)
        # devgeo ships the UNGATED occluder mask and no host face map: the
        # train step rasterizes the face in-graph (identical numerics) and
        # gates there — the host rasterization was ~15 ms/sample.
        # devdark additionally ships the RAW crop with no img_dark plane:
        # the step derives the jittered pair in-graph
        # (synthesis.derive_darkened_views — one draw per mirrored pair,
        # like this parser)
        gt, img_dark, mask, _, face = shadow_synthesis_host(
            gt, lm, 0.0, mask_dir=cfg.shadow_mask_dir or None, rng=rng,
            rasterize_face=not devgeo, darken=not devdark)
        if devgeo:
            g = _geometry_primitives(lm)
            gm = _geometry_primitives(lm_mirror)
        else:
            g = _geometry(lm, s)
            gm = _geometry(lm_mirror, s)

        view0 = {"gt": gt, "mask": mask[..., :1], **g}
        view1 = {"gt": gt[:, ::-1], "mask": mask[:, ::-1, :1], **gm}
        if img_dark is not None:
            view0["img_dark"] = img_dark
            view1["img_dark"] = img_dark[:, ::-1]
        if not devgeo:
            view0["face"] = face[..., :1]
            view1["face"] = face[:, ::-1, :1]
        return {k: np.stack([view0[k], view1[k]]).astype(
                    np.int32 if k.endswith("_tris") else np.float32)
                for k in view0}

    def _test_view(self, lm_path: str, gt: Optional[np.ndarray],
                   extra: Optional[np.ndarray] = None):
        """One eval view: crop + geometry; gt rides through the same crop.

        With `config.device_geometry` the view carries landmarks + Delaunay
        topologies instead of host-rasterized maps (the evaluator's jitted
        forward rasterizes them in-graph, like the train step)."""
        cfg = self.config
        s = cfg.img_size
        img = _imread_rgb(lm_path.rsplit(".", 1)[0] + ".png")
        chans = [img] + ([gt] if gt is not None else []) + \
            ([extra] if extra is not None else [])
        stacked = np.concatenate(chans, axis=2)
        crop, lm, lm_mirror, box = face_crop_and_resize(
            stacked, np.load(lm_path), s)
        if getattr(cfg, "device_geometry", False):
            g = _geometry_primitives(lm)
        else:
            g = _geometry(lm, s)
        view = {"img": crop[..., :3], **g}
        ofs = 3
        if gt is not None:
            view["gt"] = crop[..., ofs:ofs + 3]
            ofs += 3
        if extra is not None:
            view["extra"] = crop[..., ofs:]
        return view, box, lm_mirror

    def _parse_test_multiview(self, lm_path: str,
                              gt: np.ndarray) -> tuple[dict, np.ndarray]:
        """Anchor + eval_views-1 random same-folder reference views, all
        carrying the anchor's gt (the shared body of the reference's
        parse_fn_test / parse_fn_test_FFHQ, dataset.py:148-302,616-770).
        Returns (batch dict of [V,...] arrays, anchor crop box)."""
        views = []
        anchor, box, _ = self._test_view(lm_path, gt)
        views.append(anchor)
        folder = os.path.dirname(lm_path)
        pool = _glob.glob(folder + "/*.npy")
        for _ in range(self.config.eval_views - 1):
            ref = pool[int(self.rng.integers(0, len(pool)))]
            v, _, _ = self._test_view(ref, gt)
            views.append(v)
        batch = {k: np.stack([v[k] for v in views]).astype(
                     np.int32 if k.endswith("_tris") else np.float32)
                 for k in views[0]}
        return batch, np.asarray(box, np.float32)

    def parse_test_ucb(self, lm_path: str) -> tuple[dict, np.ndarray]:
        """UCB eval sample: gt lives in the parallel `gt/` tree."""
        return self._parse_test_multiview(
            lm_path, _imread_rgb(self._ucb_gt_path(lm_path)))

    def parse_test_ucb_mirror(self, lm_path: str) -> tuple[dict, np.ndarray]:
        """The TSM variant's UCB eval sample: anchor + mirrored twin with
        mirrored geometry, gt riding the flip (dataset_with_TSM.py:153-190,
        which flips the img∥gt stack together at :176).  Selected for
        variant="tsm" in _test_iter; the TSM test_step forwards these 2
        views with frame=1 (train_with_TSM.py:431-433)."""
        cfg = self.config
        s = cfg.img_size
        gt = _imread_rgb(self._ucb_gt_path(lm_path))
        v, box, lm_mirror = self._test_view(lm_path, gt)
        if getattr(cfg, "device_geometry", False):
            gm = _geometry_primitives(lm_mirror)
        else:
            gm = _geometry(lm_mirror, s)
        view_m = {"img": v["img"][:, ::-1], "gt": v["gt"][:, ::-1], **gm}
        batch = {k: np.stack([v[k], view_m[k]]).astype(
                     np.int32 if k.endswith("_tris") else np.float32)
                 for k in v}
        return batch, np.asarray(box, np.float32)

    @staticmethod
    def _ucb_gt_path(lm_path: str) -> str:
        """`<root>/input/<id>/<img>` -> `<root>/gt/<id>/<img>.png`
        (dataset.py:151-155)."""
        parts = lm_path.replace("\\", "/").split("/")
        stem = parts[-1].split(".")[0] + ".png"
        return "/".join(parts[:-3] + ["gt"] + parts[-2:-1] + [stem])

    def parse_test_ffhq(self, lm_path: str) -> tuple[dict, np.ndarray]:
        """In-the-wild: gt = input (dataset.py:622-623)."""
        return self._parse_test_multiview(
            lm_path, _imread_rgb(lm_path.rsplit(".", 1)[0] + ".png"))

    def parse_test_sfw(self, label_path: str) -> tuple[dict, np.ndarray]:
        """One SFW frame + mirrored twin with cmap + label mask
        (dataset_with_TSM.py:225-287).  The GSC variant routes to its own
        10-frame protocol (_parse_test_sfw_gsc)."""
        cfg = self.config
        if cfg.variant == "gsc":
            return self._parse_test_sfw_gsc(label_path)
        s = cfg.img_size
        stem = label_path[:-len("_label.png")]
        lm_path = stem + ".npy"
        # cmap rides the MASK stem: <frame>_label_cmap.png
        # (dataset_with_TSM.py:231 `_mask.split('.')[0]+'_cmap.png'`)
        cmap = _imread_rgb(label_path[:-len(".png")] + "_cmap.png")
        label = _imread_gray_raw(label_path)
        extra = np.concatenate([cmap, label], axis=2)

        v, box, lm_mirror = self._test_view(lm_path, None, extra)
        if getattr(cfg, "device_geometry", False):
            gm = _geometry_primitives(lm_mirror)
        else:
            gm = _geometry(lm_mirror, s)
        img_m = v["img"][:, ::-1]
        extra_m = v["extra"][:, ::-1]
        view_m = {"img": img_m, "extra": extra_m, **gm}
        batch = {k: np.stack([v[k], view_m[k]]).astype(
                     np.int32 if k.endswith("_tris") else np.float32)
                 for k in v}
        batch["cmap"] = batch["extra"][..., :3]
        batch["label"] = batch["extra"][..., 3:4]
        del batch["extra"]
        return batch, np.asarray(box, np.float32)

    def _parse_test_sfw_gsc(self, label_path: str) -> tuple[dict, np.ndarray]:
        """The GSC variant's testsfw parse (dataset.py:338-614): 10
        temporally spread frames, each carrying the ANCHOR's cmap + label
        resized to the frame's raw resolution and cropped in that frame's
        own geometry (the reference re-resizes the anchor's cmap/mask for
        every frame — a no-op for constant-resolution videos).  The frame
        schedule is the shared video spread, clamped to available frames
        like parse_test_sfw_video (documented delta: the reference
        `input()`-hangs on a missing frame, dataset.py:430-433)."""
        import cv2

        folder = os.path.dirname(label_path)
        stem = os.path.basename(label_path)[:-len("_label.png")]
        cmap = _imread_rgb(label_path[:-len(".png")] + "_cmap.png")
        label = _imread_gray_raw(label_path)

        avail = sorted(int(os.path.basename(p).split(".")[0])
                       for p in _glob.glob(os.path.join(folder, "*.npy"))
                       if os.path.basename(p).split(".")[0].isdigit())
        lo, hi = (avail[0], avail[-1]) if avail else (0, 0)
        frames = [min(max(fr, lo), hi)
                  for fr in self.video_frame_schedule(int(stem))]
        views, box = [], None
        for fr in frames:
            lm_path = os.path.join(folder, f"{fr}.npy")
            raw = _imread_rgb(os.path.join(folder, f"{fr}.png"))
            h, w = raw.shape[:2]
            if cmap.shape[:2] != (h, w):
                ex = np.concatenate(
                    [cv2.resize(cmap, (w, h)),
                     cv2.resize(label[..., 0], (w, h))[..., None]], axis=2)
            else:
                ex = np.concatenate([cmap, label], axis=2)
            v, b, _ = self._test_view(lm_path, None, ex.astype(np.float32))
            views.append(v)
            if box is None:
                box = b
        batch = {k: np.stack([v[k] for v in views]).astype(
                     np.int32 if k.endswith("_tris") else np.float32)
                 for k in views[0]}
        batch["cmap"] = batch["extra"][..., :3]
        batch["label"] = batch["extra"][..., 3:4]
        del batch["extra"]
        return batch, np.asarray(box, np.float32)

    @staticmethod
    def video_frame_schedule(frame: int) -> list[int]:
        """The 10-frame temporal spread (dataset.py:808-867)."""
        f = frame
        if f < 3:
            rest = [f + 2, f + 4, f + 6, f + 8, f + 10, f + 12, f + 14,
                    f + 16, f + 1]
        elif f < 5:
            rest = [f + 1, f + 3, f + 5, f + 7, f + 9, f + 11, f + 13,
                    f + 15, f - 2]
        elif f < 7:
            rest = [f + 1, f + 3, f + 5, f + 7, f + 9, f + 11, f + 13,
                    f - 2, f - 4]
        elif f < 9:
            rest = [f + 1, f + 3, f + 5, f + 7, f + 9, f + 11, f - 2,
                    f - 4, f - 6]
        elif f > 100:
            rest = [f - 1, f - 3, f - 5, f - 7, f - 9, f - 11, f - 2,
                    f - 4, f - 6]
        else:
            rest = [f + 1, f + 3, f + 5, f + 7, f + 9, f - 2, f - 4,
                    f - 6, f - 8]
        return [f] + rest

    def parse_test_sfw_video(self, lm_path: str) -> tuple[dict, np.ndarray]:
        """10 temporally spread frames of one video (dataset.py:772-1065).

        Scheduled frame indices are clamped to the video's available range.
        The reference assumes every anchor's full offset schedule exists on
        disk and `input()`-BLOCKS forever on a missing frame
        (dataset.py:871-874 and the 8 analogous checks); clamping instead
        keeps short clips and end-of-video anchors evaluable — a deliberate
        delta (PARITY.md) that only changes behavior where the reference
        would hang."""
        folder = os.path.dirname(lm_path)
        stem = os.path.basename(lm_path).split(".")[0]
        avail = sorted(int(os.path.basename(p).split(".")[0])
                       for p in _glob.glob(os.path.join(folder, "*.npy"))
                       if os.path.basename(p).split(".")[0].isdigit())
        lo, hi = (avail[0], avail[-1]) if avail else (0, 0)
        frames = [min(max(fr, lo), hi)
                  for fr in self.video_frame_schedule(int(stem))]
        views, box = [], None
        for fr in frames:
            lm_path = os.path.join(folder, f"{fr}.npy")
            v, b, _ = self._test_view(lm_path, None)
            views.append(v)
            if box is None:
                box = b
        batch = {k: np.stack([v[k] for v in views]).astype(
                     np.int32 if k.endswith("_tris") else np.float32)
                 for k in views[0]}
        return batch, np.asarray(box, np.float32)

    # --------------------------------------------------------- iteration
    def __iter__(self) -> Iterator:
        if self.mode in ("train", "val"):
            return self._train_iter()
        return self._test_iter()

    def _train_iter(self):
        """Infinite shuffled iterator with thread-pool prefetch.

        Each worker thread owns an independent np.random.Generator spawned
        from the dataset seed (Generator is not thread-safe, and a shared
        one would also make streams depend on thread scheduling).

        The pool lives exactly as long as the iterator: dropping the
        iterator (or calling .close() on it) triggers the generator's
        finally block, which cancels queued parses and releases the worker
        threads — long-lived processes that build many Datasets (eval
        services that also train, notebooks) do not accumulate pools."""
        n_workers = max(2, min(os.cpu_count() or 1, 16))
        pool = _futures.ThreadPoolExecutor(max_workers=n_workers)
        spawner = iter(np.random.SeedSequence(self.seed).spawn(n_workers * 4))
        tls = threading.local()
        spawn_lock = threading.Lock()

        def sample():
            rng = getattr(tls, "rng", None)
            if rng is None:
                with spawn_lock:
                    tls.rng = np.random.default_rng(next(spawner))
                rng = tls.rng
            d = self.name_list[int(rng.integers(0, len(self.name_list)))]
            return self.parse_train(d, rng=rng)

        try:
            pending = [pool.submit(sample) for _ in range(2 * n_workers)]
            idx = 0
            while True:
                result = pending[idx].result()
                pending[idx] = pool.submit(sample)
                idx = (idx + 1) % len(pending)
                yield result
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    def _test_iter(self):
        for name in self.name_list:
            if self.dset == "sfw" and self.config.mode == "sfw_video":
                yield (*self.parse_test_sfw_video(name), name)
            elif self.dset == "sfw":
                yield (*self.parse_test_sfw(name), name)
            elif self.config.mode == "ucb":
                if self.config.variant == "tsm":
                    yield (*self.parse_test_ucb_mirror(name), name)
                else:
                    yield (*self.parse_test_ucb(name), name)
            else:
                yield (*self.parse_test_ffhq(name), name)
