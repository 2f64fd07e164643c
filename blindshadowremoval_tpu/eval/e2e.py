"""End-to-end pipeline: raw in-the-wild images -> deshadowed faces.

The reference splits this across three manual passes — landmark detection
(`bmvc2022-dataprocess.py:10-29`, eager torch per image), crop
(`dataprocess.py:39-78`), and inference (`train_test_GSC.py:934-948`) —
each reading/writing intermediate files.  This module is the single warm
path: every neural stage runs batched on fixed shapes (compiled once) and
per-image host work (letterbox, crop, box decode) is the only
shape-variant code.

    S3FD detect (batched, canonical det_size)   models/sfd.py:FaceDetector
      -> 2D-FAN align (batched 256x256)         models/fan.py:LandmarkAligner
      -> offline crop/align to 256x256          geometry/crop.py:offline_crop
      -> GSC generator + in-graph geometry      eval/serving.py
      -> shadow-mask-gated composite            (this module, on host)

The composite matches the in-the-wild protocol: no part masks exist for
arbitrary images, so the predicted shadow map gated by the face region is
the detection (testFFHQ saves pred + mask without compositing,
train_test_GSC.py:863-890; the composite here is the framework's serving
product — `pred` and `mask_pred` are still returned raw for protocol
parity).

Landmark/detector weights are converted offline from the published
checkpoints (tools/convert_{fan,sfd}_weights.py); with `landmarks=` the
neural stages are skipped and the caller's 68x2 arrays (e.g. the
reference's shipped `.npy` files) drive the crop — the contract the rest
of the repo already uses.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Optional, Sequence

import numpy as np

from blindshadowremoval_tpu.config import Config
from blindshadowremoval_tpu.geometry.crop import offline_crop


@dataclasses.dataclass
class StageTimes:
    """Wall seconds per stage of the last __call__ (host+device inclusive)."""

    detect: float = 0.0
    align: float = 0.0
    crop: float = 0.0
    deshadow: float = 0.0
    images: int = 0
    faces: int = 0

    def as_dict(self) -> dict:
        total = self.detect + self.align + self.crop + self.deshadow
        d = dataclasses.asdict(self)
        d["total"] = total
        if self.images:
            d["images_per_s"] = self.images / total if total else float("inf")
        return d


class DeshadowPipeline:
    """One warm object, three batched device stages, zero intermediate
    files.  All stages pad tail batches to their warm shapes, so any number
    of images streams through three compiled executables."""

    def __init__(self, config: Config, gen_variables: Any,
                 fan_variables: Any = None, sfd_variables: Any = None,
                 det_size: int = 640, det_batch: int = 4,
                 fan_batch: int = 16, fan_modules: int = 4,
                 stage_dtype: Any = None, min_face: int = 250,
                 service: Any = None, **service_kwargs):
        import jax.numpy as jnp

        from blindshadowremoval_tpu.eval.serving import ShadowRemovalService

        dt = jnp.bfloat16 if stage_dtype is None else stage_dtype
        self.config = config
        self.min_face = min_face
        self.detector = None
        self.aligner = None
        if sfd_variables is not None:
            from blindshadowremoval_tpu.models.sfd import FaceDetector

            self.detector = FaceDetector(sfd_variables, det_size=det_size,
                                         batch_size=det_batch, dtype=dt)
        if fan_variables is not None:
            from blindshadowremoval_tpu.models.fan import LandmarkAligner

            # uint8 crop ingress: the align stage is upload-bound on a
            # remote chip and the 1/255 step sits inside the crop's own
            # resample noise (models/fan.py)
            self.aligner = LandmarkAligner(fan_variables,
                                           num_modules=fan_modules,
                                           batch_size=fan_batch, dtype=dt,
                                           ingress_u8=True)
        self.service = service or ShadowRemovalService(
            config, gen_variables, **service_kwargs)
        self.last_times = StageTimes()

    def __call__(self, images: Sequence[np.ndarray],
                 landmarks: Optional[Sequence[Optional[np.ndarray]]] = None,
                 boxes: Optional[Sequence[Optional[Sequence[float]]]] = None,
                 ) -> list[Optional[dict]]:
        """RGB frames -> per-image result dict, or None where no usable
        face was found (no detection, or face below the `min_face` gate —
        dataprocess.py:66's `length > 250`).

        `landmarks[i]` (68x2) skips detect+align for that image;
        `boxes[i]` skips detection only.  Result keys: `pred` (deshadowed
        256 crop), `mask_pred` (face-gated shadow probability), `out`
        (mask-composited crop), `crop` (aligned input), `lm`, `box`
        (detector box or None), `crop_box` (the service's crop box).
        """
        t = StageTimes(images=len(images))
        n = len(images)
        lms: list[Optional[np.ndarray]] = (
            list(landmarks) if landmarks is not None else [None] * n)
        bxs: list[Optional[Sequence[float]]] = (
            list(boxes) if boxes is not None else [None] * n)

        bxs, t.detect = self._stage_detect(images, lms, bxs)
        lms, t.align = self._stage_align(images, lms, bxs)
        crops, t.crop = self._stage_crop(images, lms)
        results, t.deshadow, t.faces = self._stage_deshadow(crops, bxs)
        self.last_times = t
        return results

    # ------------------------------------------------------------ stages
    # Each stage is self-contained (inputs -> outputs + wall seconds) so
    # the serial __call__ and the overlapped run_dir pipeline share one
    # implementation.

    def _stage_detect(self, images, lms, bxs):
        """Stage 1: S3FD boxes for images lacking both lm and box."""
        n = len(images)
        need_det = [i for i in range(n) if lms[i] is None and bxs[i] is None]
        dt = 0.0
        if need_det:
            if self.detector is None:
                raise ValueError(
                    "no sfd_variables and no landmarks/boxes provided for "
                    f"{len(need_det)} image(s) — pass one of the three")
            t0 = time.perf_counter()
            dets = self.detector([images[i] for i in need_det])
            for i, d in zip(need_det, dets):
                # best-scoring face only, the reference's preds[0] contract
                # (bmvc2022-dataprocess.py:22)
                bxs[i] = tuple(d[0, :4]) if len(d) else None
            dt = time.perf_counter() - t0
        return bxs, dt

    def _stage_align(self, images, lms, bxs):
        """Stage 2: 2D-FAN landmarks for images with a box but no lm."""
        n = len(images)
        need_lm = [i for i in range(n)
                   if lms[i] is None and bxs[i] is not None]
        dt = 0.0
        if need_lm:
            if self.aligner is None:
                raise ValueError(
                    "no fan_variables and no landmarks provided for "
                    f"{len(need_lm)} image(s)")
            t0 = time.perf_counter()
            pts = self.aligner([images[i] for i in need_lm],
                               [bxs[i] for i in need_lm])
            for i, p in zip(need_lm, pts):
                lms[i] = p
            dt = time.perf_counter() - t0
        return lms, dt

    def _stage_crop(self, images, lms):
        """Stage 3: offline crop/align (host, dataprocess.py semantics)."""
        t0 = time.perf_counter()
        crops: list[Optional[tuple]] = []
        for i in range(len(images)):
            if lms[i] is None:
                crops.append(None)
                continue
            crops.append(offline_crop(images[i], lms[i],
                                      out_size=self.config.img_size,
                                      min_face=self.min_face))
        return crops, time.perf_counter() - t0

    def _stage_deshadow(self, crops, bxs):
        """Stage 4: batched serving forward + mask-gated composite."""
        n = len(crops)
        keep = [i for i, c in enumerate(crops) if c is not None]
        results: list[Optional[dict]] = [None] * n
        dt = 0.0
        if keep:
            t0 = time.perf_counter()
            # crops are uint8-scaled [0,255] out of offline_crop; the
            # service expects [0,1] like the dataset parsers
            svc_out = self.service.remove_shadows(
                [crops[i][0] / 255.0 for i in keep],
                [crops[i][1] for i in keep])
            dt = time.perf_counter() - t0
            for i, r in zip(keep, svc_out):
                mask = np.clip(np.asarray(r["mask_pred"], np.float32),
                               0.0, 1.0)
                out = r["pred"] * mask + r["img"] * (1.0 - mask)
                results[i] = {
                    "pred": r["pred"], "mask_pred": r["mask_pred"],
                    "out": np.clip(out, 0.0, 1.0),
                    "crop": r["img"], "lm": crops[i][1],
                    "box": bxs[i], "crop_box": r["box"],
                }
        return results, dt, len(keep)

    # ------------------------------------------------------------- dirs
    def run_dir(self, input_dir: str, output_dir: str,
                batch_files: int = 16, overlap: bool = True) -> dict:
        """Every PNG under `input_dir` -> `<output_dir>/<name>-out.png`
        (composited), `-pred.png`, `-mask.png`.  PNGs with a sibling
        `<name>.npy` use those landmarks (the reference's shipped
        contract); the rest go through detect+align.  Returns aggregate
        stage timings plus the composed wall.

        `overlap=True` (default) runs the stages as a depth-1 thread
        pipeline over file chunks — read/decode, detect, align, crop, and
        deshadow+write each work on a DIFFERENT chunk concurrently, so
        composed throughput approaches the slowest stage instead of the
        serial sum (the reference's flow is three separate manual scripts
        with intermediate files, bmvc2022-dataprocess.py + dataprocess.py +
        train_test_GSC.py:934-948; measured rows in docs/perf.md)."""
        import glob
        import queue
        import threading

        import cv2

        os.makedirs(output_dir, exist_ok=True)
        files = sorted(glob.glob(os.path.join(input_dir, "*.png")))
        agg = StageTimes()
        agg_lock = threading.Lock()
        done = 0
        t_wall = time.perf_counter()

        def read_chunk(chunk):
            imgs, lms = [], []
            for f in chunk:
                imgs.append(cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB))
                npy = f.rsplit(".", 1)[0] + ".npy"
                lms.append(np.load(npy) if os.path.isfile(npy) else None)
            return imgs, lms

        def write_results(chunk, res):
            nonlocal done
            for f, r in zip(chunk, res):
                if r is None:
                    print(f"no face: {f}")
                    continue
                name = os.path.splitext(os.path.basename(f))[0]
                for key, suffix in (("out", "out"), ("pred", "pred"),
                                    ("mask_pred", "mask")):
                    img8 = np.clip(np.asarray(r[key], np.float32) * 255.0,
                                   0, 255).astype(np.uint8)
                    if img8.shape[-1] == 1:
                        img8 = np.repeat(img8, 3, axis=-1)
                    cv2.imwrite(
                        os.path.join(output_dir, f"{name}-{suffix}.png"),
                        cv2.cvtColor(img8, cv2.COLOR_RGB2BGR))
                done += 1

        def finish_stats():
            stats = agg.as_dict()
            wall = time.perf_counter() - t_wall
            stats["wall"] = wall
            if agg.images:
                stats["images_per_s_wall"] = agg.images / wall
            stats["written"] = done
            return stats

        if not overlap:
            for start in range(0, len(files), batch_files):
                chunk = files[start:start + batch_files]
                imgs, lms = read_chunk(chunk)
                res = self(imgs, landmarks=lms)
                write_results(chunk, res)
                lt = self.last_times
                agg.detect += lt.detect
                agg.align += lt.align
                agg.crop += lt.crop
                agg.deshadow += lt.deshadow
                agg.images += lt.images
                agg.faces += lt.faces
            return finish_stats()

        # ---- depth-1 stage pipeline: four queue-connected worker threads
        # (read -> detect -> align -> crop), deshadow+write on this thread.
        # Device stages block on tunnel RPCs and host stages on cv2/numpy —
        # both release the GIL, so the chunks genuinely overlap.
        def det_fn(chunk, imgs, lms, bxs):
            bxs, dt = self._stage_detect(imgs, lms, bxs)
            with agg_lock:
                agg.detect += dt
            return chunk, imgs, lms, bxs

        def aln_fn(chunk, imgs, lms, bxs):
            lms, dt = self._stage_align(imgs, lms, bxs)
            with agg_lock:
                agg.align += dt
            return chunk, imgs, lms, bxs

        def crop_fn(chunk, imgs, lms, bxs):
            crops, dt = self._stage_crop(imgs, lms)
            with agg_lock:
                agg.crop += dt
            return chunk, crops, bxs

        # cooperative shutdown: every blocking put/get loops on `stop` so an
        # error anywhere (or the main thread bailing) unblocks producers
        # parked on the depth-1 queues instead of leaking them with their
        # decoded-chunk payloads until the 30 s joins time out
        stop = threading.Event()
        writer_err = []

        def _put(q, item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def reader(q_out):
            try:
                for start in range(0, len(files), batch_files):
                    chunk = files[start:start + batch_files]
                    imgs, lms = read_chunk(chunk)
                    if not _put(q_out,
                                ("item",
                                 (chunk, imgs, lms, [None] * len(imgs)))):
                        return
                _put(q_out, ("end", None))
            except BaseException as e:     # pragma: no cover - IO errors
                _put(q_out, ("err", e))

        def stage_worker(q_in, q_out, fn):
            while not stop.is_set():
                try:
                    kind, payload = q_in.get(timeout=0.5)
                except queue.Empty:
                    continue
                if kind != "item":
                    _put(q_out, (kind, payload))
                    return
                try:
                    item = ("item", fn(*payload))
                except BaseException as e:
                    _put(q_out, ("err", e))
                    return
                if not _put(q_out, item):
                    return

        def writer(q_in):
            while not stop.is_set():
                try:
                    kind, payload = q_in.get(timeout=0.5)
                except queue.Empty:
                    continue
                if kind != "item":
                    return
                if writer_err:      # drain so the producer's put can't block
                    continue
                try:
                    write_results(*payload)
                except BaseException as e:
                    writer_err.append(e)

        q_read, q_det, q_aln, q_crop, q_write = (queue.Queue(maxsize=1)
                                                 for _ in range(5))
        threads = [
            threading.Thread(target=reader, args=(q_read,), daemon=True),
            threading.Thread(target=stage_worker,
                             args=(q_read, q_det, det_fn), daemon=True),
            threading.Thread(target=stage_worker,
                             args=(q_det, q_aln, aln_fn), daemon=True),
            threading.Thread(target=stage_worker,
                             args=(q_aln, q_crop, crop_fn), daemon=True),
            threading.Thread(target=writer, args=(q_write,), daemon=True),
        ]
        for th in threads:
            th.start()
        try:
            while True:
                kind, payload = q_crop.get()
                if kind == "err":
                    raise payload
                if kind == "end":
                    break
                chunk, crops, bxs = payload
                results, dt, faces = self._stage_deshadow(crops, bxs)
                with agg_lock:
                    agg.deshadow += dt
                    agg.images += len(chunk)
                    agg.faces += faces
                if not _put(q_write, ("item", (chunk, results))):
                    break
            # let the writer drain its queue before signalling shutdown
            _put(q_write, ("end", None))
            for th in threads:
                th.join(timeout=30.0)
        finally:
            stop.set()
            for th in threads:
                th.join(timeout=5.0)
        if writer_err:
            raise writer_err[0]
        return finish_stats()
