"""TSM-protocol heuristic-branch-coverage goldens, TF side.

The TSM variant's UCB test_step (train_with_TSM.py:420-617) is a distinct
heuristic pipeline: flat 0.01 threshold (no adaptive blocks), components
kept at >= 0.6x the largest (:536), hair veto (:540), and its OWN four
nose-fraction veto bands (:561) with the short/dark vs long reach split
(:562-565) — all at FULL 256² resolution against unresized part masks.
The one TSM e2e golden (e2e_tsm_ucb.npz) fires a single nose band; this
tool builds a fixture where EVERY TSM gate is exercised and certified
against the reference's own train_with_TSM.py code, using the same
part-mask-synthesis approach as the GSC branch goldens
(tools/make_tf_ref_branch_goldens.py):

  phase 1 (TF):   parse M UCB images through the reference's TSM Dataset
                  (anchor + mirrored twin) to capture its tensors + boxes;
  phase 2 (ours): run this framework's TSM protocol with the instrumented
                  post-processor, take natural branch coverage, then search
                  deterministic part-mask rectangle edits for the rest —
                  the TSM heuristics run at full res, so the GSC tool's
                  search machinery applies with scale 1;
  phase 3 (TF):   re-run the reference's TSM FSRNet.test_step on each
                  selected (image, tweaked masks) case for the goldens.

tests/test_branch_goldens.py::test_tsm_branch_golden_parity_and_coverage
replays each case, asserts output parity + the branch report + liveness,
and requires the union of certified branches to cover TSM_BRANCHES.

Run from anywhere:  python tools/make_tf_ref_tsm_branch_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# importing the e2e tool performs the jax-CPU + TF + shim setup
from make_tf_ref_e2e_goldens import (  # noqa: E402
    OUT_DIR, REF, WORKDIR, _patch_sharelayer_batch_general, e2e_weights,
    setup_workdir, patched_vgg19)
from make_tf_ref_goldens import (  # noqa: E402
    SEED, assign_weights, patch_keras3_compat, patch_sharelayer)
from make_tf_ref_branch_goldens import (  # noqa: E402
    MASK_DIRS, _bbox01, _cols_to_rects, bisect_frac, load_parts)

import jax  # noqa: E402

from blindshadowremoval_tpu.eval.branch_probes import (  # noqa: E402
    PART_KEYS, apply_rects, disable_branch)

M = int(os.environ.get("TSM_BRANCH_M", "24"))
FIXTURE = os.path.join(OUT_DIR, "tsm_branch_cases.npz")


class TSMPipeline:
    """This framework's TSM UCB protocol, factored like the GSC tool's
    OurPipeline: forward once per image (anchor + mirror, frame=1), cheap
    full-res host heuristics re-run per part-mask tweak.

    API-compatible with the GSC search helpers — `_prepped` reports
    size=256 so every det-frame <-> full-res scale factor is 1."""

    def __init__(self, boxes):
        from blindshadowremoval_tpu.config import get_config
        from blindshadowremoval_tpu.data.dataset import Dataset
        from blindshadowremoval_tpu.eval.evaluators import UCBEvaluator
        from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator
        from blindshadowremoval_tpu.models.tf_checkpoint import (
            generator_mapping, load_weights_dict, synthetic_tf_weights)

        gen = TSMGenerator()
        z3 = np.zeros((2, 64, 64, 3), np.float32)
        variables = gen.init(jax.random.PRNGKey(0), z3, z3,
                             np.zeros((2, 64, 64, 6), np.float32), frame=2)
        weights = synthetic_tf_weights(variables, generator_mapping("tsm"),
                                       seed=SEED)
        weights["generator/clr_conv3/conv/bias"] = (
            weights["generator/clr_conv3/conv/bias"] + 0.5)
        variables = load_weights_dict(weights, variables,
                                      generator_mapping("tsm"))

        cfg = get_config(
            "ucb", variant="tsm",
            data_dirs_test=(os.path.join(REF, "UCB", "train", "input", "*"),),
            compute_dtype="float32", part_mask_root=REF,
            checkpoint_dir=os.path.join(WORKDIR, "ours_tsm_ckpt"))
        self.ev = UCBEvaluator(cfg, variables)
        self.boxes = boxes
        self._ds_iter = iter(Dataset(cfg, "test"))
        self._next_idx = 0
        self._cache = {}
        self.mask_files = sorted(os.listdir(
            os.path.join(REF, MASK_DIRS["face_hair"])))
        self._parts = {}

    def parts(self, idx: int) -> dict:
        if idx not in self._parts:
            self._parts[idx] = load_parts(self.mask_files[idx])
        return self._parts[idx]

    def _prepped(self, idx: int):
        while self._next_idx <= idx:
            batch, _, name = next(self._ds_iter)
            i = self._next_idx
            self._next_idx += 1
            # full-res protocol: no resize of pred/mp/tmp into the box
            _, rgb, _, mask_pred, _ = self.ev.forward(batch, frame=1)
            tmp = np.asarray(batch["img"][0], np.float32)
            pred = np.asarray(rgb[0], np.float32)   # raw, unclipped (:583)
            mp = np.asarray(mask_pred[0], np.float32)
            mp = np.repeat(mp, 3, axis=2) if mp.shape[2] == 1 else mp
            self._cache[i] = (pred, mp, tmp, 256, name)
        return self._cache[idx]

    def run(self, idx: int, rects=None, params=None):
        """Full-res TSM heuristics for image idx under rectangle edits.
        Returns (detected[...,0] uint8, composite, report)."""
        from blindshadowremoval_tpu.eval.postprocess import (
            TSM_PARAMS, ucb_postprocess)

        pred, mp, tmp, _, _ = self._prepped(idx)
        parts = self.parts(idx)
        if rects is not None and len(rects):
            parts = apply_rects(parts, rects)
        report = {}
        detected, _ = ucb_postprocess(
            mp, tmp, parts["face_hair"], parts["face_no_hair"],
            parts["mouth"], parts["nose"], parts["eyebrow"], parts["eye"],
            parts["glasses"], params or TSM_PARAMS, report=report)
        # composite at full res, clip, THEN resize (train_with_TSM.py:583);
        # detection is the search signal so the resize is left to phase 3
        out = np.clip(pred * detected + tmp * (1.0 - detected), 0.0, 1.0)
        return (detected[..., 0] > 0.5).astype(np.uint8), out, report

    def live(self, idx: int, rects, branch, base=None) -> bool:
        """Does disabling `branch` change the detected mask?  Cases with an
        EMPTY detection are rejected — the reference's component stage
        np.max's an empty sizes array there (train_with_TSM.py:536)."""
        from blindshadowremoval_tpu.eval.postprocess import TSM_PARAMS

        if base is None:
            det, _, rep = self.run(idx, rects)
        else:
            det, rep = base
        pred, mp, tmp, _, _ = self._prepped(idx)
        parts = self.parts(idx)
        if rects is not None and len(rects):
            parts = apply_rects(parts, rects)
        # pre-component detection must be non-empty for the reference
        if not np.any((mp * parts["face_hair"]) > 0.01):
            return False
        if not rep.get(branch, False):
            return False
        det_off, _, _ = self.run(idx, rects,
                                 disable_branch(TSM_PARAMS, branch))
        return bool(np.any(det != det_off))


# ------------------------------------------------------ branch searches
def _clean_nose_columns(pipe, idx, darkest_first: bool = False):
    """Full-res candidate columns for nose painting: within the nose's row
    range, outside its column range, detection-free over those rows."""
    det, _, _ = pipe.run(idx)
    _, mp, tmp, _, _ = pipe._prepped(idx)
    parts = pipe.parts(idx)
    nb = _bbox01(parts["nose"][..., 0])
    if not nb:
        return None
    r0, r1 = int(nb[0]), int(nb[1]) + 1
    rows = np.arange(r0, r1)
    cands = []
    for c in range(256):
        if int(nb[2]) <= c <= int(nb[3]):
            continue
        if np.any(det[rows, c]):
            continue
        inten = float(tmp[rows, c].mean())
        prox = min(abs(c - int(nb[2])), abs(c - int(nb[3])))
        cands.append((inten if darkest_first else prox, c))
    cands.sort()
    return r0, r1, [c for _, c in cands]


def cover_nose_band(pipe, k, band, pool, accept_branch=None):
    """Drive frac_nose into the TSM band by painting detection-free nose
    columns (denominator-only growth => monotone)."""
    branch = accept_branch or f"nose_band_{k}"
    for idx in pool:
        cand = _clean_nose_columns(pipe, idx,
                                   darkest_first=accept_branch is not None)
        if cand is None:
            continue
        r0, r1, cols = cand
        rows_n = r1 - r0
        if not cols:
            continue

        def mk(area, cols=cols, r0=r0, r1=r1, rows_n=rows_n):
            return _cols_to_rects(cols, r0, r1, rows_n, area)

        rects = bisect_frac(pipe, idx, branch, "nose_frac",
                            band, mk, len(cols) * rows_n)
        if rects is not None:
            return idx, rects
    return None


def _confinement_rects(R, extra=()):
    """Confine the face to window R (face_hair = face_no_hair = R, so no
    hair region).  The TSM protocol has no forehead block, so no eyebrow
    clearing is needed for reference executability."""
    fhk = PART_KEYS.index("face_hair")
    fnk = PART_KEYS.index("face_no_hair")
    rects = [
        [fhk, 0, 256, 0, 256, 0], [fnk, 0, 256, 0, 256, 0],
        [fhk, R[0], R[1], R[2], R[3], 1], [fnk, R[0], R[1], R[2], R[3], 1],
    ] + [list(e) for e in extra]
    return np.asarray(rects, np.int32).reshape(-1, 6)


def cover_nose_veto_short(pipe, pool):
    """The dark-reach veto needs mean_int(kept) < 0.15 — a detection
    property.  Confine the face to a dark detected window R, relocate the
    nose to a strip over R's top rows plus a side extension sized so
    frac_nose lands in a TSM veto band; kept pixels below the strip sit in
    the short/long reach difference."""
    w = 48
    nk = PART_KEYS.index("nose")
    for idx in pool:
        det, _, _ = pipe.run(idx)
        _, mp, tmp, _, _ = pipe._prepped(idx)
        inten = tmp.mean(axis=2)
        wins = []
        for r0 in range(0, 256 - w, 16):
            for c0 in range(0, 256 - w, 16):
                wd = det[r0:r0 + w, c0:c0 + w] > 0
                cnt = int(wd.sum())
                if cnt < 150:
                    continue
                m = float(inten[r0:r0 + w, c0:c0 + w][wd].mean())
                if m < 0.13:
                    wins.append((m, cnt, r0, c0))
        wins.sort()
        for m, cnt, r0, c0 in wins[:6]:
            R = (r0, r0 + w, c0, c0 + w)
            for h in (12, 16, 24):
                strip_cnt = int((det[r0:r0 + h, c0:c0 + w] > 0).sum())
                if strip_cnt == 0:
                    continue
                # TSM band midpoints (train_with_TSM.py:561)
                for band_mid in (0.365, 0.424, 0.545, 0.5925):
                    need = strip_cnt / band_mid - h * w
                    if need < 0:
                        continue
                    we = int(round(need / h))
                    rects = None
                    for _ in range(3):   # secant refinement on We
                        if we < 0 or c0 - we < 0:
                            break
                        strip = [nk, r0, r0 + h, c0 - we, c0 + w, 1]
                        rects_try = _confinement_rects(
                            R, [[nk, 0, 256, 0, 256, 0], strip])
                        _, _, rep = pipe.run(idx, rects_try)
                        f = rep.get("nose_frac", 0.0)
                        if rep.get("nose_veto_short", False):
                            rects = rects_try
                            break
                        if f <= 0:
                            break
                        we = int(round((strip_cnt / band_mid
                                        - h * w) / h * (f / band_mid)))
                    if rects is not None and pipe.live(
                            idx, rects, "nose_veto_short"):
                        return idx, rects
    return None


def cover_hair_veto(pipe, pool):
    """Paint hair (face_hair on, face_no_hair off) over a kept component's
    bbox so the 0.8-overlap veto drops it — full-res, so the component's
    own bbox is the paint rectangle."""
    import cv2

    for idx in pool:
        det, _, _ = pipe.run(idx)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            det.astype(np.uint8))
        comps = sorted(range(1, n), key=lambda c: -stats[c, 4])
        for c in comps:
            x, y, w, h, area = stats[c]
            if area < 20:
                continue
            r0, r1 = max(int(y) - 4, 0), min(int(y + h) + 4, 256)
            c0, c1 = max(int(x) - 4, 0), min(int(x + w) + 4, 256)
            rect = np.array([
                [PART_KEYS.index("face_hair"), r0, r1, c0, c1, 1],
                [PART_KEYS.index("face_no_hair"), r0, r1, c0, c1, 0],
            ], np.int32)
            if pipe.live(idx, rect, "hair_veto"):
                return idx, rect
    return None


def cover_minfrac(pipe, pool):
    """Confine the face to a window whose detections split into unequal
    components: the smaller one dies on the 0.6x filter.  Window candidates
    slide over the det map looking for >= 2 components where the runner-up
    is under 0.6x the largest."""
    import cv2

    w = 64
    for idx in pool:
        det, _, _ = pipe.run(idx, _confinement_rects((0, 256, 0, 256)))
        for r0 in range(0, 256 - w, 16):
            for c0 in range(0, 256 - w, 16):
                sub = det[r0:r0 + w, c0:c0 + w]
                n, _, stats, _ = cv2.connectedComponentsWithStats(
                    sub.astype(np.uint8), connectivity=4)
                if n < 3:
                    continue
                sizes = sorted(stats[1:, 4], reverse=True)
                if sizes[1] >= 0.6 * sizes[0] or sizes[1] < 4:
                    continue
                rects = _confinement_rects((r0, r0 + w, c0, c0 + w))
                if pipe.live(idx, rects, "minfrac_drop"):
                    return idx, rects
    return None


def _certify(pipe, idx, rects, target, covered):
    from blindshadowremoval_tpu.eval.postprocess import TSM_BRANCHES

    det, _, rep = pipe.run(idx, rects)
    certified = [b for b in TSM_BRANCHES
                 if rep.get(b, False)
                 and pipe.live(idx, rects, b, base=(det, rep))]
    if target and target not in certified:
        certified.append(target)
    return sorted(set(certified))


def select_cases(pipe):
    """Greedy natural cover, then targeted synthesis.  Returns
    [(case_id, image_idx, rects, certified_branches)]."""
    from blindshadowremoval_tpu.eval.postprocess import (TSM_BRANCHES,
                                                         TSM_PARAMS)

    pool = list(range(M))
    none = np.zeros((0, 6), np.int32)
    natural = {}
    for idx in pool:
        det, _, rep = pipe.run(idx)
        natural[idx] = {b for b in TSM_BRANCHES
                        if rep.get(b, False)
                        and pipe.live(idx, none, b, base=(det, rep))}
        print(f"image {idx}: natural live branches "
              f"{sorted(natural[idx])}", flush=True)

    cases = []
    covered = set()
    while True:
        best = max(pool, key=lambda i: len(natural[i] - covered))
        gain = natural[best] - covered
        if not gain:
            break
        cases.append((f"nat{best}", best, none, sorted(gain)))
        covered |= natural[best]

    targeted = {
        **{f"nose_band_{k}": (cover_nose_band, (k, b))
           for k, b in enumerate(TSM_PARAMS.nose_frac_bands)},
        "hair_veto": (cover_hair_veto, ()),
        "minfrac_drop": (cover_minfrac, ()),
        "nose_veto_short": (cover_nose_veto_short, ()),
    }
    missing = [b for b in TSM_BRANCHES if b not in covered]
    print(f"\nnatural cover: {sorted(covered)}\nmissing: {missing}\n",
          flush=True)
    for b in missing:
        if b == "nose_veto_long":
            # rides any nose band on a bright image: sweep the bands and
            # accept when the long reach certifies
            hit = None
            for k, band in enumerate(TSM_PARAMS.nose_frac_bands):
                got = cover_nose_band(pipe, k, band, pool)
                if got and pipe.live(got[0], got[1], "nose_veto_long"):
                    hit = got
                    break
        elif b in targeted:
            fn, extra = targeted[b]
            hit = fn(pipe, *extra, pool) if extra else fn(pipe, pool)
        else:
            hit = None
        if hit is None:
            print(f"!! could not synthesize a case for {b}", flush=True)
            continue
        idx, rects = hit
        certified = _certify(pipe, idx, rects, b, covered)
        cases.append((f"syn_{b}", idx, rects, certified))
        covered |= set(certified)
        print(f"synthesized {b}: image {idx}, rects\n{rects}", flush=True)

    print(f"\nfinal coverage {len(covered)}/{len(TSM_BRANCHES)}: "
          f"{sorted(covered)}", flush=True)
    still = [b for b in TSM_BRANCHES if b not in covered]
    if still:
        print(f"UNCOVERED: {still}", flush=True)
    return cases


# --------------------------------------------------------------- phase 3
def tf_goldens(fsr, cases, imgs, boxes, name_list, out):
    """Reference goldens: feed the phase-1-captured (img, box) tensors and
    tweaked part masks straight into the reference's TSM test_step."""
    import tensorflow as tf

    mask_files = sorted(os.listdir(os.path.join(REF,
                                                MASK_DIRS["face_hair"])))
    names = []
    for cid, i, rects, branches in cases:
        img, box = tf.convert_to_tensor(imgs[i]), boxes[i]
        parts = load_parts(mask_files[i])
        if len(rects):
            parts = apply_rects(parts, rects)
        args = [tf.convert_to_tensor(parts[k]) for k in PART_KEYS]
        try:
            losses, figs, frac_nose, mean_int = fsr.test_step(
                img, tf.convert_to_tensor(box), *args, training=False)
        except Exception as e:
            print(f"!! {cid} crashes the reference ({e}); dropped",
                  flush=True)
            continue
        out[f"{cid}_image_idx"] = np.int32(i)
        out[f"{cid}_box"] = boxes[i].astype(np.float32)
        out[f"{cid}_rects"] = np.asarray(rects, np.int32).reshape(-1, 6)
        out[f"{cid}_branches"] = np.asarray(branches)
        out[f"{cid}_detected"] = np.packbits(
            np.asarray(figs[4])[0][..., 0] > 0.5)
        out[f"{cid}_composite"] = np.asarray(figs[1])[0].astype(np.float16)
        out[f"{cid}_psnr"] = np.float32(losses["psnr"])
        out[f"{cid}_ssim"] = np.float32(losses["ssim"])
        out[f"{cid}_frac_nose"] = np.float32(frac_nose)
        out[f"{cid}_mean_int"] = np.float32(mean_int)
        names.append((cid, name_list[i]))
        print(f"golden {cid} (image {i}, {len(rects)} rects, branches "
              f"{branches}): psnr={float(losses['psnr']):.2f} "
              f"frac_nose={float(frac_nose):.4f}", flush=True)
    out["case_ids"] = np.asarray([c for c, _ in names])
    out["case_names"] = np.asarray([os.path.basename(n) for _, n in names])


def main():
    import glob as _pyglob
    import random

    import tensorflow as tf

    setup_workdir()
    patch_keras3_compat()
    patched_vgg19()
    random.seed(0)
    np.random.seed(0)
    tf.random.set_seed(0)
    sys.path.insert(0, REF)

    import model_with_TSM as ref_tsm_model

    patch_sharelayer(ref_tsm_model)
    _patch_sharelayer_batch_general(ref_tsm_model)
    import dataset_with_TSM as refds_tsm
    import train_with_TSM as twt

    from blindshadowremoval_tpu.data.dataset import _natsorted
    from blindshadowremoval_tpu.models.generator_tsm import TSMGenerator
    from blindshadowremoval_tpu.models.tf_checkpoint import generator_mapping

    # the reference's gt-path split needs the UCB tree 5 directories deep
    # (dataset_with_TSM.py:159; see make_tf_ref_e2e_goldens)
    deep = os.path.join(WORKDIR, "d1", "d2")
    os.makedirs(deep, exist_ok=True)
    link = os.path.join(deep, "UCB")
    if not os.path.islink(link):
        os.symlink(os.path.join(REF, "UCB"), link)

    class UCBTSMDataset(refds_tsm.Dataset):
        def inputs(self, data_dir):
            samples = []
            for _dir in data_dir:
                for _file in _natsorted(_pyglob.glob(_dir)):
                    samples += _natsorted(_pyglob.glob(_file + "/*.npy"))
            ds = tf.data.Dataset.from_tensor_slices(samples)
            ds = ds.map(map_func=self.parse_fn_test)
            return ds.batch(batch_size=1), samples

    config = twt.Config(0)
    config.CHECKPOINT_DIR = os.path.join(WORKDIR, "ckpt_unused_tsm_branch")
    config.DATA_DIR_TEST = [os.path.join(deep, "UCB", "train", "input", "*")]
    fsr = twt.FSRNet(config)
    z = tf.zeros((2, 256, 256, 3))
    fsr.gen(z, z, tf.zeros((2, 256, 256, 6)), 2, tf.constant(True), 1, False)

    variables = TSMGenerator().init(
        jax.random.PRNGKey(0),
        np.zeros((2, 64, 64, 3), np.float32),
        np.zeros((2, 64, 64, 3), np.float32),
        np.zeros((2, 64, 64, 6), np.float32), frame=2)
    weights = e2e_weights(variables, generator_mapping("tsm"), SEED)
    n = assign_weights(fsr.gen, "generator", weights)
    print(f"tsm-branch fsrnet: assigned {n} generator variables", flush=True)

    # phase 1: reference parsed tensors + boxes for the candidate pool
    ds = UCBTSMDataset(config, "test")
    feed = iter(ds.feed)
    imgs, boxes = [], []
    for i in range(M):
        img, box, _ = next(feed)
        imgs.append(np.asarray(img, np.float32))
        boxes.append(np.asarray(box).reshape(4))
    print(f"phase 1: captured {M} reference TSM parses", flush=True)

    # phase 2: our pipeline — natural cover + targeted synthesis
    pipe = TSMPipeline(boxes)
    cases = select_cases(pipe)

    # phase 3: reference goldens for every selected case
    out = {}
    tf_goldens(fsr, cases, imgs, boxes, ds.name_list, out)
    np.savez_compressed(FIXTURE, **out)
    print(f"wrote {FIXTURE}: {len(cases)} cases")


if __name__ == "__main__":
    main()
