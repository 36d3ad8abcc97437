"""Independent devkit-protocol rewrite, fuzz-diffed against eval_class.

``utils/eval.py`` and its C++ twin were written together, so a shared
transcription bug would survive their mutual fuzz test.  This file
re-implements the published KITTI devkit protocol (cleanData /
getThresholds / computeStatistics / AP smoothing) FROM SCRATCH in a
deliberately different style — per-object state machines, no shared
helpers — and diffs the full 41-point precision/AOS curves on randomized
scenes.  Overlap matrices are shared on purpose: rotated-IoU exactness
is covered by test_geometry; this test isolates the PROTOCOL.

[ref: second/utils/eval.py + KITTI devkit evaluate_object.cpp —
lineage-expected, UNVERIFIED (mount empty)]
"""
from __future__ import annotations

import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.utils import eval as ev


NO_DET = -10000000.0


def _clean_ref(gt, dt, cls_name, difficulty):
    """Independent cleanData."""
    min_h = (40, 25, 25)[difficulty]
    max_occ = (0, 1, 2)[difficulty]
    max_tr = (0.15, 0.3, 0.5)[difficulty]
    similar = {"car": ["van"], "pedestrian": ["person_sitting"]}.get(
        cls_name.lower(), [])

    ig_gt, n_valid, dc = [], 0, []
    for i, nm in enumerate(gt["name"]):
        nm_l = nm.lower()
        h = gt["bbox"][i, 3] - gt["bbox"][i, 1]
        too_hard = (gt["occluded"][i] > max_occ
                    or gt["truncated"][i] > max_tr or h <= min_h)
        if nm_l == cls_name.lower():
            ig_gt.append(1 if too_hard else 0)
            if not too_hard:
                n_valid += 1
        elif nm_l in similar:
            ig_gt.append(1)
        else:
            ig_gt.append(-1)
        if nm == "DontCare":
            dc.append(gt["bbox"][i])
    ig_dt = []
    for i, nm in enumerate(dt["name"]):
        h = abs(dt["bbox"][i, 3] - dt["bbox"][i, 1])
        if h < min_h:
            ig_dt.append(1)
        elif nm.lower() == cls_name.lower():
            ig_dt.append(0)
        else:
            ig_dt.append(-1)
    return ig_gt, ig_dt, np.asarray(dc).reshape(-1, 4), n_valid


def _stats_ref(ov, ig_gt, ig_dt, scores, dt_bbox, dc, gt_alpha, dt_alpha,
               min_overlap, thresh, compute_fp, compute_aos):
    """Independent computeStatistics for one image.

    ov: [D, G] overlaps. Returns (tp, fp, fn, sim, tp_scores)."""
    D = len(scores)
    below = [compute_fp and scores[j] < thresh for j in range(D)]
    used = [False] * D
    tp = fp = fn = 0
    deltas, tps = [], []
    for i in range(len(ig_gt)):
        if ig_gt[i] == -1:
            continue
        best, best_kind, best_key = -1, None, None
        for j in range(D):
            if ig_dt[j] == -1 or used[j] or below[j]:
                continue
            if ov[j, i] <= min_overlap:
                continue
            if not compute_fp:
                # pass 1: highest-score match wins
                if best == -1 or scores[j] > best_key:
                    best, best_key = j, scores[j]
                continue
            if ig_dt[j] == 0:
                # a countable det always beats an ignored one; among
                # countable ones the largest overlap wins
                if (best_kind != "valid") or ov[j, i] > best_key:
                    best, best_kind, best_key = j, "valid", ov[j, i]
            elif ig_dt[j] == 1 and best == -1:
                best, best_kind, best_key = j, "ignored", None
        if best == -1:
            if ig_gt[i] == 0:
                fn += 1
        elif ig_gt[i] == 1 or ig_dt[best] == 1:
            used[best] = True
        else:
            tp += 1
            tps.append(scores[best])
            deltas.append(gt_alpha[i] - dt_alpha[best])
            used[best] = True
    if compute_fp:
        for j in range(D):
            if not (used[j] or ig_dt[j] != 0 or below[j]):
                fp += 1
        stuff = 0
        for k in range(len(dc)):
            for j in range(D):
                if used[j] or ig_dt[j] != 0 or below[j]:
                    continue
                b, c = dt_bbox[j], dc[k]
                iw = min(b[2], c[2]) - max(b[0], c[0])
                ih = min(b[3], c[3]) - max(b[1], c[1])
                inter = max(iw, 0.0) * max(ih, 0.0)
                area = (b[2] - b[0]) * (b[3] - b[1])
                if inter / max(area, 1e-12) > min_overlap:
                    used[j] = True
                    stuff += 1
        fp -= stuff
    sim = 0.0
    if compute_aos and (tp > 0 or fp > 0):
        sim = float(sum(0.5 * (1.0 + np.cos(d)) for d in deltas))
    return tp, fp, fn, sim, tps


def _thresholds_ref(tp_scores, n_gt, pts=41):
    """Independent getThresholds."""
    out, cur = [], 0.0
    s = sorted(tp_scores, reverse=True)
    for i, sc in enumerate(s):
        left = (i + 1) / n_gt
        right = (i + 2) / n_gt if i + 1 < len(s) else left
        if (right - cur) < (cur - left) and i + 1 < len(s):
            continue
        out.append(sc)
        cur += 1.0 / (pts - 1.0)
    return out


def _eval_class_ref(gt_annos, dt_annos, overlaps, cls_name, difficulty,
                    min_overlap, compute_aos, pts=41):
    """Independent eval_class: full two-pass protocol -> curves + APs."""
    cleaned = [_clean_ref(g, d, cls_name, difficulty)
               for g, d in zip(gt_annos, dt_annos)]
    n_gt = sum(c[3] for c in cleaned)
    all_tp = []
    for (ig_g, ig_d, dc, _), ov, g, d in zip(cleaned, overlaps, gt_annos,
                                             dt_annos):
        sc = np.asarray(d["score"], np.float32)
        all_tp += _stats_ref(ov, ig_g, ig_d, sc, d["bbox"], dc,
                             g["alpha"], d["alpha"], min_overlap, 0.0,
                             compute_fp=False, compute_aos=False)[4]
    if n_gt == 0 or not all_tp:
        return {"precision": np.zeros(pts), "aos": np.zeros(pts),
                "ap": 0.0, "ap_R40": 0.0, "num_valid_gt": n_gt,
                "thresholds": np.zeros(0, np.float32)}
    thr = _thresholds_ref(np.asarray(all_tp, np.float32), n_gt, pts)
    prec = np.zeros(pts)
    aos = np.zeros(pts)
    for t, th in enumerate(thr):
        TP = FP = 0
        S = 0.0
        for (ig_g, ig_d, dc, _), ov, g, d in zip(cleaned, overlaps,
                                                 gt_annos, dt_annos):
            sc = np.asarray(d["score"], np.float32)
            r = _stats_ref(ov, ig_g, ig_d, sc, d["bbox"], dc, g["alpha"],
                           d["alpha"], min_overlap, th, compute_fp=True,
                           compute_aos=compute_aos)
            TP += r[0]
            FP += r[1]
            S += r[3]
        prec[t] = TP / max(TP + FP, 1)
        aos[t] = S / max(TP + FP, 1)
    for i in range(pts):
        prec[i] = prec[i:].max()
        aos[i] = aos[i:].max()
    return {"precision": prec, "aos": aos,
            "ap": float(prec[::4].sum() / 11 * 100),
            "ap_R40": float(prec[1:].sum() / 40 * 100),
            "num_valid_gt": n_gt,
            "thresholds": np.asarray(thr, np.float32)}


def _random_annos(rng, n_scenes=12):
    """Random KITTI-style scenes exercising every protocol branch:
    similar classes, DontCare, all difficulty gates, score ties."""
    names = ["Car", "Van", "Pedestrian", "Person_sitting", "Cyclist",
             "DontCare", "Truck"]
    gt_annos, dt_annos = [], []
    for _ in range(n_scenes):
        G = int(rng.integers(0, 9))
        D = int(rng.integers(0, 12))
        # clustered locations so overlaps actually happen
        centers = rng.uniform(-6, 6, (max(G, 1), 3)) * [1, 0.2, 1] \
            + [0, 1.2, 18]
        y0 = rng.uniform(80, 220, G)
        h = rng.choice([18.0, 26.0, 45.0, 70.0], G)  # straddle gates
        gt = {
            "name": np.asarray(rng.choice(names, G)),
            "bbox": np.stack([np.full(G, 300.0), y0,
                              np.full(G, 380.0), y0 + h], 1)
            if G else np.zeros((0, 4)),
            "occluded": rng.integers(0, 4, G),
            "truncated": rng.choice([0.0, 0.1, 0.2, 0.4, 0.6], G),
            "alpha": rng.uniform(-np.pi, np.pi, G),
            "location": centers[:G],
            "dimensions": rng.uniform(0.5, 4.5, (G, 3)),
            "rotation_y": rng.uniform(-np.pi, np.pi, G),
        }
        base = centers[rng.integers(0, max(G, 1), D)] \
            + rng.normal(0, 1.2, (D, 3)) if D else np.zeros((0, 3))
        yd0 = rng.uniform(80, 220, D)
        hd = rng.choice([18.0, 26.0, 45.0, 70.0], D)
        dt = {
            "name": np.asarray(rng.choice(["Car", "Pedestrian", "Cyclist"],
                                          D)),
            "bbox": np.stack([np.full(D, 300.0), yd0,
                              np.full(D, 380.0), yd0 + hd], 1)
            if D else np.zeros((0, 4)),
            "alpha": rng.uniform(-np.pi, np.pi, D),
            "location": base,
            "dimensions": rng.uniform(0.5, 4.5, (D, 3)),
            "rotation_y": rng.uniform(-np.pi, np.pi, D),
            # quantized scores force threshold ties
            "score": np.round(rng.uniform(0, 1, D), 2).astype(np.float32),
        }
        gt_annos.append(gt)
        dt_annos.append(dt)
    return gt_annos, dt_annos


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("metric", [0, 1, 2])
def test_protocol_matches_independent_rewrite(seed, metric):
    rng = np.random.default_rng(1234 + seed)
    gt_annos, dt_annos = _random_annos(rng)
    overlaps = [
        ev._overlap_matrix(g, d, metric)
        if len(g["name"]) and len(d["name"])
        else np.zeros((len(d["name"]), len(g["name"])), np.float32)
        for g, d in zip(gt_annos, dt_annos)]
    ov32 = [np.ascontiguousarray(o, np.float32) for o in overlaps]

    for cls_name in ("Car", "Pedestrian"):
        for diff in range(3):
            min_ov = ev.OVERLAPS[cls_name][metric]
            compute_aos = metric == 0
            got = ev.eval_class(gt_annos, dt_annos, cls_name, diff,
                                metric, min_ov, compute_aos=compute_aos,
                                overlaps=overlaps)
            want = _eval_class_ref(gt_annos, dt_annos, ov32, cls_name,
                                   diff, min_ov, compute_aos=compute_aos)
            tag = f"{cls_name}/d{diff}/m{metric}/s{seed}"
            assert got["num_valid_gt"] == want["num_valid_gt"], tag
            np.testing.assert_array_equal(
                got["thresholds"], want["thresholds"], err_msg=tag)
            np.testing.assert_allclose(
                got["precision"], want["precision"], atol=1e-6,
                err_msg=tag)
            assert got["ap"] == pytest.approx(want["ap"], abs=1e-4), tag
            assert got["ap_R40"] == pytest.approx(want["ap_R40"],
                                                  abs=1e-4), tag
            if compute_aos:
                np.testing.assert_allclose(
                    got["aos"], want["aos"], atol=1e-6, err_msg=tag)


def test_protocol_matches_python_twin_without_native(monkeypatch):
    """Same diff with the native kernel disabled (python-twin path)."""
    from automatic_as_built_reconstruction_tpu import native
    monkeypatch.setattr(native, "AVAILABLE", False)
    rng = np.random.default_rng(99)
    gt_annos, dt_annos = _random_annos(rng, n_scenes=6)
    overlaps = [
        ev._overlap_matrix(g, d, 1)
        if len(g["name"]) and len(d["name"])
        else np.zeros((len(d["name"]), len(g["name"])), np.float32)
        for g, d in zip(gt_annos, dt_annos)]
    got = ev.eval_class(gt_annos, dt_annos, "Car", 1, 1, 0.7,
                        overlaps=overlaps)
    want = _eval_class_ref(
        gt_annos, dt_annos,
        [np.ascontiguousarray(o, np.float32) for o in overlaps],
        "Car", 1, 0.7, compute_aos=False)
    np.testing.assert_allclose(got["precision"], want["precision"],
                               atol=1e-6)
    assert got["ap"] == pytest.approx(want["ap"], abs=1e-4)
