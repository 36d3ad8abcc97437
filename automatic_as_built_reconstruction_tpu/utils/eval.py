"""Detection mAP evaluation.

Two harnesses:

- :func:`evaluate_lidar_ap` — generic rotated-box AP in the lidar frame
  (BEV + 3D), 41-point interpolation.  Used by the building-scan dataset.
- :func:`get_official_eval_result` — the KITTI protocol: per-class IoU
  thresholds, easy/moderate/hard difficulty gating (image-bbox height,
  occlusion, truncation), ignored/DontCare handling, 41-point AP.
  [ref: second/utils/eval.py — lineage-expected, UNVERIFIED; semantics
  follow the published KITTI devkit.]

Host NumPy throughout (eval is not a hot path); rotated overlaps use the
exact polygon-clip oracle from ``core.geometry``.
"""
from __future__ import annotations

import io
from typing import Dict, List, Sequence

import numpy as np

from ..core import box_ops, geometry


# ---------------------------------------------------------------------------
# shared: greedy matching + AP
# ---------------------------------------------------------------------------


def _ap_interp(recalls: np.ndarray, precisions: np.ndarray,
               num_points: int = 41) -> float:
    """N-point interpolated AP (KITTI uses 41; older protocol 11)."""
    ap = 0.0
    for t in np.linspace(0, 1, num_points):
        mask = recalls >= t
        p = float(precisions[mask].max()) if mask.any() else 0.0
        ap += p / num_points
    return ap


def _match_class(gt_list, det_list, overlap_fn, iou_threshold):
    """Greedy per-scene matching.

    gt_list/det_list: per-scene arrays ([G,7], ([D,7], [D] scores)).
    Returns (scores sorted desc, tp flags, num_gt).
    """
    all_scores, all_tp = [], []
    num_gt = sum(len(g) for g in gt_list)
    for gts, (dets, scores) in zip(gt_list, det_list):
        if len(dets) == 0:
            continue
        order = np.argsort(-scores)
        dets, scores = dets[order], scores[order]
        if len(gts) == 0:
            all_scores.append(scores)
            all_tp.append(np.zeros(len(dets), bool))
            continue
        iou = overlap_fn(dets, gts)  # [D, G]
        taken = np.zeros(len(gts), bool)
        tp = np.zeros(len(dets), bool)
        for d in range(len(dets)):
            g = int(np.argmax(np.where(taken, -1.0, iou[d])))
            if iou[d, g] >= iou_threshold and not taken[g]:
                taken[g] = True
                tp[d] = True
        all_scores.append(scores)
        all_tp.append(tp)
    if not all_scores:
        return np.zeros(0), np.zeros(0, bool), num_gt
    scores = np.concatenate(all_scores)
    tp = np.concatenate(all_tp)
    order = np.argsort(-scores)
    return scores[order], tp[order], num_gt


def _pr_ap(tp_sorted: np.ndarray, num_gt: int, num_points=41) -> float:
    if num_gt == 0 or len(tp_sorted) == 0:
        return 0.0
    tp_cum = np.cumsum(tp_sorted)
    fp_cum = np.cumsum(~tp_sorted)
    recalls = tp_cum / num_gt
    precisions = tp_cum / np.maximum(tp_cum + fp_cum, 1)
    return _ap_interp(recalls, precisions, num_points)


# ---------------------------------------------------------------------------
# generic lidar-frame AP (building scans)
# ---------------------------------------------------------------------------


def _bev_overlap(dets, gts):
    return geometry.rotate_iou_matrix(
        dets[:, [0, 1, 3, 4, 6]], gts[:, [0, 1, 3, 4, 6]])


def _3d_overlap(dets, gts):
    return geometry.d3_box_overlap(dets, gts)


def evaluate_lidar_ap(gt_annos: List[dict], detections: List[dict],
                      class_names: Sequence[str],
                      iou_thresholds: Dict[str, float],
                      num_points: int = 41) -> dict:
    """AP per class, BEV + 3D, in the lidar frame.

    gt_annos[i]: {"boxes": [G,7], "names": [G] str}.
    detections[i]: {"box3d_lidar": [D,7], "scores": [D],
                    "label_preds": [D] int 0-based}.
    """
    results = {}
    for ci, cname in enumerate(class_names):
        thr = iou_thresholds.get(cname, 0.5)
        gt_list, det_list = [], []
        for gt, det in zip(gt_annos, detections):
            gmask = np.asarray(gt["names"]) == cname
            gt_list.append(np.asarray(gt["boxes"], np.float64)[gmask])
            dmask = np.asarray(det["label_preds"]) == ci
            det_list.append((
                np.asarray(det["box3d_lidar"], np.float64)[dmask],
                np.asarray(det["scores"], np.float64)[dmask]))
        for metric, fn in (("bev", _bev_overlap), ("3d", _3d_overlap)):
            scores, tp, num_gt = _match_class(gt_list, det_list, fn, thr)
            results[f"{cname}.{metric}.ap"] = _pr_ap(tp, num_gt, num_points)
            results[f"{cname}.{metric}.num_gt"] = num_gt
    aps_bev = [results[f"{c}.bev.ap"] for c in class_names]
    aps_3d = [results[f"{c}.3d.ap"] for c in class_names]
    results["mAP.bev"] = float(np.mean(aps_bev))
    results["mAP.3d"] = float(np.mean(aps_3d))
    return results


# ---------------------------------------------------------------------------
# KITTI official protocol
# ---------------------------------------------------------------------------

# difficulty gates: [min bbox height px, max occlusion, max truncation]
MIN_HEIGHT = (40, 25, 25)
MAX_OCCLUSION = (0, 1, 2)
MAX_TRUNCATION = (0.15, 0.3, 0.5)
DIFFICULTY_NAMES = ("easy", "moderate", "hard")

# class -> (bbox/bev/3d) min overlaps, moderate protocol
OVERLAPS = {
    "Car": (0.7, 0.7, 0.7),
    "Pedestrian": (0.5, 0.5, 0.5),
    "Cyclist": (0.5, 0.5, 0.5),
    "Van": (0.7, 0.7, 0.7),
    "Truck": (0.7, 0.7, 0.7),
}
SIMILAR = {"Car": ("Van",), "Pedestrian": ("Person_sitting",)}


def kitti_difficulty(anno: dict) -> np.ndarray:
    """Per-object difficulty (0/1/2; -1 = harder than 'hard')."""
    heights = anno["bbox"][:, 3] - anno["bbox"][:, 1]
    occ = anno["occluded"]
    trunc = anno["truncated"]
    n = len(heights)
    diff = np.full(n, -1, np.int32)
    for d in (2, 1, 0):
        ok = ((heights >= MIN_HEIGHT[d]) & (occ <= MAX_OCCLUSION[d])
              & (trunc <= MAX_TRUNCATION[d]))
        diff[ok] = d
    return diff


def _clean_kitti(gt_anno, dt_anno, cls_name, difficulty):
    """KITTI cleaning: per-object care/ignore flags + DontCare boxes."""
    gt_care, gt_ignore = [], []
    heights = gt_anno["bbox"][:, 3] - gt_anno["bbox"][:, 1]
    for i, name in enumerate(gt_anno["name"]):
        ignorable = (heights[i] < MIN_HEIGHT[difficulty]
                     or gt_anno["occluded"][i] > MAX_OCCLUSION[difficulty]
                     or gt_anno["truncated"][i] > MAX_TRUNCATION[difficulty])
        if name == cls_name:
            if ignorable:
                gt_care.append(False)
                gt_ignore.append(True)
            else:
                gt_care.append(True)
                gt_ignore.append(False)
        elif name in SIMILAR.get(cls_name, ()):
            gt_care.append(False)
            gt_ignore.append(True)
        else:
            gt_care.append(False)
            gt_ignore.append(False)
    dc_bboxes = gt_anno["bbox"][gt_anno["name"] == "DontCare"]

    dt_care, dt_ignore_height = [], []
    dt_heights = dt_anno["bbox"][:, 3] - dt_anno["bbox"][:, 1]
    for i, name in enumerate(dt_anno["name"]):
        if name != cls_name:
            dt_care.append(False)
            dt_ignore_height.append(False)
        elif dt_heights[i] < MIN_HEIGHT[difficulty]:
            # too small for this difficulty: ignored, not FP
            dt_care.append(False)
            dt_ignore_height.append(True)
        else:
            dt_care.append(True)
            dt_ignore_height.append(False)
    return (np.asarray(gt_care, bool), np.asarray(gt_ignore, bool),
            np.asarray(dt_care, bool), np.asarray(dt_ignore_height, bool),
            dc_bboxes)


def _overlap_matrix(gt_anno, dt_anno, metric: int) -> np.ndarray:
    """[D, G] overlaps for metric 0=bbox(2D image) 1=bev 2=3d (camera)."""
    if metric == 0:
        return box_ops.iou_2d(dt_anno["bbox"], gt_anno["bbox"])
    # camera frame: x right, y down, z forward; BEV plane is (x, z).
    # 'dimensions' are stored (l, h, w) — l along the box z axis.
    def to_bev(a):
        return np.stack([a["location"][:, 0], a["location"][:, 2],
                         a["dimensions"][:, 2], a["dimensions"][:, 0],
                         -a["rotation_y"]], axis=1)

    bev_d, bev_g = to_bev(dt_anno), to_bev(gt_anno)
    if metric == 1:
        return geometry.rotate_iou_matrix(bev_d, bev_g)
    # 3d: add y-extent (camera y grows downward; box spans [y-h, y])
    inter2d = np.zeros((len(bev_d), len(bev_g)), np.float32)
    for i in range(len(bev_d)):
        for j in range(len(bev_g)):
            inter2d[i, j] = geometry.rotated_box_intersection_area(
                bev_d[i], bev_g[j])
    yd1 = dt_anno["location"][:, 1]
    yd0 = yd1 - dt_anno["dimensions"][:, 1]
    yg1 = gt_anno["location"][:, 1]
    yg0 = yg1 - gt_anno["dimensions"][:, 1]
    hi = (np.minimum(yd1[:, None], yg1[None, :])
          - np.maximum(yd0[:, None], yg0[None, :]))
    inter3d = inter2d * np.clip(hi, 0, None)
    vol_d = np.prod(dt_anno["dimensions"], axis=1)
    vol_g = np.prod(gt_anno["dimensions"], axis=1)
    union = vol_d[:, None] + vol_g[None, :] - inter3d
    return np.where(union > 0, inter3d / np.maximum(union, 1e-12), 0.0)


def eval_class(gt_annos: List[dict], dt_annos: List[dict], cls_name: str,
               difficulty: int, metric: int, min_overlap: float,
               num_points: int = 41):
    """One (class, difficulty, metric) AP following the KITTI devkit."""
    all_scores, all_tp = [], []
    num_valid_gt = 0
    for gt, dt in zip(gt_annos, dt_annos):
        gt_care, gt_ignore, dt_care, dt_ign_h, dc = _clean_kitti(
            gt, dt, cls_name, difficulty)
        num_valid_gt += int(gt_care.sum())
        if len(dt["name"]) == 0:
            continue
        overlaps = _overlap_matrix(gt, dt, metric) if len(gt["name"]) else (
            np.zeros((len(dt["name"]), 0)))
        scores = dt["score"]
        order = np.argsort(-scores)
        assigned = np.zeros(len(gt["name"]), bool)
        det_tp = []
        det_scores = []
        for d in order:
            if not dt_care[d] and not dt_ign_h[d]:
                continue  # other class: plays no role for this class
            # best remaining gt among care/ignore gts of this class
            best_g, best_ov = -1, min_overlap
            for g in range(len(gt["name"])):
                if assigned[g] or not (gt_care[g] or gt_ignore[g]):
                    continue
                if overlaps[d, g] >= best_ov:
                    # prefer cared gts (devkit tie-break approximated by
                    # taking max overlap; ignored gts absorb without TP)
                    if best_g == -1 or overlaps[d, g] > best_ov:
                        best_g, best_ov = g, overlaps[d, g]
            if best_g >= 0:
                assigned[best_g] = True
                if gt_care[best_g] and dt_care[d]:
                    det_tp.append(True)
                    det_scores.append(scores[d])
                # matches to ignored gt or by ignored det: neither TP nor FP
            else:
                if dt_care[d]:
                    # unmatched: FP unless inside a DontCare region (2D only)
                    is_dc = False
                    if metric == 0 and len(dc):
                        dco = box_ops.iou_2d(dt["bbox"][d : d + 1], dc,
                                             add1=False)
                        # devkit: overlap w.r.t. detection area
                        bb = dt["bbox"][d]
                        area = max((bb[2] - bb[0]) * (bb[3] - bb[1]), 1e-6)
                        inter = dco * 0  # recompute inter over det area
                        for k in range(len(dc)):
                            iw = (min(bb[2], dc[k][2]) - max(bb[0], dc[k][0]))
                            ih = (min(bb[3], dc[k][3]) - max(bb[1], dc[k][1]))
                            if iw > 0 and ih > 0 and iw * ih / area > min_overlap:
                                is_dc = True
                    if not is_dc:
                        det_tp.append(False)
                        det_scores.append(scores[d])
        if det_scores:
            all_scores.append(np.asarray(det_scores))
            all_tp.append(np.asarray(det_tp, bool))
    if not all_scores:
        return 0.0, num_valid_gt
    scores = np.concatenate(all_scores)
    tp = np.concatenate(all_tp)
    order = np.argsort(-scores)
    return _pr_ap(tp[order], num_valid_gt, num_points), num_valid_gt


def get_official_eval_result(gt_annos: List[dict], dt_annos: List[dict],
                             current_classes, num_points: int = 41) -> dict:
    """KITTI AP table: classes x (bbox, bev, 3d) x (easy, mod, hard)."""
    if isinstance(current_classes, str):
        current_classes = [current_classes]
    results = {}
    buf = io.StringIO()
    for cls_name in current_classes:
        ov = OVERLAPS.get(cls_name, (0.5, 0.5, 0.5))
        buf.write(f"{cls_name} AP@{ov[0]:.2f}, {ov[1]:.2f}, {ov[2]:.2f}:\n")
        for metric, mname in ((0, "bbox"), (1, "bev"), (2, "3d")):
            aps = []
            for diff in range(3):
                ap, _ = eval_class(gt_annos, dt_annos, cls_name, diff,
                                   metric, ov[metric], num_points)
                aps.append(ap * 100)
                results[f"{cls_name}.{mname}.{DIFFICULTY_NAMES[diff]}"] = (
                    ap * 100)
            buf.write(f"{mname} AP: {aps[0]:.2f}, {aps[1]:.2f}, "
                      f"{aps[2]:.2f}\n")
    results["result_str"] = buf.getvalue()
    return results
