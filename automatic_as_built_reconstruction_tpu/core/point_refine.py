"""Point-evidence pose refinement for thin-element detections.

As-built elements (door leaves, thin partition walls) are nearly planar:
essentially all of a detection's supporting points lie on the element
plane.  A detection with the right centre but wrong yaw — the ±pi/2
duplicate that rotation anchors produce, or the ±15 deg regression noise
that alone drops a 0.06 x 0.9 m box below the 0.25 rotated-IoU gate —
contains only a sliver of those points.  Re-scoring a small yaw grid by
points-inside-count therefore recovers the true orientation at predict
time, with no retraining, from evidence the score head cannot see.

This is a host-side post-NMS step (detections are few), deliberately
outside the jit program.  [ref: SURVEY.md §2.9 building eval; the
upstream lineage ranks by classification score alone and has no
point-evidence refinement.]
"""
from __future__ import annotations

from typing import Sequence

import numpy as np

from .box_ops import points_in_rbbox

# length-trim guard: largest relative length change the point evidence
# may commit; the measuring slab (and the local crop) extend 2x past it
TRIM_MAX_REL = 0.35


def _crop(points: np.ndarray, box: np.ndarray, pad: float) -> np.ndarray:
    """Points within an axis-aligned BEV disc + z slab around ``box``."""
    r = 0.5 * float(np.hypot(box[3], box[4])) + pad
    d2 = (points[:, 0] - box[0]) ** 2 + (points[:, 1] - box[1]) ** 2
    m = (d2 <= r * r) & (points[:, 2] >= box[2] - pad) \
        & (points[:, 2] <= box[2] + box[5] + pad)
    return points[m]


def _yaw_grid_count(local, box, deltas, thickness):
    """Points-inside count for each yaw hypothesis ``box.yaw + delta``."""
    hyp = np.tile(box, (len(deltas), 1))
    hyp[:, 3] = max(box[3], thickness)
    hyp[:, 6] = box[6] + deltas
    return points_in_rbbox(local, hyp).sum(axis=0)


def _best_delta(deltas, counts):
    """Index of the middle of the max-count plateau.

    An inflated slab captures the full plane over a range of yaws, so
    the count maximum is a plateau centred on the true orientation; a
    bare argmax would return its edge.  Only the contiguous plateau
    around the argmax counts (a symmetric far lobe must not drag the
    midpoint off both)."""
    am = int(np.argmax(counts))
    lo = am
    while lo > 0 and counts[lo - 1] == counts[am]:
        lo -= 1
    hi = am
    while hi + 1 < len(counts) and counts[hi + 1] == counts[am]:
        hi += 1
    return (lo + hi) // 2


def _slab_recenter(local, box, thickness, min_points):
    """Shift the BEV centre along the thin axis onto the supporting
    plane (mean inside-point lateral offset)."""
    slab = box.copy()
    slab[3] = max(box[3], thickness)
    inside = local[points_in_rbbox(local, slab[None])[:, 0]]
    if len(inside) < min_points:
        return box
    nx, ny = np.cos(box[6]), np.sin(box[6])
    off = ((inside[:, 0] - box[0]) * nx + (inside[:, 1] - box[1]) * ny)
    shift = float(np.clip(np.mean(off), -thickness, thickness))
    out = box.copy()
    out[0] += shift * nx
    out[1] += shift * ny
    return out


def _slab_length_trim(local, box, thickness, min_points, *,
                      margin: float = 0.06,
                      max_rel_change: float = TRIM_MAX_REL,
                      pctile: float = 1.5):
    """Trim the box length (and slide its centre along the element) to
    the supporting plane's measured extent.

    Wall detections inherit their length from anchor priors plus
    regression; the point evidence bounds the real span directly.  The
    extent is a percentile span (robust to stray clutter points), padded
    by ``margin`` on each end; a change beyond ``max_rel_change`` of the
    current length is rejected as evidence/detection mismatch (e.g. two
    collinear walls sharing one slab under heavy occlusion)."""
    slab = box.copy()
    slab[3] = max(box[3], thickness)
    # inflate the measuring slab WELL past the current endpoints (2x the
    # accept threshold): evidence just outside the detection must be
    # visible to recover a slid/short box
    slab[4] = box[4] * (1 + 2 * max_rel_change) + 2 * margin
    inside = local[points_in_rbbox(local, slab[None])[:, 0]]
    if len(inside) < min_points:
        return box
    lx, ly = -np.sin(box[6]), np.cos(box[6])     # element (l-axis) dir
    t = (inside[:, 0] - box[0]) * lx + (inside[:, 1] - box[1]) * ly
    # Walls come in COLLINEAR runs separated by door openings: a global
    # percentile span would jump the opening onto the neighbouring
    # segment.  The opening usually holds a door LEAF (points in the
    # wall plane!), so plain occupancy cannot see it — but there is no
    # header above a door, so the opening's bins top out at the door
    # height while true wall bins reach the wall top.  A bin is
    # same-element iff occupied AND its max z reaches near the box top;
    # the kept run is the contiguous same-element stretch containing
    # the detection centre (ends at >= gap_bins consecutive non-wall
    # bins — a door is ~6 bins, point dropout never fails 2).
    bin_w, gap_bins = 0.15, 2
    half = slab[4] / 2
    nb = max(int(np.ceil(2 * half / bin_w)), 1)
    bins = np.clip(((t + half) / bin_w).astype(int), 0, nb - 1)
    occ_n = np.bincount(bins, minlength=nb)
    zmax = np.full(nb, -np.inf)
    np.maximum.at(zmax, bins, inside[:, 2])
    z_top = box[2] + box[5]
    occ = (occ_n > 0) & (zmax >= z_top - 0.35)
    c = min(int(half / bin_w), nb - 1)
    if not occ[c]:
        near = np.flatnonzero(occ)
        if near.size == 0:
            return box
        c = int(near[np.argmin(np.abs(near - c))])
    lo_b, lo_gap = c, False
    empty = 0
    for b in range(c - 1, -1, -1):
        empty = 0 if occ[b] else empty + 1
        if empty >= gap_bins:
            lo_gap = True
            break
        if occ[b]:
            lo_b = b
    hi_b, hi_gap = c, False
    empty = 0
    for b in range(c + 1, nb):
        empty = 0 if occ[b] else empty + 1
        if empty >= gap_bins:
            hi_gap = True
            break
        if occ[b]:
            hi_b = b
    run = (t >= lo_b * bin_w - half) & (t < (hi_b + 1) * bin_w - half)
    if run.sum() < min_points:
        return box
    tr = t[run]
    # Each endpoint moves INDEPENDENTLY, and only when its run end is
    # evidenced by a real gap (door jamb / free end).  An end that ran
    # into the slab clip has no evidence there — a seamless collinear
    # continuation (wall segments are an annotation convention, not a
    # physical boundary) — so that endpoint stays where the detector
    # put it.
    old_lo, old_hi = -box[4] / 2, box[4] / 2
    ev_lo = float(np.percentile(tr, pctile)) - margin
    ev_hi = float(np.percentile(tr, 100.0 - pctile)) + margin
    if lo_gap and hi_gap:            # both ends evidenced: full trim
        new_lo, new_hi = ev_lo, ev_hi
    elif lo_gap:                     # one end: snap to it, keep length
        new_lo, new_hi = ev_lo, ev_lo + box[4]
    elif hi_gap:
        new_lo, new_hi = ev_hi - box[4], ev_hi
    else:                            # seamless both ways: no evidence
        return box
    lim = max_rel_change * max(box[4], 1e-6)
    if abs(new_lo - old_lo) > lim or abs(new_hi - old_hi) > lim \
            or new_hi - new_lo < 2 * margin:
        return box
    out = box.copy()
    out[4] = new_hi - new_lo
    mid = 0.5 * (new_lo + new_hi)
    out[0] += mid * lx
    out[1] += mid * ly
    return out


def refine_yaw_by_points(
        points: np.ndarray,
        boxes: np.ndarray,
        labels: np.ndarray,
        *,
        classes: Sequence[int] = (2,),
        yaw_halfrange: float = np.pi / 2,
        yaw_step_deg: float = 3.0,
        search_thickness: float = 0.30,
        min_thickness: float = 0.12,
        min_points: int = 8,
        keep_margin: float = 1.05,
        recenter: bool = False,
        trim_length: bool = False) -> np.ndarray:
    """Snap thin boxes' yaw to the orientation that captures most points.

    Three alternating passes per detection whose label is in ``classes``
    (center-offset noise biases a single tight-slab yaw search, so the
    coarse pass uses a wide slab that is insensitive to it):

    1. coarse yaw grid over ``[-yaw_halfrange, yaw_halfrange)`` (boxes
       are pi-symmetric, so a half-turn covers every orientation) with
       the thin axis inflated to ``search_thickness``;
    2. re-centre along the coarse normal onto the supporting plane;
    3. fine yaw grid (±4 coarse steps at 1/4 resolution) at
       ``min_thickness`` — the tight slab that actually discriminates
       the last few degrees.

    The refined pose is committed only when its tight-slab support beats
    the original pose's by more than ``keep_margin`` x (churn guard) and
    has at least ``min_points`` inside.  Without ``recenter`` the yaw
    commit never moves the centre; ``trim_length`` may additionally
    move the centre ALONG the element (endpoint snapping) and change
    the length, independent of the yaw commit.  Returns a refined copy
    of ``boxes`` ([N, 7] x/y/z/w/l/h/yaw, z = bottom).
    """
    boxes = np.array(boxes, np.float64, copy=True)
    labels = np.asarray(labels)
    if boxes.size == 0 or points.size == 0:
        return boxes
    pts = np.asarray(points, np.float64)[:, :3]
    cls = set(int(c) for c in classes)
    step = np.deg2rad(yaw_step_deg)
    coarse = np.arange(-yaw_halfrange, yaw_halfrange, step)
    fine = np.arange(-4 * step, 4 * step + 1e-9, step / 4)
    for i in range(len(boxes)):
        if int(labels[i]) not in cls:
            continue
        box = boxes[i]
        # the trim slab reaches up to TRIM_MAX_REL of the length past
        # each endpoint — the crop disc must cover it or the clipped
        # evidence reads as a small span and defeats the change guard
        pad = 0.25 + (TRIM_MAX_REL * box[4] + 0.12 if trim_length
                      else 0.0)
        local = _crop(pts, box, pad=pad)
        if len(local) < min_points:
            continue
        # original-pose support at the tight slab — the bar to beat
        orig_count = _yaw_grid_count(local, box, np.zeros(1),
                                     min_thickness)[0]
        # pass 1: coarse, wide slab
        cand = box.copy()
        counts = _yaw_grid_count(local, cand, coarse, search_thickness)
        cand[6] = box[6] + coarse[_best_delta(coarse, counts)]
        # pass 2: onto the plane
        cand = _slab_recenter(local, cand, search_thickness, min_points)
        # pass 3: fine, tight slab
        counts = _yaw_grid_count(local, cand, fine, min_thickness)
        best = _best_delta(fine, counts)
        cand[6] += fine[best]
        committed = not (counts[best] < min_points
                         or counts[best] <= keep_margin
                         * max(orig_count, 1))
        if committed:
            boxes[i, 6] = cand[6]
            if recenter:
                cand = _slab_recenter(local, cand, min_thickness,
                                      min_points)
                boxes[i, 0] = cand[0]
                boxes[i, 1] = cand[1]
            else:
                # contract: without recenter only the yaw is committed —
                # drop the pass-2 wide-slab recenter from the candidate
                # so a subsequent trim write-back can't smuggle it in
                cand = box.copy()
                cand[6] = boxes[i, 6]
        else:
            # yaw stays — but the length evidence below is still valid
            # for the original pose (a wall with correct yaw and wrong
            # regressed length must not be skipped by the yaw guard)
            cand = box.copy()
        if trim_length:
            cand = _slab_length_trim(local, cand, min_thickness,
                                     min_points)
            boxes[i, 0] = cand[0]
            boxes[i, 1] = cand[1]
            boxes[i, 4] = cand[4]
    return boxes


def refine_detections(det: dict, points: np.ndarray, *,
                      classes: Sequence[int] = (2,),
                      **kw) -> dict:
    """Apply :func:`refine_yaw_by_points` to one detection dict
    (``box3d_lidar`` / ``scores`` / ``label_preds``), returning a copy."""
    out = dict(det)
    out["box3d_lidar"] = refine_yaw_by_points(
        points, det["box3d_lidar"], det["label_preds"],
        classes=classes, **kw)
    return out
