"""Indoor as-built building scans: synthetic generator + dataset adapter.

The reference adds building-element detection (wall / column / door, rotated
boxes) on indoor scans to the SECOND lineage [ref: BASELINE.json config 4;
SURVEY.md §2.9 — LOW certainty, reference mount empty].  This module
provides:

- :func:`generate_building_scene` — procedural room layouts: perimeter +
  partition walls (thin elongated rotated boxes), columns, door leaves in
  wall openings; surface-sampled points with scanner noise, floor/ceiling
  points, clutter, and random occlusion dropout.
- :class:`BuildingDataset` — a registered ``Dataset`` that either reads
  scenes written by ``create_data`` (npz + info pkl) or synthesizes them
  deterministically from the sample index (zero-disk mode, used by tests
  and this container, which has no real scan data).
"""
from __future__ import annotations

import pathlib
import pickle
from typing import Dict, List, Optional

import numpy as np

from ..core import box_ops
from .dataset import Dataset, register_dataset

CLASSES = ("wall", "column", "door")

WALL_HEIGHT = (2.5, 3.2)
WALL_THICKNESS = (0.1, 0.3)
COLUMN_SIZE = (0.3, 0.7)
DOOR_WIDTH = (0.8, 1.1)
DOOR_HEIGHT = (1.9, 2.2)
DOOR_THICKNESS = (0.04, 0.08)
MAX_WALL_SEGMENT = 2.5


def _sample_box_surface(rng, box, density: float) -> np.ndarray:
    """Sample points on the 4 side faces + top of a box [7] (w,l,h)."""
    x, y, z, w, l, h, yaw = box
    faces = []
    # (u along length, v along height) for each of the two pairs of faces
    for sign in (-1, 1):
        n = max(int(l * h * density), 2)
        u = rng.uniform(-l / 2, l / 2, n)
        v = rng.uniform(0, h, n)
        faces.append(np.stack([np.full(n, sign * w / 2), u, v], axis=1))
        n = max(int(w * h * density), 2)
        u = rng.uniform(-w / 2, w / 2, n)
        v = rng.uniform(0, h, n)
        faces.append(np.stack([u, np.full(n, sign * l / 2), v], axis=1))
    n = max(int(w * l * density / 2), 1)
    faces.append(np.stack([rng.uniform(-w / 2, w / 2, n),
                           rng.uniform(-l / 2, l / 2, n),
                           np.full(n, h)], axis=1))
    local = np.concatenate(faces)
    # local frame: x along w, y along l, z up from bottom
    c, s = np.cos(yaw), np.sin(yaw)
    world = np.stack([
        local[:, 0] * c - local[:, 1] * s + x,
        local[:, 0] * s + local[:, 1] * c + y,
        local[:, 2] + z], axis=1)
    return world


def _wall_with_door(rng, p0, p1, thickness, height, door_prob=0.5):
    """Wall segment p0->p1; possibly split by a door opening.

    Returns (wall boxes, door boxes).  Boxes are [x,y,z,w,l,h,yaw] with the
    wall's *length* along the segment (l = segment length, w = thickness).
    """
    p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
    seg = p1 - p0
    length = float(np.hypot(*seg))
    yaw = float(np.arctan2(seg[1], seg[0]) + np.pi / 2)  # l-axis along seg
    walls, doors = [], []

    def wall_box(a, b):
        """Wall run a->b split into <= MAX_WALL_SEGMENT boxes (box
        detectors handle bounded extents far better than 10m+ walls; the
        reconstruction step can merge collinear segments)."""
        ln = float(np.hypot(*(b - a)))
        n_seg = max(int(np.ceil(ln / MAX_WALL_SEGMENT)), 1)
        out = []
        for si in range(n_seg):
            sa = a + (b - a) * (si / n_seg)
            sb = a + (b - a) * ((si + 1) / n_seg)
            mid = (sa + sb) / 2
            out.append([mid[0], mid[1], 0.0, thickness, ln / n_seg,
                        height, yaw])
        return out

    if length > 2.4 and rng.uniform() < door_prob:
        dw = rng.uniform(*DOOR_WIDTH)
        # door position along the segment, leaving >= 0.6 m of wall each side
        t = rng.uniform(0.6 / length, 1 - (0.6 + dw) / length)
        a = p0 + seg * t
        b = a + seg / length * dw
        walls.extend(wall_box(p0, a))
        walls.extend(wall_box(b, p1))
        dmid = (a + b) / 2
        dh = rng.uniform(*DOOR_HEIGHT)
        # door leaf sits in the opening (sometimes ajar)
        leaf_yaw = yaw + (rng.uniform(-np.pi / 3, np.pi / 3)
                          if rng.uniform() < 0.5 else 0.0)
        doors.append([dmid[0], dmid[1], 0.0,
                      rng.uniform(*DOOR_THICKNESS), dw, dh, leaf_yaw])
    else:
        walls.extend(wall_box(p0, p1))
    return walls, doors


def generate_building_scene(seed: int, *,
                            extent: float = 16.0,
                            density: float = 120.0,
                            clutter_ratio: float = 0.15,
                            dropout: float = 0.3,
                            layout_rotation: bool = True) -> dict:
    """One synthetic as-built scan.

    Returns dict(points [P,4] float32, gt_boxes [N,7], gt_names [N] str).
    Scene frame: x,y in [0, extent], floor at z=0.
    """
    rng = np.random.default_rng(seed)
    height = rng.uniform(*WALL_HEIGHT)
    rot = rng.uniform(0, np.pi / 2) if layout_rotation else 0.0

    # floor plan: outer rectangle + 1-3 partition walls
    margin = rng.uniform(1.0, 2.5)
    x0, y0 = margin, margin
    x1 = extent - margin
    y1 = extent - margin
    corners = [np.array([x0, y0]), np.array([x1, y0]),
               np.array([x1, y1]), np.array([x0, y1])]
    wall_boxes: List[list] = []
    door_boxes: List[list] = []
    for i in range(4):
        th = rng.uniform(*WALL_THICKNESS)
        w, d = _wall_with_door(rng, corners[i], corners[(i + 1) % 4], th,
                               height)
        wall_boxes += w
        door_boxes += d
    for _ in range(rng.integers(1, 4)):
        th = rng.uniform(*WALL_THICKNESS)
        if rng.uniform() < 0.5:
            xx = rng.uniform(x0 + 2, x1 - 2)
            w, d = _wall_with_door(rng, (xx, y0), (xx, y1), th, height,
                                   door_prob=0.8)
        else:
            yy = rng.uniform(y0 + 2, y1 - 2)
            w, d = _wall_with_door(rng, (x0, yy), (x1, yy), th, height,
                                   door_prob=0.8)
        wall_boxes += w
        door_boxes += d

    column_boxes = []
    for _ in range(rng.integers(0, 5)):
        cs = rng.uniform(*COLUMN_SIZE)
        column_boxes.append([rng.uniform(x0 + 1, x1 - 1),
                             rng.uniform(y0 + 1, y1 - 1),
                             0.0, cs, cs, height, rng.uniform(0, np.pi / 2)])

    boxes = np.array(wall_boxes + column_boxes + door_boxes, np.float32)
    names = np.array(["wall"] * len(wall_boxes)
                     + ["column"] * len(column_boxes)
                     + ["door"] * len(door_boxes))

    # rotate the whole layout about the scene center
    if rot != 0.0 and len(boxes):
        ctr = np.array([extent / 2, extent / 2, 0.0], np.float32)
        boxes[:, :3] = box_ops.rotation_points_single_angle(
            boxes[:, :3] - ctr, rot, axis=2) + ctr
        boxes[:, 6] += rot
    # building elements are pi-symmetric (yaw and yaw+pi describe the same
    # physical object): canonicalize to [-pi/2, pi/2) so regression targets
    # are well-defined
    if len(boxes):
        boxes[:, 6] = box_ops.limit_period(boxes[:, 6], 0.5, np.pi)

    pts = [_sample_box_surface(rng, b, density) for b in boxes]
    # floor + ceiling
    nf = int(extent * extent * density / 18)
    pts.append(np.stack([rng.uniform(0, extent, nf),
                         rng.uniform(0, extent, nf),
                         np.abs(rng.normal(0, 0.01, nf))], axis=1))
    pts.append(np.stack([rng.uniform(0, extent, nf // 2),
                         rng.uniform(0, extent, nf // 2),
                         height + rng.normal(0, 0.01, nf // 2)], axis=1))
    points = np.concatenate(pts)
    # clutter blobs (furniture-ish)
    n_clutter = int(len(points) * clutter_ratio)
    if n_clutter:
        centers = rng.uniform([x0, y0, 0], [x1, y1, 1.2], (8, 3))
        which = rng.integers(0, 8, n_clutter)
        points = np.concatenate([
            points, centers[which] + rng.normal(0, 0.3, (n_clutter, 3))])
    # scanner noise + occlusion dropout
    points += rng.normal(0, 0.008, points.shape)
    keep = rng.uniform(size=len(points)) > dropout * rng.uniform()
    points = points[keep]
    intensity = rng.uniform(0, 1, (len(points), 1))
    points = np.concatenate([points, intensity], axis=1).astype(np.float32)

    return {"points": points, "gt_boxes": boxes.reshape(-1, 7),
            "gt_names": names,
            "metadata": {"scene_id": seed, "extent": extent}}


@register_dataset
class BuildingDataset(Dataset):
    """As-built building-scan dataset (synthetic or from-disk).

    From-disk layout (written by ``create_data building_data_prep``):
    ``root/scenes/scene_<id>.npz`` + ``info_path`` pickle with
    ``[{scene_id, path, gt_boxes, gt_names}]``.
    """

    NumPointFeatures = 4

    def __init__(self, root_path: str | None = None,
                 info_path: str | None = None,
                 class_names=CLASSES,
                 num_synthetic: int = 256,
                 synthetic_seed: int = 0,
                 eval_iou_thresholds: Optional[Dict[str, float]] = None):
        self._root = pathlib.Path(root_path) if root_path else None
        self._class_names = list(class_names)
        self._eval_iou = eval_iou_thresholds or {
            "wall": 0.25, "column": 0.25, "door": 0.25}
        if info_path:
            with open(info_path, "rb") as f:
                self._infos = pickle.load(f)
            self._synthetic = False
        else:
            self._infos = [{"scene_id": synthetic_seed * 100003 + i}
                           for i in range(num_synthetic)]
            self._synthetic = True

    def __len__(self):
        return len(self._infos)

    def get_sensor_data(self, idx: int) -> dict:
        info = self._infos[idx]
        if self._synthetic:
            scene = generate_building_scene(info["scene_id"])
        else:
            data = np.load(self._root / info["path"])
            scene = {"points": data["points"],
                     "gt_boxes": info["gt_boxes"],
                     "gt_names": info["gt_names"],
                     "metadata": {"scene_id": info["scene_id"]}}
        return {
            "lidar": {"points": scene["points"]},
            "metadata": scene.get("metadata", {"scene_id": info["scene_id"]}),
            "annotations": {
                "boxes": scene["gt_boxes"],
                "names": scene["gt_names"],
                "difficulty": np.zeros(len(scene["gt_boxes"]), np.int32),
            },
        }

    def evaluation(self, detections, output_dir=None) -> dict:
        """Rotated-BEV + 3D AP per class at the configured IoU thresholds."""
        from ..utils import eval as eval_mod
        gt_annos = []
        for i in range(len(detections)):
            sd = self.get_sensor_data(i)
            gt_annos.append({
                "boxes": np.asarray(sd["annotations"]["boxes"], np.float64),
                "names": sd["annotations"]["names"],
            })
        return eval_mod.evaluate_lidar_ap(
            gt_annos, detections, self._class_names, self._eval_iou)
