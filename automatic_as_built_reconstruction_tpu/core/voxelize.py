"""Hard voxelization — host NumPy implementation (oracle for device kernels).

Semantics (lineage ``points_to_voxel`` / ``VoxelGenerator``):
- Quantize each point to a grid cell; first-come-first-serve per voxel.
- Voxels are numbered in order of first appearance while scanning points.
- Per-voxel point count capped at ``max_points``; extra points dropped.
- Total voxels capped at ``max_voxels``; once full, points mapping to new
  cells are dropped (points in already-open cells still accumulate).
- Coordinates are returned in **(z, y, x)** order.

[ref: second/core/point_cloud/point_cloud_ops.py::_points_to_voxel_reverse_kernel
— lineage-expected path, UNVERIFIED (SURVEY.md §0)]
"""
from __future__ import annotations

import dataclasses

import numpy as np


def points_to_voxel(points: np.ndarray, voxel_size, coors_range,
                    max_points: int = 35, max_voxels: int = 20000):
    """FCFS hard voxelization.

    Args:
        points: [P, C] (C >= 3; x, y, z first).
        voxel_size: [3] (vx, vy, vz).
        coors_range: [6] (x0, y0, z0, x1, y1, z1).

    Returns:
        voxels: [V, max_points, C] float — zero-padded.
        coors: [V, 3] int32 — (z, y, x).
        num_points_per_voxel: [V] int32.
    """
    points = np.asarray(points)
    voxel_size = np.asarray(voxel_size, dtype=points.dtype)
    coors_range = np.asarray(coors_range, dtype=points.dtype)
    grid_size = np.round((coors_range[3:] - coors_range[:3]) / voxel_size)
    grid_size = grid_size.astype(np.int64)  # (gx, gy, gz)

    # integer cell coords (x, y, z); out-of-range points dropped
    c = np.floor((points[:, :3] - coors_range[:3]) / voxel_size).astype(np.int64)
    in_range = ((c >= 0) & (c < grid_size[None, :])).all(axis=1)

    gx, gy, gz = (int(grid_size[0]), int(grid_size[1]), int(grid_size[2]))
    keys = (c[:, 2] * gy + c[:, 1]) * gx + c[:, 0]  # linearized (z,y,x)

    num_features = points.shape[1]
    voxels = np.zeros((max_voxels, max_points, num_features), dtype=points.dtype)
    coors = np.zeros((max_voxels, 3), dtype=np.int32)
    num_points_per_voxel = np.zeros((max_voxels,), dtype=np.int32)
    key_to_voxel: dict[int, int] = {}
    nv = 0
    for i in np.flatnonzero(in_range):
        k = int(keys[i])
        v = key_to_voxel.get(k, -1)
        if v == -1:
            if nv >= max_voxels:
                continue
            v = nv
            key_to_voxel[k] = v
            coors[v] = (c[i, 2], c[i, 1], c[i, 0])
            nv += 1
        n = num_points_per_voxel[v]
        if n < max_points:
            voxels[v, n] = points[i]
            num_points_per_voxel[v] = n + 1
    return voxels[:nv], coors[:nv], num_points_per_voxel[:nv]


def points_to_voxel_fast(points: np.ndarray, voxel_size, coors_range,
                         max_points: int = 35, max_voxels: int = 20000):
    """Sort-based vectorized hard voxelization — identical outputs to
    :func:`points_to_voxel` (FCFS order reproduced via stable sort by
    (cell key, original index) and first-occurrence voxel numbering).

    This is the algorithmic spec for the device kernel in
    ``ops.voxelize`` (sort + segment ops; no data-dependent loops).
    """
    points = np.asarray(points)
    voxel_size = np.asarray(voxel_size, dtype=points.dtype)
    coors_range = np.asarray(coors_range, dtype=points.dtype)
    grid_size = np.round((coors_range[3:] - coors_range[:3]) / voxel_size)
    grid_size = grid_size.astype(np.int64)
    gx, gy = int(grid_size[0]), int(grid_size[1])

    c = np.floor((points[:, :3] - coors_range[:3]) / voxel_size).astype(np.int64)
    in_range = ((c >= 0) & (c < grid_size[None, :])).all(axis=1)
    idx = np.flatnonzero(in_range)
    if idx.size == 0:
        C = points.shape[1]
        return (np.zeros((0, max_points, C), points.dtype),
                np.zeros((0, 3), np.int32), np.zeros((0,), np.int32))
    c = c[idx]
    keys = (c[:, 2] * gy + c[:, 1]) * gx + c[:, 0]

    order = np.argsort(keys, kind="stable")  # stable => FCFS within cell
    skeys = keys[order]
    first = np.ones(len(skeys), dtype=bool)
    first[1:] = skeys[1:] != skeys[:-1]
    seg_id = np.cumsum(first) - 1                     # segment per sorted point
    seg_start = np.flatnonzero(first)
    rank = np.arange(len(skeys)) - seg_start[seg_id]  # FCFS rank within cell

    # voxel numbering = order of first appearance = rank of each segment's
    # minimal original index among segment minima
    seg_min_orig = idx[order][seg_start]              # stable sort => min orig idx
    voxel_order = np.argsort(np.argsort(seg_min_orig, kind="stable"), kind="stable")
    # cap voxels: keep segments whose first-appearance rank < max_voxels
    keep_seg = voxel_order < max_voxels
    seg_count = np.bincount(seg_id, minlength=len(seg_start))

    keep_pt = keep_seg[seg_id] & (rank < max_points)
    C = points.shape[1]
    nv = int(keep_seg.sum())
    voxels = np.zeros((nv, max_points, C), dtype=points.dtype)
    coors = np.zeros((nv, 3), dtype=np.int32)
    npts = np.zeros((nv,), dtype=np.int32)

    vnum = voxel_order.copy()  # segment -> final voxel slot (only valid if kept)
    pts_sorted = points[idx][order]
    c_sorted = c[order]
    v_of_pt = vnum[seg_id]
    sel = keep_pt
    voxels[v_of_pt[sel], rank[sel]] = pts_sorted[sel]
    coors[vnum[keep_seg]] = c_sorted[seg_start][keep_seg][:, ::-1]  # zyx
    npts[vnum[keep_seg]] = np.minimum(seg_count[keep_seg], max_points)
    return voxels, coors, npts


@dataclasses.dataclass
class VoxelGenerator:
    """Config-bound voxelizer.  [ref: second/core/voxel_generator.py]"""

    voxel_size: tuple
    point_cloud_range: tuple
    max_num_points: int
    max_voxels: int = 20000

    @property
    def grid_size(self) -> np.ndarray:
        vs = np.asarray(self.voxel_size)
        pr = np.asarray(self.point_cloud_range)
        return np.round((pr[3:] - pr[:3]) / vs).astype(np.int64)

    def generate(self, points: np.ndarray, max_voxels: int | None = None):
        mv = max_voxels or self.max_voxels
        if points.dtype == np.float32:
            try:
                from .. import native
                if native.AVAILABLE:
                    return native.points_to_voxel(
                        points, self.voxel_size, self.point_cloud_range,
                        self.max_num_points, mv)
            except ImportError:
                pass
        return points_to_voxel_fast(
            points, self.voxel_size, self.point_cloud_range,
            self.max_num_points, mv)
