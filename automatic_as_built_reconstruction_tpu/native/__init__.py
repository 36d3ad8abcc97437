"""ctypes bindings for the native host library (csrc/libabr_host.so).

Build once with ``make -C csrc`` (or :func:`build`).  Every entry point has
a NumPy twin in ``core``; :data:`AVAILABLE` gates dispatch so the pure-
Python path always works.  Native calls release the GIL (ctypes), so the
input-pipeline worker threads get real parallelism.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libabr_host.so"

_lib = None


def build(force: bool = False) -> bool:
    """Compile the native library in-tree; returns success."""
    if _LIB_PATH.exists() and not force:
        return True
    try:
        subprocess.run(["make", "-C", str(_CSRC)], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64, i32, f32, u8 = (ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
                         ctypes.c_uint8)
    fp = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    ip32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    ip64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    up = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.abr_points_to_voxel.restype = ctypes.c_int
    lib.abr_points_to_voxel.argtypes = [fp, i64, i64, fp, fp, i64, i64,
                                        fp, ip32, ip32]
    lib.abr_voxelize_sorted_mean.restype = ctypes.c_int
    lib.abr_voxelize_sorted_mean.argtypes = [fp, i64, i64, fp, fp, i64,
                                             i64, fp, ip32, ip32]
    lib.abr_points_in_rbbox.restype = None
    lib.abr_points_in_rbbox.argtypes = [fp, i64, i64, fp, i64, up]
    lib.abr_box_collision_test.restype = None
    lib.abr_box_collision_test.argtypes = [fp, i64, fp, i64, up]
    lib.abr_rotate_iou.restype = None
    lib.abr_rotate_iou.argtypes = [fp, i64, fp, i64, ctypes.c_int, fp]
    lib.abr_rotate_nms.restype = ctypes.c_int
    lib.abr_rotate_nms.argtypes = [fp, fp, i64, f32, i64, ip64]
    lib.abr_subm_rulebook.restype = None
    lib.abr_subm_rulebook.argtypes = [ip32, i64, ip32, ip32, ip32, up]
    lib.abr_strided_layout.restype = ctypes.c_int
    lib.abr_strided_layout.argtypes = [ip32, i64, ip32, ip32, ip32, ip32,
                                       i64, ip32, up, ip32, up]
    lib.abr_block_rulebooks.restype = ctypes.c_int
    lib.abr_block_rulebooks.argtypes = [ip32, i64, ip32, ip32, ip32, ip32,
                                        i64, ip32, up, ip32, up, ip32, up]
    ip8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    lib.abr_eval_tp_scores.restype = ctypes.c_int
    lib.abr_eval_tp_scores.argtypes = [fp, i64, i64, ip8, ip8, fp, f32, fp]
    lib.abr_eval_statistics.restype = None
    lib.abr_eval_statistics.argtypes = [fp, i64, i64, ip8, ip8, fp, fp, i64,
                                        fp, fp, ctypes.c_int, f32, fp, i64,
                                        ip32, ip32, ip32, fp]
    _lib = lib
    return lib


AVAILABLE = _load() is not None


def points_to_voxel(points, voxel_size, coors_range, max_points: int,
                    max_voxels: int):
    """Native FCFS hard voxelization (bit-identical to core.voxelize)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    P, C = points.shape
    voxels = np.empty((max_voxels, max_points, C), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    npts = np.empty((max_voxels,), np.int32)
    nv = lib.abr_points_to_voxel(
        points, P, C, np.asarray(voxel_size, np.float32),
        np.asarray(coors_range, np.float32), max_points, max_voxels,
        voxels, coords, npts)
    return voxels[:nv], coords[:nv], npts[:nv]


def voxelize_sorted_mean(points, voxel_size, coors_range, max_points: int,
                         max_voxels: int):
    """Fused FCFS voxelization + capped per-voxel mean, key-sorted output
    (the SECOND/SimpleVoxel input stage in one native pass; monotone
    rulebooks downstream).  Returns (means [V, C] zero-padded,
    coords [V, 3] zyx with -1 padding, counts [V], num_voxels).

    Overflow caveat: when the scan has more than ``max_voxels`` occupied
    cells, this kernel keeps the FIRST-APPEARANCE voxels (FCFS over the
    input point order) and then key-sorts them, while the device twin
    ``ops.voxelize_jax.voxelize(first_appearance=False)`` keeps the
    smallest-key voxels — the two select different voxel subsets exactly
    on overflow scans.  Bit parity with the device path holds only while
    the occupied-cell count fits ``max_voxels``."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    P, C = points.shape
    means = np.empty((max_voxels, C), np.float32)
    coords = np.empty((max_voxels, 3), np.int32)
    counts = np.empty((max_voxels,), np.int32)
    nv = lib.abr_voxelize_sorted_mean(
        points, P, C, np.asarray(voxel_size, np.float32),
        np.asarray(coors_range, np.float32), max_points, max_voxels,
        means, coords, counts)
    return means, coords, counts, nv


def points_in_rbbox(points, boxes) -> np.ndarray:
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 7)
    out = np.empty((len(points), len(boxes)), np.uint8)
    lib.abr_points_in_rbbox(points, points.shape[0], points.shape[1],
                            boxes, len(boxes), out)
    return out.astype(bool)


def box_collision_test(boxes, qboxes) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 5)
    qboxes = np.ascontiguousarray(qboxes, np.float32).reshape(-1, 5)
    out = np.empty((len(boxes), len(qboxes)), np.uint8)
    lib.abr_box_collision_test(boxes, len(boxes), qboxes, len(qboxes), out)
    return out.astype(bool)


def rotate_iou(boxes, qboxes, criterion: int = -1) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 5)
    qboxes = np.ascontiguousarray(qboxes, np.float32).reshape(-1, 5)
    out = np.empty((len(boxes), len(qboxes)), np.float32)
    lib.abr_rotate_iou(boxes, len(boxes), qboxes, len(qboxes), criterion,
                       out)
    return out


def eval_tp_scores(overlaps, ignored_gt, ignored_det, dt_scores,
                   min_overlap: float) -> np.ndarray:
    """Devkit pass 1 for one image: scores of matched TPs."""
    lib = _load()
    overlaps = np.ascontiguousarray(overlaps, np.float32)
    D, G = overlaps.shape
    out = np.empty((D,), np.float32)
    n = lib.abr_eval_tp_scores(
        overlaps, D, G, np.ascontiguousarray(ignored_gt, np.int8),
        np.ascontiguousarray(ignored_det, np.int8),
        np.ascontiguousarray(dt_scores, np.float32),
        np.float32(min_overlap), out)
    return out[:n]


def eval_statistics(overlaps, ignored_gt, ignored_det, dt_scores,
                    dc_overlap, gt_alpha, dt_alpha, compute_aos: bool,
                    min_overlap: float, thresholds,
                    tp, fp, fn, sim) -> None:
    """Devkit pass 2 for one image: accumulate tp/fp/fn/sim per threshold."""
    lib = _load()
    overlaps = np.ascontiguousarray(overlaps, np.float32)
    D, G = overlaps.shape
    dc_overlap = np.ascontiguousarray(dc_overlap, np.float32)
    NDC = dc_overlap.shape[1] if dc_overlap.size else 0
    thresholds = np.ascontiguousarray(thresholds, np.float32)
    lib.abr_eval_statistics(
        overlaps, D, G, np.ascontiguousarray(ignored_gt, np.int8),
        np.ascontiguousarray(ignored_det, np.int8),
        np.ascontiguousarray(dt_scores, np.float32),
        dc_overlap.reshape(D, NDC) if NDC else np.zeros((D, 0), np.float32),
        NDC, np.ascontiguousarray(gt_alpha, np.float32),
        np.ascontiguousarray(dt_alpha, np.float32), int(compute_aos),
        np.float32(min_overlap), thresholds, len(thresholds), tp, fp, fn,
        sim)


def rotate_nms(boxes, scores, iou_threshold: float,
               post_max_size: int | None = None) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 5)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty((len(boxes),), np.int64)
    n = lib.abr_rotate_nms(boxes, scores, len(boxes),
                           np.float32(iou_threshold),
                           post_max_size or len(boxes), keep)
    return keep[:n]
