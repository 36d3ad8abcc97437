"""Device voxelization — sort-based, static shapes, jit/vmap-able.

TPU-first redesign of the lineage's FCFS scatter loop
[ref: second/core/point_cloud/point_cloud_ops.py — UNVERIFIED]: no atomics,
no data-dependent shapes.  A stable sort by (cell key) keeps arrival order
within each cell, segment arithmetic recovers FCFS ranks, and a double
argsort over segment first-arrival indices reproduces the reference's
first-appearance voxel numbering bit-for-bit (parity-tested against
``core.voxelize.points_to_voxel``).

Also provides *dynamic* voxelization (no per-voxel point cap; segment mean)
for the pod-inference path (BASELINE.json config 5).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

_INT32_MAX = jnp.iinfo(jnp.int32).max


class VoxelizationResult(NamedTuple):
    voxels: jax.Array        # [V, T, C] zero-padded point features
    coords: jax.Array        # [V, 3] int32 (z, y, x); -1 padding
    num_points: jax.Array    # [V] int32 points per voxel (<= T)
    num_voxels: jax.Array    # [] int32 valid voxel count


class FlatVoxelizationResult(NamedTuple):
    """Flat (point-major) voxelization: the per-point view of the same
    hard voxelization :func:`voxelize` produces, without materializing
    the [V, T, C] padded grid.  A pillar holds ~1-2 points on average,
    so the padded grid is >90% zeros — flat consumers (segment-op VFEs,
    see ``PillarFeatureNet`` flat mode) read/write T/occupancy x less
    HBM."""
    points: jax.Array        # [P, C] points sorted by cell key
    slot: jax.Array          # [P] int32 voxel slot; V = invalid/overflow
    coords: jax.Array        # [V, 3] int32 (z, y, x); -1 padding
    num_points: jax.Array    # [V] int32 points per voxel (<= T)
    num_voxels: jax.Array    # [] int32 valid voxel count


class DynamicVoxelizationResult(NamedTuple):
    features: jax.Array      # [V, C] per-voxel mean features
    coords: jax.Array        # [V, 3] int32 (z, y, x); -1 padding
    num_points: jax.Array    # [V] int32
    num_voxels: jax.Array    # [] int32
    point_voxel_idx: jax.Array  # [P] int32 voxel slot per point (-1 invalid)


def _cell_coords(points, voxel_size, pc_range, grid_size):
    """Integer cell coords [P,3] (x,y,z order) + in-range mask [P]."""
    vs = jnp.asarray(voxel_size, points.dtype)
    r0 = jnp.asarray(pc_range[:3], points.dtype)
    c = jnp.floor((points[:, :3] - r0) / vs).astype(jnp.int32)
    gs = jnp.asarray(grid_size, jnp.int32)
    in_range = jnp.all((c >= 0) & (c < gs[None, :]), axis=1)
    return c, in_range


def _sorted_segments(key, valid):
    """Stable sort by key with invalids last; returns segment bookkeeping."""
    P = key.shape[0]
    key = jnp.where(valid, key, _INT32_MAX)
    order = jnp.argsort(key, stable=True)              # [P]
    skey = key[order]
    svalid = skey != _INT32_MAX
    first = jnp.concatenate(
        [jnp.array([True]), skey[1:] != skey[:-1]]) & svalid
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1   # [P], -1 before 1st seg
    pos = jnp.arange(P, dtype=jnp.int32)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, pos, -1))
    rank = pos - seg_start
    return order, svalid, first, seg_id, rank


def _voxel_slots(order, first, seg_id, svalid, first_appearance: bool):
    """Per-segment voxel slot assignment (first-appearance or key order)."""
    P = order.shape[0]
    if not first_appearance:
        return seg_id
    # original index of each segment's first (earliest-arriving) point
    seg_min = jnp.full((P + 1,), _INT32_MAX, jnp.int32)
    idx = jnp.where(first & svalid, seg_id, P)
    seg_min = seg_min.at[idx].min(order.astype(jnp.int32))[:P]
    # slot of segment s = rank of seg_min[s] among all segments
    slots_per_seg = jnp.argsort(jnp.argsort(seg_min, stable=True),
                                stable=True).astype(jnp.int32)
    return slots_per_seg[jnp.clip(seg_id, 0, P - 1)]


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "pc_range", "grid_size", "max_points",
                     "max_voxels", "first_appearance"))
def voxelize(points: jax.Array,
             num_valid: jax.Array,
             *,
             voxel_size: Sequence[float],
             pc_range: Sequence[float],
             grid_size: Sequence[int],
             max_points: int,
             max_voxels: int,
             first_appearance: bool = True) -> VoxelizationResult:
    """Hard voxelization with static output shapes.

    Args:
        points: [P, C] padded point buffer (x, y, z first).
        num_valid: scalar int — points beyond this index are padding.
        grid_size: static (gx, gy, gz).
        first_appearance: number voxels by first point arrival (bit-for-bit
            FCFS parity with the reference); False = key order (faster,
            order-insensitive consumers like segment VFEs should use this).
    """
    P, C = points.shape
    gx, gy, gz = (int(g) for g in grid_size)
    assert gx * gy * gz < _INT32_MAX, "grid too large for int32 keys"
    c, in_range = _cell_coords(points, voxel_size, pc_range, grid_size)
    valid = in_range & (jnp.arange(P) < num_valid)
    # depth-minor key (y, x, z) — matches ops.sparse_conv.linearize so
    # key-sorted voxels give monotone, window-local sparse-conv rulebooks
    key = (c[:, 1] * gx + c[:, 0]) * gz + c[:, 2]
    V, T = max_voxels, max_points

    order, svalid, first, seg_id, rank = _sorted_segments(key, valid)
    slots = _voxel_slots(order, first, seg_id, svalid, first_appearance)

    pts_sorted = points[order]
    c_sorted = c[order]

    head_ok = first & svalid & (slots < V)
    num_voxels = jnp.sum(head_ok).astype(jnp.int32)

    if V * T <= 2 * P:
        # gather-based construction: instead of scattering all P points
        # into [V, T, C] (TPU scatters are the slow path), compute each
        # slot's start position in the sorted buffer ([V]-sized scatters
        # only) and GATHER the [V, T] window — a segment's first T FCFS
        # points are exactly sorted positions start..start+T-1 (stable
        # sort).  Wins when the [V, T] slot grid isn't much larger than
        # the point buffer (e.g. SECOND's T=5); for high per-voxel caps
        # (pillars, T=32) the padded gather does T/avg_occupancy x the
        # work of the scatter, so that shape keeps the scatter.
        pos = jnp.arange(P, dtype=jnp.int32)
        head_tgt = jnp.where(head_ok, slots, V)
        start_of_slot = jnp.full((V + 1,), P, jnp.int32).at[head_tgt].min(
            pos)[:V]
        seg_count = jnp.zeros((V + 1,), jnp.int32).at[
            jnp.where(svalid & (slots < V), slots, V)
        ].add((svalid & (slots < V)).astype(jnp.int32))[:V]
        num_points = jnp.minimum(seg_count, T)

        gather = jnp.clip(start_of_slot[:, None] + jnp.arange(T)[None, :],
                          0, P - 1)                                # [V, T]
        tmask = jnp.arange(T)[None, :] < num_points[:, None]
        voxels = jnp.where(
            tmask[..., None],
            pts_sorted[gather.reshape(-1)].reshape(V, T, C), 0.0)

        head_idx = jnp.clip(start_of_slot, 0, P - 1)
        coords = jnp.where((num_points > 0)[:, None],
                           c_sorted[head_idx][:, ::-1], -1).astype(jnp.int32)
        return VoxelizationResult(voxels, coords, num_points, num_voxels)

    # scatter-based construction (P scattered rows < the [V, T] grid)
    pt_ok = svalid & (slots < V) & (rank < T)
    voxels = jnp.zeros((V + 1, T, C), points.dtype)
    voxels = voxels.at[
        jnp.where(pt_ok, slots, V), jnp.where(pt_ok, rank, 0)
    ].set(jnp.where(pt_ok[:, None], pts_sorted, 0.0))

    coords = jnp.full((V + 1, 3), -1, jnp.int32)
    coords = coords.at[jnp.where(head_ok, slots, V)].set(
        jnp.where(head_ok[:, None], c_sorted[:, ::-1], -1))

    num_points = jnp.zeros((V + 1,), jnp.int32)
    num_points = num_points.at[jnp.where(pt_ok, slots, V)].add(
        pt_ok.astype(jnp.int32))
    return VoxelizationResult(voxels[:V], coords[:V], num_points[:V],
                              num_voxels)


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "pc_range", "grid_size", "max_points",
                     "max_voxels", "first_appearance"))
def voxelize_flat(points: jax.Array,
                  num_valid: jax.Array,
                  *,
                  voxel_size: Sequence[float],
                  pc_range: Sequence[float],
                  grid_size: Sequence[int],
                  max_points: int,
                  max_voxels: int,
                  first_appearance: bool = False) -> FlatVoxelizationResult:
    """Hard voxelization, flat (point-major) output.

    Same cell assignment, FCFS per-voxel point cap and voxel numbering
    as :func:`voxelize` (``slot[p]`` is exactly the voxel row point p
    occupies there; points beyond the T cap or outside the grid get
    slot == max_voxels), but the per-point features stay a [P, C] array
    instead of being padded into [V, T, C].  With the default key-order
    numbering (``first_appearance=False``) ``slot`` is nondecreasing,
    so segment reductions may pass ``indices_are_sorted=True``.
    """
    P, C = points.shape
    gx, gy, gz = (int(g) for g in grid_size)
    assert gx * gy * gz < _INT32_MAX, "grid too large for int32 keys"
    c, in_range = _cell_coords(points, voxel_size, pc_range, grid_size)
    valid = in_range & (jnp.arange(P) < num_valid)
    key = (c[:, 1] * gx + c[:, 0]) * gz + c[:, 2]
    V, T = max_voxels, max_points

    order, svalid, first, seg_id, rank = _sorted_segments(key, valid)
    slots = _voxel_slots(order, first, seg_id, svalid, first_appearance)

    pts_sorted = points[order]
    c_sorted = c[order]

    head_ok = first & svalid & (slots < V)
    num_voxels = jnp.sum(head_ok).astype(jnp.int32)
    pt_ok = svalid & (slots < V) & (rank < T)
    slot = jnp.where(pt_ok, slots, V).astype(jnp.int32)

    coords = jnp.full((V + 1, 3), -1, jnp.int32)
    coords = coords.at[jnp.where(head_ok, slots, V)].set(
        jnp.where(head_ok[:, None], c_sorted[:, ::-1], -1))
    num_points = jnp.zeros((V + 1,), jnp.int32)
    num_points = num_points.at[jnp.where(pt_ok, slots, V)].add(
        pt_ok.astype(jnp.int32))
    return FlatVoxelizationResult(pts_sorted, slot, coords[:V],
                                  num_points[:V], num_voxels)


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "pc_range", "grid_size", "max_voxels"))
def dynamic_voxelize(points: jax.Array,
                     num_valid: jax.Array,
                     *,
                     voxel_size: Sequence[float],
                     pc_range: Sequence[float],
                     grid_size: Sequence[int],
                     max_voxels: int) -> DynamicVoxelizationResult:
    """Dynamic voxelization: per-voxel *mean* features, no point cap.

    Every in-range point contributes (segment mean); the TPU-native
    equivalent of the reference's cap-free aggregation for huge
    variable-density building scans.
    """
    P, C = points.shape
    gx, gy, gz = (int(g) for g in grid_size)
    c, in_range = _cell_coords(points, voxel_size, pc_range, grid_size)
    valid = in_range & (jnp.arange(P) < num_valid)
    # depth-minor key (y, x, z) — matches ops.sparse_conv.linearize so
    # key-sorted voxels give monotone, window-local sparse-conv rulebooks
    key = (c[:, 1] * gx + c[:, 0]) * gz + c[:, 2]

    order, svalid, first, seg_id, _rank = _sorted_segments(key, valid)
    slots = _voxel_slots(order, first, seg_id, svalid, True)

    V = max_voxels
    pt_ok = svalid & (slots < V)
    pts_sorted = points[order]
    c_sorted = c[order]
    tgt = jnp.where(pt_ok, slots, V)

    sums = jnp.zeros((V + 1, C), points.dtype).at[tgt].add(
        jnp.where(pt_ok[:, None], pts_sorted, 0.0))
    counts = jnp.zeros((V + 1,), jnp.int32).at[tgt].add(pt_ok.astype(jnp.int32))
    means = sums / jnp.maximum(counts[:, None].astype(points.dtype), 1)

    head_ok = first & svalid & (slots < V)
    coords = jnp.full((V + 1, 3), -1, jnp.int32)
    coords = coords.at[jnp.where(head_ok, slots, V)].set(
        jnp.where(head_ok[:, None], c_sorted[:, ::-1], -1))

    # map each original point to its voxel slot (-1 for dropped)
    pv = jnp.full((P,), -1, jnp.int32)
    pv = pv.at[order].set(jnp.where(pt_ok, slots, -1))

    num_voxels = jnp.sum(head_ok).astype(jnp.int32)
    return DynamicVoxelizationResult(means[:V], coords[:V], counts[:V],
                                     num_voxels, pv)
