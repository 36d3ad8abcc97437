"""Fused Pallas voxelize+mean kernel (north-star N3).

Hard voxelization followed by the SimpleVoxel mean VFE — the SECOND
path's input stage — without ever materializing the ``[V, T, C]`` padded
voxel tensor: after the XLA sort, the kernel streams the sorted point
buffer through VMEM once and produces per-voxel capped means directly
(``T`` static gathers via ``tpu.dynamic_gather`` + a VPU masked
accumulate).  The big ``[P] -> [V, T, C]`` scatter of the unfused path
(the slowest op class on TPU) disappears entirely.

[ref: second/core/point_cloud/point_cloud_ops.py (points_to_voxel) +
second/pytorch/models/voxel_encoder.py (SimpleVoxel) — lineage-expected,
UNVERIFIED; BASELINE.json names "fused Pallas scatter-reduce over
HBM-resident point buffers"]

Bit-for-bit contract: equals ``SimpleVoxel(mean)`` applied to
``voxelize_jax.voxelize(...)`` outputs (same FCFS capping, same slot
numbering) — parity-tested in tests/test_pallas_voxel_mean.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import voxelize_jax as vj


class FusedVoxelMeanResult(NamedTuple):
    features: jax.Array      # [V, C] capped per-voxel mean features
    coords: jax.Array        # [V, 3] int32 (z, y, x); -1 padding
    num_points: jax.Array    # [V] int32 (capped at T)
    num_voxels: jax.Array    # [] int32


def _kernel(pts_ref, start_ref, count_ref, out_ref, *, T: int, V: int):
    L, C = pts_ref.shape
    pts = pts_ref[:]
    start = start_ref[:]        # [L] i32 (first sorted position per slot)
    count = count_ref[:]        # [L] i32 (capped point count per slot)
    acc = jnp.zeros((L, C), jnp.float32)
    for t in range(T):
        idx = jnp.clip(start + t, 0, L - 1)
        idx2d = jnp.broadcast_to(idx[:, None], (L, C))
        g = jnp.take_along_axis(pts, idx2d, axis=0)  # tpu.dynamic_gather
        mask = (t < count).astype(jnp.float32)
        acc = acc + g.astype(jnp.float32) * mask[:, None]
    denom = jnp.maximum(count, 1).astype(jnp.float32)
    out_ref[:] = acc / denom[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "pc_range", "grid_size", "max_points",
                     "max_voxels", "first_appearance", "interpret"))
def fused_voxelize_mean(points: jax.Array,
                        num_valid: jax.Array,
                        *,
                        voxel_size: Sequence[float],
                        pc_range: Sequence[float],
                        grid_size: Sequence[int],
                        max_points: int,
                        max_voxels: int,
                        first_appearance: bool = True,
                        interpret: bool | None = None
                        ) -> FusedVoxelMeanResult:
    """points [P, C] -> capped per-voxel mean features [V, C] + coords."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, C = points.shape
    gx, gy, gz = (int(g) for g in grid_size)
    c, in_range = vj._cell_coords(points, voxel_size, pc_range, grid_size)
    valid = in_range & (jnp.arange(P) < num_valid)
    key = (c[:, 2] * gy + c[:, 1]) * gx + c[:, 0]
    V, T = max_voxels, max_points

    order, svalid, first, seg_id, _rank = vj._sorted_segments(key, valid)
    slots = vj._voxel_slots(order, first, seg_id, svalid, first_appearance)
    pts_sorted = points[order]
    c_sorted = c[order]

    # per-slot bookkeeping ([V]-sized scatters — cheap)
    head_ok = first & svalid & (slots < V)
    pos = jnp.arange(P, dtype=jnp.int32)
    tgt = jnp.where(head_ok, slots, V)
    start_of_slot = jnp.full((V + 1,), P, jnp.int32).at[tgt].min(pos)[:V]
    seg_count = jnp.zeros((V + 1,), jnp.int32).at[
        jnp.where(svalid & (slots < V), slots, V)
    ].add((svalid & (slots < V)).astype(jnp.int32))[:V]
    counts = jnp.minimum(seg_count, T)

    coords = jnp.full((V + 1, 3), -1, jnp.int32)
    coords = coords.at[tgt].set(
        jnp.where(head_ok[:, None], c_sorted[:, ::-1], -1))[:V]
    num_voxels = jnp.sum(head_ok).astype(jnp.int32)

    # pad slot arrays to the point-buffer length (gather shape constraint)
    L = max(P, V)
    if P < L:
        pts_sorted = jnp.pad(pts_sorted, ((0, L - P), (0, 0)))
    start_pad = jnp.pad(start_of_slot, (0, L - V))
    count_pad = jnp.pad(counts, (0, L - V))

    means = pl.pallas_call(
        functools.partial(_kernel, T=T, V=V),
        out_shape=jax.ShapeDtypeStruct((L, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts_sorted, start_pad, count_pad)[:V]
    means = jnp.where(counts[:, None] > 0, means, 0.0)
    return FusedVoxelMeanResult(means.astype(points.dtype), coords, counts,
                                num_voxels)
