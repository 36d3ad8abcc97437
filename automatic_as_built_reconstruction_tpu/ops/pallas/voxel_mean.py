"""Fused Pallas voxelize+mean kernel (north-star N3).

Hard voxelization followed by the SimpleVoxel mean VFE — the SECOND
path's input stage — without ever materializing the ``[V, T, C]`` padded
voxel tensor.  After the XLA sort, a slot's first ``T`` FCFS points are
contiguous in the sorted buffer, and with key-order slot numbering the
slot start offsets are monotone — so each tile of ``TV`` consecutive
slots reads ONE contiguous window of sorted points.  The kernel DMAs
that window HBM->VMEM and reduces it with ``T`` one-hot MXU matmuls
(relative-index compares on the VPU); the ``[P] -> [V, T, C]`` scatter
of the unfused path (the slowest op class on TPU) disappears entirely.

[ref: second/core/point_cloud/point_cloud_ops.py (points_to_voxel) +
second/pytorch/models/voxel_encoder.py (SimpleVoxel) — lineage-expected,
UNVERIFIED; BASELINE.json names "fused Pallas scatter-reduce over
HBM-resident point buffers"]

Bit-for-bit contract: equals ``SimpleVoxel(mean)`` applied to
``voxelize_jax.voxelize(...)`` outputs (same FCFS capping, same slot
numbering) — parity-tested in tests/test_pallas_voxel_mean.py.  The
first-appearance slot numbering (non-monotone starts) and degenerate
window layouts fall back to an equivalent XLA gather inside the same
jit program.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import voxelize_jax as vj


class FusedVoxelMeanResult(NamedTuple):
    features: jax.Array      # [V, C] capped per-voxel mean features
    coords: jax.Array        # [V, 3] int32 (z, y, x); -1 padding
    num_points: jax.Array    # [V] int32 (capped at T)
    num_voxels: jax.Array    # [] int32


def _kernel(win_ref, start_ref, count_ref, ptsT_hbm, out_ref, scratch,
            sem, *, T: int, TV: int, W: int):
    t = pl.program_id(0)
    ws = pl.multiple_of(win_ref[t], 128)
    dma = pltpu.make_async_copy(ptsT_hbm.at[:, pl.ds(ws, W)], scratch, sem)
    dma.start()

    # start/count ship as [1, Lv] so the per-tile read is a lane slice at
    # a 128-multiple offset (1-D VMEM dynamic slices don't lower)
    sl = pl.ds(pl.multiple_of(t * TV, TV), TV)
    start = start_ref[0, sl]                                # [TV]
    count = count_ref[0, sl]                                # [TV]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TV, W), 1)
    dma.wait()
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for tt in range(T):
        rel = start + tt - ws
        # minor-dim inserts must stay 32-bit on Mosaic: broadcast the
        # int32 count first, compare after
        onehot = (cols == rel[:, None]) & (tt < count[:, None])
        acc = acc + jax.lax.dot_general(
            onehot.astype(scratch.dtype), scratch[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,   # fp32 mean, not bf16
            preferred_element_type=jnp.float32)             # [TV, C]
    denom = jnp.maximum(count, 1).astype(jnp.float32)
    out_ref[:] = acc / denom[:, None]


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "pc_range", "grid_size", "max_points",
                     "max_voxels", "first_appearance", "interpret",
                     "tile", "window"))
def fused_voxelize_mean(points: jax.Array,
                        num_valid: jax.Array,
                        *,
                        voxel_size: Sequence[float],
                        pc_range: Sequence[float],
                        grid_size: Sequence[int],
                        max_points: int,
                        max_voxels: int,
                        first_appearance: bool = True,
                        interpret: bool | None = None,
                        tile: int = 256,
                        window: int = 1024
                        ) -> FusedVoxelMeanResult:
    """points [P, C] -> capped per-voxel mean features [V, C] + coords."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    P, C = points.shape
    gx, gy, gz = (int(g) for g in grid_size)
    c, in_range = vj._cell_coords(points, voxel_size, pc_range, grid_size)
    valid = in_range & (jnp.arange(P) < num_valid)
    # depth-minor key (y, x, z) — matches ops.sparse_conv.linearize
    key = (c[:, 1] * gx + c[:, 0]) * gz + c[:, 2]
    V, T = max_voxels, max_points
    TV, W = int(tile), int(window)
    if not interpret:
        TV = max(TV, 128)    # compiled lane slices need 128-aligned tiles

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

    # pad slot arrays to a tile multiple, points to >= one window
    Lv = -(-V // TV) * TV
    start_pad = jnp.pad(start_of_slot, (0, Lv - V))
    count_pad = jnp.pad(counts, (0, Lv - V))
    Lp = max(-(-P // 128) * 128, W)
    ptsT = jnp.pad(pts_sorted, ((0, Lp - P), (0, 0))).T     # [C, Lp]

    # per-tile window starts (128-aligned) + Pallas eligibility
    n_tiles = Lv // TV
    start_t = start_pad.reshape(n_tiles, TV)
    count_t = count_pad.reshape(n_tiles, TV)
    occupied = count_t > 0
    big = jnp.int32(Lp)
    mins = jnp.min(jnp.where(occupied, start_t, big), axis=-1)
    maxs = jnp.max(jnp.where(occupied, start_t + count_t, -1), axis=-1)
    win_start = jnp.clip(jnp.where(mins == big, 0, mins), 0,
                         max(Lp - W, 0)) // 128 * 128
    cmx = lax.cummax(jnp.where(counts > 0, start_of_slot, -1))
    monotone = jnp.all(jnp.where(counts > 0, start_of_slot == cmx, True))
    fits = jnp.all(maxs - win_start <= W) & monotone

    def pallas_path(args):
        st, ct, pt, wf = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),      # start [1, Lv]
                pl.BlockSpec(memory_space=pltpu.VMEM),      # count [1, Lv]
                pl.BlockSpec(memory_space=pl.ANY),          # ptsT HBM
            ],
            out_specs=pl.BlockSpec((TV, C), lambda t, ws: (t, 0)),
            scratch_shapes=[
                pltpu.VMEM((C, W), pt.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel, T=T, TV=TV, W=W),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Lv, C), jnp.float32),
            interpret=interpret,
        )(wf, st[None, :], ct[None, :], pt)

    def xla_path(args):
        st, ct, pt, _ = args
        gather = jnp.clip(st[:, None] + jnp.arange(T)[None, :], 0, Lp - 1)
        g = pt.T[gather.reshape(-1)].reshape(Lv, T, C)
        m = (jnp.arange(T)[None, :] < ct[:, None])
        s = jnp.sum(jnp.where(m[..., None], g, 0.0), axis=1)
        return s / jnp.maximum(ct, 1)[:, None].astype(s.dtype)

    means = lax.cond(fits, pallas_path, xla_path,
                     (start_pad, count_pad, ptsT, win_start))[:V]
    means = jnp.where(counts[:, None] > 0, means, 0.0)
    return FusedVoxelMeanResult(means.astype(points.dtype), coords, counts,
                                num_voxels)
