"""Pillar-scatter as a Pallas one-hot-matmul kernel.

Replaces ``canvas.at[lin].set(feats)`` (XLA scatter, serialized row
updates) with per-tile MXU matmuls:

    canvas[tile] = onehot(window_lin == tile_cells)^T @ window_feats

where ``window`` is the contiguous slice of the *key-sorted* pillar array
that can contribute to this tile (pillar linear ids are unique and sorted,
so <= TILE_R pillars land in any TILE_R-cell tile).  Tile start offsets are
precomputed with one small searchsorted and passed via scalar prefetch.

[ref: second/pytorch/models/pointpillars.py::PointPillarsScatter — the
reference scatters with CUDA atomics-free indexing; this is the TPU-native
equivalent at speed]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 1024  # canvas cells per tile (big tiles amortize grid-step cost)
# pillar window: up to TILE_R pillars per tile + up to 127 rows of slack
# from aligning the window start down to a multiple of 128 (Mosaic requires
# lane-aligned dynamic slice starts)
TILE_W = TILE_R + 128


def _kernel(starts_ref, lin_hbm, feats_hbm, out_ref,
            lin_vmem, feats_vmem, sems):
    i = pl.program_id(0)

    # copy the pillar arrays into VMEM once; scratch persists across the
    # whole grid on TPU, so later steps reuse it for free
    @pl.when(i == 0)
    def _():
        cp_f = pltpu.make_async_copy(feats_hbm, feats_vmem, sems.at[0])
        cp_l = pltpu.make_async_copy(lin_hbm, lin_vmem, sems.at[1])
        cp_f.start()
        cp_l.start()
        cp_f.wait()
        cp_l.wait()

    start = pl.multiple_of(starts_ref[i], 128)
    window_feats = feats_vmem[pl.ds(start, TILE_W), :]     # [W, C]
    window_lin = lin_vmem[0, pl.ds(start, TILE_W)]         # [W]
    cell0 = i * TILE_R
    cells = cell0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_W, TILE_R), 1)
    onehot = (window_lin[:, None] == cells).astype(window_feats.dtype)
    out_ref[:, :] = jax.lax.dot_general(
        onehot, window_feats,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hw", "interpret"))
def scatter_sorted_to_canvas(feats: jax.Array, lin: jax.Array, *, hw: int,
                             interpret: bool | None = None) -> jax.Array:
    """[V, C] pillar features + sorted unique linear cell ids [V]
    (invalid/padding rows must carry ``lin >= hw``) -> canvas [hw, C].

    Requires ``lin`` ascending (the device voxelizer's key order).
    """
    V, C = feats.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    num_tiles = pl.cdiv(hw, TILE_R)

    # pad the pillar axis to a multiple of 128 and at least one window
    # (lane-aligned DMAs + in-bounds fixed-size windows)
    V_pad = max(((V + 127) // 128) * 128, TILE_W)
    if V_pad != V:
        feats = jnp.pad(feats, ((0, V_pad - V), (0, 0)))
        lin = jnp.pad(lin, (0, V_pad - V), constant_values=hw)
        V = V_pad

    # window start per tile: first sorted pillar with lin >= tile_start,
    # aligned down to 128 and clamped so the window stays in bounds
    tile_starts = jnp.arange(num_tiles, dtype=jnp.int32) * TILE_R
    starts = jnp.searchsorted(lin, tile_starts).astype(jnp.int32)
    starts = (starts // 128) * 128
    starts = jnp.minimum(starts, max(((V - TILE_W) // 128) * 128, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # lin [1, V] (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # feats [V, C] (HBM)
        ],
        out_specs=pl.BlockSpec((TILE_R, C), lambda i, starts: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, V), jnp.int32),
            pltpu.VMEM((V, C), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * TILE_R, C), feats.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * num_tiles * TILE_W * TILE_R * C,
            bytes_accessed=(num_tiles * TILE_W * (C * 4 + 4)
                            + num_tiles * TILE_R * C * 4),
            transcendentals=0),
    )(starts, lin[None, :], feats)
    return out[:hw]


def scatter_to_canvas_xla(feats: jax.Array, lin: jax.Array,
                          hw: int) -> jax.Array:
    """XLA-scatter fallback (unsorted ids allowed)."""
    V, C = feats.shape
    lin = jnp.where((lin >= 0) & (lin < hw), lin, hw)
    canvas = jnp.zeros((hw + 1, C), feats.dtype)
    canvas = canvas.at[lin].set(
        jnp.where((lin < hw)[:, None], feats, 0.0))
    return canvas[:hw]
