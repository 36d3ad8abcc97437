"""Point-sharded voxelization for huge building scans (SP analog).

The reference caps points per scan and runs single-GPU; whole-building
scans (millions of points) don't fit that mold.  TPU-native approach
[ref: SURVEY.md §5.7 — the "sequence parallelism for point clouds"]:

- shard the point buffer across the ``data`` mesh axis (``shard_map``),
- each device scatter-adds its shard into a dense per-cell accumulator
  (sums + counts) — purely local,
- one ``psum`` over ICI merges the partial accumulators exactly,
- every device ends with the replicated global mean-feature canvas, ready
  for the (replicated) BEV network.

Exactness: addition reordering only (fp32 sums); parity-tested against the
single-device dynamic voxelizer.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_accumulate(points, num_valid, *, voxel_size, pc_range, grid_hw,
                      num_features):
    """[Pl, C] local shard -> dense (sums [HW, C], counts [HW])."""
    H, W = grid_hw
    vx, vy = voxel_size[0], voxel_size[1]
    x0, y0 = pc_range[0], pc_range[1]
    z0, z1 = pc_range[2], pc_range[5]
    Pl = points.shape[0]
    col = jnp.floor((points[:, 0] - x0) / vx).astype(jnp.int32)
    row = jnp.floor((points[:, 1] - y0) / vy).astype(jnp.int32)
    ok = ((col >= 0) & (col < W) & (row >= 0) & (row < H)
          & (points[:, 2] >= z0) & (points[:, 2] < z1)
          & (jnp.arange(Pl) < num_valid))
    lin = jnp.where(ok, row * W + col, H * W)
    sums = jnp.zeros((H * W + 1, num_features), jnp.float32)
    sums = sums.at[lin].add(
        jnp.where(ok[:, None], points[:, :num_features], 0.0))
    counts = jnp.zeros((H * W + 1,), jnp.float32).at[lin].add(
        ok.astype(jnp.float32))
    return sums[: H * W], counts[: H * W]


def make_sharded_mean_canvas(mesh: Mesh, *, voxel_size, pc_range,
                             grid_hw: Tuple[int, int],
                             num_features: int = 4):
    """Returns jit fn: (points [Ptot, C] sharded, num_valid_per_shard [D])
    -> replicated (mean canvas [H, W, F], counts [H, W]).

    ``points`` rows must be laid out shard-major (device d owns rows
    [d*Pl, (d+1)*Pl)); ``num_valid_per_shard[d]`` masks that shard's tail.
    """
    H, W = grid_hw

    def fn(points, num_valid_per_shard):
        def shard_fn(pts, nv):
            sums, counts = _local_accumulate(
                pts, nv[0], voxel_size=voxel_size, pc_range=pc_range,
                grid_hw=grid_hw, num_features=num_features)
            sums = jax.lax.psum(sums, "data")      # ICI all-reduce
            counts = jax.lax.psum(counts, "data")
            return sums, counts

        sums, counts = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P(), P()))(points, num_valid_per_shard)
        mean = sums / jnp.maximum(counts[:, None], 1.0)
        return (mean.reshape(H, W, num_features),
                counts.reshape(H, W))

    return jax.jit(fn)


def single_device_mean_canvas(points, num_valid, *, voxel_size, pc_range,
                              grid_hw, num_features: int = 4):
    """Unsharded oracle for the parity test."""
    H, W = grid_hw
    sums, counts = _local_accumulate(
        points, num_valid, voxel_size=voxel_size, pc_range=pc_range,
        grid_hw=grid_hw, num_features=num_features)
    mean = sums / jnp.maximum(counts[:, None], 1.0)
    return mean.reshape(H, W, num_features), counts.reshape(H, W)
