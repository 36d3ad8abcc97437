"""PointPillars: pillar feature net + scatter-to-canvas middle stage.

[ref: second/pytorch/models/pointpillars.py (Lang et al., CVPR 2019) —
lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .voxel_encoder import points_mask


class PFNLayer(nn.Module):
    """Pillar feature net layer: Dense + BN + ReLU (+ max-pool if last)."""

    units: int
    last_layer: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask, *, train: bool):
        x = nn.Dense(self.units, use_bias=False, dtype=self.dtype)(inputs)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        x = nn.relu(x) * mask
        x_max = jnp.max(x, axis=2, keepdims=True)
        if self.last_layer:
            return x_max[:, :, 0, :]  # [B, V, units]
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_repeat], axis=-1)


class PillarFeatureNet(nn.Module):
    """Decorate points (cluster offset + pillar-center offset), run PFN
    layers, max-pool to one feature per pillar.

    Decorations (paper): [x, y, z, r, xc, yc, zc, xp, yp] (+ |p| optional).
    ``radius=True`` is the PillarFeatureNetRadius variant: the absolute
    (x, y) channels are folded into the rotation-invariant BEV radius
    sqrt(x^2 + y^2), everything else unchanged
    [ref: second/pytorch/models/pointpillars.py::PillarFeatureNetRadius —
    lineage-expected, UNVERIFIED].
    """

    num_input_features: int = 4
    num_filters: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, float] = (0.0, -40.0)  # (x0, y0)
    radius: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, voxels, num_points, coords, *, train: bool = False):
        """voxels [B,V,T,C], num_points [B,V], coords [B,V,3] (z,y,x)."""
        B, V, T, C = voxels.shape
        mask = points_mask(num_points, T, voxels.dtype)
        denom = jnp.maximum(num_points[..., None, None], 1).astype(voxels.dtype)
        points_mean = (voxels[..., :3] * mask).sum(2, keepdims=True) / denom
        f_cluster = voxels[..., :3] - points_mean

        vx, vy = self.voxel_size
        x0, y0 = self.pc_range
        px = coords[..., 2].astype(voxels.dtype) * vx + (vx / 2 + x0)
        py = coords[..., 1].astype(voxels.dtype) * vy + (vy / 2 + y0)
        f_center = jnp.stack(
            [voxels[..., 0] - px[..., None], voxels[..., 1] - py[..., None]],
            axis=-1)

        raw = voxels[..., : self.num_input_features]
        if self.radius:
            r_bev = jnp.linalg.norm(raw[..., :2], axis=-1, keepdims=True)
            raw = jnp.concatenate([r_bev, raw[..., 2:]], axis=-1)
        features = [raw, f_cluster, f_center]
        if self.with_distance:
            features.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(features, axis=-1) * mask

        n = len(self.num_filters)
        x = x.astype(self.dtype)
        mask = mask.astype(self.dtype)
        for i, units in enumerate(self.num_filters):
            x = PFNLayer(units, last_layer=(i == n - 1),
                         dtype=self.dtype)(x, mask, train=train)
        return x  # [B, V, F]


class PointPillarsScatter(nn.Module):
    """Scatter pillar features into a dense BEV canvas [B, H, W, F].

    Two lowerings:
    - XLA scatter on linearized (y*W + x) indices (any pillar order).
    - ``sorted_pallas``: the Pallas one-hot-matmul kernel
      (ops.pallas.pillar_scatter) — ~1.8x faster on TPU, requires pillars
      in ascending key order (the device voxelizer's key-order mode).
    """

    output_shape: Tuple[int, int]  # (H, W) = (ny, nx)
    num_input_features: int = 64
    sorted_pallas: bool = False

    @nn.compact
    def __call__(self, voxel_features, coords, *, train: bool = False):
        """voxel_features [B, V, F], coords [B, V, 3] (z, y, x)."""
        import jax

        B, V, F = voxel_features.shape
        H, W = self.output_shape
        valid = coords[..., 1] >= 0
        lin = coords[..., 1] * W + coords[..., 2]  # [B, V]
        lin = jnp.where(valid, lin, H * W)  # dump slot
        if self.sorted_pallas:
            from ..ops.pallas import pillar_scatter as ps
            canvas = jax.vmap(
                lambda f, l: ps.scatter_sorted_to_canvas(f, l, hw=H * W))(
                jnp.where(valid[..., None], voxel_features, 0.0),
                lin.astype(jnp.int32))
            return canvas.reshape(B, H, W, F)
        canvas = jnp.zeros((B, H * W + 1, F), voxel_features.dtype)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
        canvas = canvas.at[bidx, lin].set(
            jnp.where(valid[..., None], voxel_features, 0.0))
        return canvas[:, : H * W].reshape(B, H, W, F)
