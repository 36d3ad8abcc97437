"""Voxel feature encoders (VFE stage).

All encoders consume batched padded voxels [B, V, T, C] with per-voxel point
counts and emit [B, V, F] voxel features.  Masked math everywhere — padding
lanes never contribute (TPU static-shape discipline).

[ref: second/pytorch/models/voxel_encoder.py — lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def points_mask(num_points, max_points: int, dtype=jnp.float32):
    """[B, V] counts -> [B, V, T, 1] validity mask."""
    ids = jnp.arange(max_points)
    return (ids[None, None, :] < num_points[..., None]).astype(dtype)[..., None]


class SimpleVoxel(nn.Module):
    """Mean-of-points VFE — what SECOND actually runs.

    Returns the mean of each voxel's points over its first
    ``num_input_features`` channels: [B, V, C].
    """

    num_input_features: int = 4

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, *, train: bool = False):
        mask = points_mask(num_points, voxels.shape[2], voxels.dtype)
        pts = voxels[..., : self.num_input_features] * mask
        denom = jnp.maximum(num_points[..., None], 1).astype(voxels.dtype)
        return pts.sum(axis=2) / denom


class SimpleVoxelRadius(nn.Module):
    """Mean-of-points VFE with the BEV position folded to a radius:
    emits [sqrt(mean_x^2 + mean_y^2), mean_z, mean_extra...] — the
    lineage's rotation-invariant SimpleVoxel variant.

    [ref: second/pytorch/models/voxel_encoder.py::SimpleVoxelRadius —
    lineage-expected, UNVERIFIED]
    """

    num_input_features: int = 4

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, *,
                 train: bool = False):
        mask = points_mask(num_points, voxels.shape[2], voxels.dtype)
        pts = voxels[..., : self.num_input_features] * mask
        denom = jnp.maximum(num_points[..., None], 1).astype(voxels.dtype)
        mean = pts.sum(axis=2) / denom
        radius = jnp.linalg.norm(mean[..., :2], axis=-1, keepdims=True)
        return jnp.concatenate([radius, mean[..., 2:]], axis=-1)


class VFELayer(nn.Module):
    """VoxelNet-paper VFE layer: pointwise FC+BN+ReLU, concat max-pooled
    voxel context back onto each point."""

    out_channels: int  # channels after concat (FC emits half)

    @nn.compact
    def __call__(self, inputs, mask, *, train: bool):
        units = self.out_channels // 2
        x = nn.Dense(units, use_bias=False)(inputs)  # [B, V, T, units]
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        x = x * mask
        x_max = jnp.max(x, axis=2, keepdims=True)  # [B, V, 1, units]
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_repeat], axis=-1)  # [B, V, T, out]


class VoxelFeatureExtractor(nn.Module):
    """Stacked VFE layers + final FC + max-pool (VoxelNet paper encoder)."""

    num_input_features: int = 4
    num_filters: Sequence[int] = (32, 128)
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, *, train: bool = False):
        B, V, T, C = voxels.shape
        mask = points_mask(num_points, T, voxels.dtype)
        denom = jnp.maximum(num_points[..., None, None], 1).astype(voxels.dtype)
        points_mean = (voxels[..., :3] * mask).sum(2, keepdims=True) / denom
        features = [voxels, voxels[..., :3] - points_mean * mask]
        if self.with_distance:
            features.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(features, axis=-1) * mask
        for nf in self.num_filters:
            x = VFELayer(nf)(x, mask, train=train)
            x = x * mask
        x = nn.Dense(self.num_filters[-1], use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        x = jnp.where(mask > 0, x, -jnp.inf)
        x = jnp.max(x, axis=2)  # [B, V, F]
        # fully-empty voxels (padding) -> 0
        return jnp.where(jnp.isfinite(x), x, 0.0)


class VoxelFeatureExtractorV2(nn.Module):
    """Arbitrary-depth VFE stack whose LAST layer max-pools directly —
    no trailing FC+BN, unlike :class:`VoxelFeatureExtractor`.

    [ref: second/pytorch/models/voxel_encoder.py::VoxelFeatureExtractorV2
    — lineage-expected, UNVERIFIED]
    """

    num_input_features: int = 4
    num_filters: Sequence[int] = (32, 128)
    with_distance: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords=None, *, train: bool = False):
        B, V, T, C = voxels.shape
        mask = points_mask(num_points, T, voxels.dtype)
        denom = jnp.maximum(num_points[..., None, None], 1).astype(voxels.dtype)
        points_mean = (voxels[..., :3] * mask).sum(2, keepdims=True) / denom
        features = [voxels, voxels[..., :3] - points_mean * mask]
        if self.with_distance:
            features.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(features, axis=-1) * mask
        for nf in self.num_filters[:-1]:
            x = VFELayer(nf)(x, mask, train=train)
            x = x * mask
        # final layer: FC half-width + BN + ReLU, then pool (no concat)
        units = self.num_filters[-1]
        x = nn.Dense(units, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3)(x)
        x = nn.relu(x)
        x = jnp.where(mask > 0, x, -jnp.inf)
        x = jnp.max(x, axis=2)
        return jnp.where(jnp.isfinite(x), x, 0.0)
