"""Middle feature extractors: voxel features -> dense BEV canvas.

Two families:
- ``PointPillarsScatter`` (in ``pointpillars.py``): zero-depth scatter.
- 3D middle extractors (this file): consume (voxel_features, coords) over a
  [D, H, W] grid, downsample z, emit [B, H', W', C*D'] BEV features.
  ``DenseMiddle`` scatters into a dense 5-D tensor and runs XLA 3D convs —
  exact semantics, fine for small grids and as the parity oracle for the
  sparse path.  ``SpMiddle*`` (ops/sparse_conv) is the TPU sparse
  gather-GEMM-scatter pipeline for full-size grids.

[ref: second/pytorch/models/middle.py (SpMiddleFHD et al.) — UNVERIFIED]
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def scatter_to_dense(voxel_features, coords, grid_dhw):
    """[B,V,F] + [B,V,3] (z,y,x; -1 pad) -> dense [B, D, H, W, F]."""
    B, V, F = voxel_features.shape
    D, H, W = grid_dhw
    valid = coords[..., 0] >= 0
    lin = ((coords[..., 0] * H + coords[..., 1]) * W + coords[..., 2])
    lin = jnp.where(valid, lin, D * H * W)
    dense = jnp.zeros((B, D * H * W + 1, F), voxel_features.dtype)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
    dense = dense.at[bidx, lin].set(
        jnp.where(valid[..., None], voxel_features, 0.0))
    return dense[:, : D * H * W].reshape(B, D, H, W, F)


class DenseMiddle(nn.Module):
    """Dense 3D-conv middle extractor (reference semantics of SpMiddleFHD).

    Conv plan per block: optional submanifold-style stride-1 convs then one
    strided conv (z always downsampled; xy per ``xy_strides``).  Final
    output reshapes depth into channels: [B, H', W', C * D'].
    """

    grid_dhw: Tuple[int, int, int]  # (D, H, W) input grid
    num_input_features: int = 4
    num_filters: Sequence[int] = (16, 32, 64)
    layers_per_block: Sequence[int] = (2, 2, 2)
    z_strides: Sequence[int] = (2, 2, 2)
    xy_strides: Sequence[int] = (1, 1, 2)

    @nn.compact
    def __call__(self, voxel_features, coords, *, train: bool = False):
        x = scatter_to_dense(voxel_features, coords, self.grid_dhw)
        for f, n, zs, xys in zip(self.num_filters, self.layers_per_block,
                                 self.z_strides, self.xy_strides):
            for _ in range(n):
                x = nn.Conv(f, (3, 3, 3), padding=1, use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3)(x)
                x = nn.relu(x)
            x = nn.Conv(f, (3, 3, 3), strides=(zs, xys, xys), padding=1,
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x)
            x = nn.relu(x)
        B, D, H, W, C = x.shape
        return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)
