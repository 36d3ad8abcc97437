"""Anchor generators: dense BEV anchor grids per class.

[ref: second/core/anchor_generator.py — lineage-expected path, UNVERIFIED]
"""
from __future__ import annotations

import dataclasses

import numpy as np

from . import box_ops


@dataclasses.dataclass
class AnchorGeneratorStride:
    sizes: tuple = ((1.6, 3.9, 1.56),)
    anchor_strides: tuple = (0.4, 0.4, 0.0)
    anchor_offsets: tuple = (0.2, -39.8, -1.78)
    rotations: tuple = (0.0, np.pi / 2)
    match_threshold: float = 0.6
    unmatch_threshold: float = 0.45
    class_name: str = "Car"
    dtype: type = np.float32

    @property
    def num_anchors_per_localization(self) -> int:
        return len(self.rotations) * (np.asarray(self.sizes).reshape(-1, 3).shape[0])

    def generate(self, feature_map_size):
        return box_ops.create_anchors_3d_stride(
            feature_map_size, self.sizes, self.anchor_strides,
            self.anchor_offsets, self.rotations, self.dtype)


@dataclasses.dataclass
class AnchorGeneratorRange:
    anchor_ranges: tuple = (0, -40.0, -1.0, 70.4, 40.0, -1.0)
    sizes: tuple = ((1.6, 3.9, 1.56),)
    rotations: tuple = (0.0, np.pi / 2)
    match_threshold: float = 0.6
    unmatch_threshold: float = 0.45
    class_name: str = "Car"
    dtype: type = np.float32

    @property
    def num_anchors_per_localization(self) -> int:
        return len(self.rotations) * (np.asarray(self.sizes).reshape(-1, 3).shape[0])

    def generate(self, feature_map_size):
        return box_ops.create_anchors_3d_range(
            feature_map_size, self.anchor_ranges, self.sizes,
            self.rotations, self.dtype)
