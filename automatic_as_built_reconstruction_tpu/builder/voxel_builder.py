"""VoxelGenerator proto -> core.voxelize.VoxelGenerator."""
from __future__ import annotations

from ..core.voxelize import VoxelGenerator
from ..protos import voxel_generator_pb2


def build(cfg: "voxel_generator_pb2.VoxelGenerator") -> VoxelGenerator:
    return VoxelGenerator(
        voxel_size=tuple(cfg.voxel_size),
        point_cloud_range=tuple(cfg.point_cloud_range),
        max_num_points=int(cfg.max_number_of_points_per_voxel),
        max_voxels=int(cfg.max_number_of_voxels) or 20000,
    )
