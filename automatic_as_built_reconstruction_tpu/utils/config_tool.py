"""Programmatic config editing helpers.

[ref: second/utils/config_tool.py — lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

from google.protobuf import text_format

from ..protos import pipeline_pb2


def read_config(path):
    cfg = pipeline_pb2.TrainEvalPipelineConfig()
    with open(path) as f:
        text_format.Parse(f.read(), cfg)
    return cfg


def save_config(cfg, path):
    with open(path, "w") as f:
        f.write(text_format.MessageToString(cfg))


def change_detection_range(model_config, new_range):
    """Set a new (x0, y0, x1, y1) BEV detection range: updates the
    voxelizer's point_cloud_range and every anchor generator's ranges."""
    assert len(new_range) == 4
    vg = model_config.voxel_generator
    old = list(vg.point_cloud_range)
    vg.point_cloud_range[:] = [new_range[0], new_range[1], old[2],
                               new_range[2], new_range[3], old[5]]
    for cs in model_config.target_assigner.class_settings:
        which = cs.WhichOneof("anchor_generator")
        if which == "anchor_generator_range":
            ar = list(cs.anchor_generator_range.anchor_ranges)
            cs.anchor_generator_range.anchor_ranges[:] = [
                new_range[0], new_range[1], ar[2],
                new_range[2], new_range[3], ar[5]]
        elif which == "anchor_generator_stride":
            off = list(cs.anchor_generator_stride.offsets)
            cs.anchor_generator_stride.offsets[:] = [
                new_range[0] + 0.5 * cs.anchor_generator_stride.strides[0],
                new_range[1] + 0.5 * cs.anchor_generator_stride.strides[1],
                off[2]]
    return model_config


def get_downsample_factor(model_config) -> int:
    return int(model_config.middle_feature_extractor.downsample_factor) or 1
