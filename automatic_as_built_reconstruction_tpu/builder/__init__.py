"""Builders: walk the config proto tree into runtime objects.

Mirrors the reference's factory-tree shape [ref: second/builder/ +
second/pytorch/builder/ — UNVERIFIED]: one small build() per proto message.
"""
from . import (anchor_generator_builder, box_coder_builder,
               losses_builder, optimizer_builder, second_builder,
               similarity_calculator_builder, target_assigner_builder,
               voxel_builder)
from .config_io import load_config, save_config
