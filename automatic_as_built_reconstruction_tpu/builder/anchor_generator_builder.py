"""Anchor generator protos -> core.anchors generators."""
from __future__ import annotations

import numpy as np

from ..core import anchors as anchors_mod


def build(class_setting) -> object:
    """ClassSetting proto -> anchor generator (stride / range)."""
    which = class_setting.WhichOneof("anchor_generator")
    if which == "anchor_generator_stride":
        c = class_setting.anchor_generator_stride
        return anchors_mod.AnchorGeneratorStride(
            sizes=tuple(np.reshape(list(c.sizes), (-1, 3)).tolist()),
            anchor_strides=tuple(c.strides),
            anchor_offsets=tuple(c.offsets),
            rotations=tuple(c.rotations) or (0.0, np.pi / 2),
            match_threshold=c.matched_threshold,
            unmatch_threshold=c.unmatched_threshold,
            class_name=c.class_name or class_setting.class_name or "Car")
    if which == "anchor_generator_range":
        c = class_setting.anchor_generator_range
        return anchors_mod.AnchorGeneratorRange(
            sizes=tuple(np.reshape(list(c.sizes), (-1, 3)).tolist()),
            anchor_ranges=tuple(c.anchor_ranges),
            rotations=tuple(c.rotations) or (0.0, np.pi / 2),
            match_threshold=c.matched_threshold,
            unmatch_threshold=c.unmatched_threshold,
            class_name=c.class_name or class_setting.class_name or "Car")
    raise ValueError(f"unknown anchor generator {which}")
