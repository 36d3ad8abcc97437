"""TargetAssigner proto -> core.target_assign.TargetAssigner."""
from __future__ import annotations

from ..core.target_assign import TargetAssigner
from . import anchor_generator_builder, similarity_calculator_builder


def build(cfg, box_coder) -> TargetAssigner:
    generators = []
    classes = []
    similarity = None
    for cs in cfg.class_settings:
        generators.append(anchor_generator_builder.build(cs))
        classes.append(cs.class_name
                       or generators[-1].class_name)
        similarity = similarity_calculator_builder.build(
            cs.region_similarity_calculator)
    return TargetAssigner(
        box_coder=box_coder,
        anchor_generators=generators,
        classes=classes,
        region_similarity_calculator=similarity,
        positive_fraction=(cfg.sample_positive_fraction or None),
        sample_size=int(cfg.sample_size) or 512,
    )
