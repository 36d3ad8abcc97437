"""DatabaseSampler proto -> core.sample_ops.DataBaseSampler."""
from __future__ import annotations

import functools
import pathlib

from ..core import sample_ops


def build(cfg, rng=None):
    if not cfg.database_info_path:
        return None
    prep_steps = []
    for step in cfg.database_prep_steps:
        which = step.WhichOneof("database_preprocessing_step")
        if which == "filter_by_min_num_points":
            pairs = dict(step.filter_by_min_num_points.min_num_point_pairs)
            prep_steps.append(functools.partial(
                sample_ops.filter_by_min_num_points, min_points=pairs))
        elif which == "filter_by_difficulty":
            removed = list(step.filter_by_difficulty.removed_difficulties)
            prep_steps.append(functools.partial(
                sample_ops.filter_by_difficulty, removed=removed))
    groups = [dict(g.name_to_max_num) for g in cfg.sample_groups]
    grot = list(cfg.global_random_rotation_range_per_object) or None
    # gt-database object files are recorded relative to the dataset root
    # = the dbinfos pickle's own directory (create_data writes both there)
    root = pathlib.Path(cfg.database_info_path).resolve().parent
    return sample_ops.DataBaseSampler.from_info_path(
        cfg.database_info_path, groups, root_path=root,
        rate=cfg.rate or 1.0, prep_steps=prep_steps,
        global_rot_range=grot, rng=rng)
