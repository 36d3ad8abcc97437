"""InputReader proto -> (PrepDataset, BatchLoader).

[ref: second/pytorch/builder/input_reader_builder.py — UNVERIFIED]
"""
from __future__ import annotations

import functools

import numpy as np

from ..core import box_ops
from ..data import building  # noqa: F401 — registers BuildingDataset
from ..data import kitti_dataset  # noqa: F401 — registers KittiDataset
from ..data.dataset import get_dataset_class
from ..data.preprocess import PrepConfig, prep_pointcloud
from ..train.input_pipeline import BatchLoader, PrepDataset
from . import dbsampler_builder


def _build_dataset(ds_cfg, class_names, training=True):
    cls = get_dataset_class(ds_cfg.dataset_class_name or "KittiDataset")
    name = cls.__name__
    if name == "BuildingDataset":
        return cls(root_path=ds_cfg.kitti_root_path or None,
                   info_path=ds_cfg.kitti_info_path or None,
                   class_names=class_names or building.CLASSES,
                   num_synthetic=256 if training else 32,
                   synthetic_seed=0 if training else 7)
    return cls(root_path=ds_cfg.kitti_root_path,
               info_path=ds_cfg.kitti_info_path,
               class_names=class_names)


def _prep_config(pp, class_names, out_size_factor) -> PrepConfig:
    def pair(v, default):
        return tuple(v) if len(v) else default

    return PrepConfig(
        class_names=tuple(class_names),
        max_voxels=int(pp.max_number_of_voxels) or 12000,
        shuffle_points=pp.shuffle_points,
        gt_loc_noise_std=pair(pp.groundtruth_localization_noise_std,
                              (0.0, 0.0, 0.0)),
        gt_rotation_noise=pair(pp.groundtruth_rotation_uniform_noise,
                               (0.0, 0.0)),
        global_rotation_noise=pair(pp.global_rotation_uniform_noise,
                                   (0.0, 0.0)),
        global_scaling_noise=pair(pp.global_scaling_uniform_noise,
                                  (1.0, 1.0)),
        global_translate_noise_std=pair(pp.global_translate_noise_std,
                                        (0.0, 0.0, 0.0)),
        random_flip_x=pp.random_flip_x,
        random_flip_y=pp.random_flip_y,
        anchor_area_threshold=(pp.anchor_area_threshold
                               if pp.anchor_area_threshold else -1.0),
        min_points_in_gt=int(pp.min_num_of_points_in_gt) or -1,
        remove_points_after_sample=pp.remove_points_after_sample,
        symmetric_yaw=pp.symmetric_yaw,
        gt_points_drop_percentage=pp.groundtruth_points_drop_percentage,
        gt_drop_max_keep_points=int(pp.groundtruth_drop_max_keep_points)
        or 10,
        frustum_dropout_prob=pp.frustum_dropout_prob,
        frustum_dropout_azimuth_width=(pp.frustum_dropout_azimuth_width
                                       or float(np.pi / 12)),
        sort_voxels_by_key=pp.sort_voxels_by_key,
        out_size_factor=out_size_factor,
    )


def build(input_cfg, training: bool, voxel_generator, target_assigner,
          feature_map_size, seed: int = 0, middle_plan=None,
          capacity_shrink=None, out_caps=None):
    """Returns (PrepDataset, BatchLoader).

    ``middle_plan``: sparse-middle block plan for host rulebook precompute
    (see models.voxelnet.middle_plan / ops.rulebook_host).
    ``capacity_shrink`` / ``out_caps``: the model's capacity policy —
    bucket re-plans use out_caps VERBATIM at every bucket (matching the
    model's plan(V=bucket)) or host rulebook shapes would diverge from
    the model's plan.
    """
    class_names = list(input_cfg.class_names)
    dataset = _build_dataset(input_cfg.dataset, class_names, training)
    pp = input_cfg.preprocess
    prep_cfg = _prep_config(pp, class_names or ["Car"],
                            out_size_factor=1)

    db_sampler = None
    if training and pp.database_sampler.database_info_path:
        db_sampler = dbsampler_builder.build(
            pp.database_sampler, rng=np.random.default_rng(seed))

    # anchor cache: computed once for the fixed feature map
    ret = target_assigner.generate_anchors(feature_map_size)
    anchors = ret["anchors"].reshape(-1, 7).astype(np.float32)
    anchor_cache = {
        "anchors": anchors,
        "anchors_bv": box_ops.rbbox2d_to_near_bbox(
            anchors[:, [0, 1, 3, 4, 6]]),
        "matched_thresholds": ret["matched_thresholds"],
        "unmatched_thresholds": ret["unmatched_thresholds"],
    }

    buckets = (tuple(pp.static_shape_buckets)
               if training and len(pp.static_shape_buckets) else None)
    bucket_plans = None
    if buckets is not None:
        # the last bucket must be the full voxel capacity, or dense scans
        # would be silently truncated below max_number_of_voxels
        cap = int(pp.max_number_of_voxels) or 12000
        if max(buckets) < cap:
            print(f"WARNING: static_shape_buckets max {max(buckets)} < "
                  f"max_number_of_voxels {cap}; appending {cap} so dense "
                  f"scans keep their full voxel budget")
            buckets = tuple(sorted(set(buckets) | {cap}))
        buckets = tuple(sorted(int(b) for b in buckets))
        if middle_plan is not None:
            # per-bucket block plans: host rulebooks are built at the
            # example's own bucket and padded to the batch bucket by the
            # loader — the sparse path stops paying full capacity per
            # scan [ref: SURVEY.md §5.7]
            from ..ops import sparse_conv as sc
            grid, specs = sc.respec(middle_plan)
            # out_caps are used VERBATIM at every bucket (the model's
            # plan(V=bucket) does the same) — bucketing then saves on
            # block0's subm stack + rulebooks, while the post-expansion
            # blocks keep their measured data-dependent capacity
            bucket_plans = {b: sc.plan_from_specs(grid, b, specs,
                                                  capacity_shrink,
                                                  out_caps=out_caps)
                            for b in buckets}

    prep_fn = functools.partial(
        prep_pointcloud,
        voxel_generator=voxel_generator,
        target_assigner=target_assigner,
        prep_cfg=prep_cfg,
        training=training,
        anchor_cache=anchor_cache,
        db_sampler=db_sampler,
        middle_plan=middle_plan,
        middle_plan_buckets=bucket_plans,
    )
    prep_ds = PrepDataset(dataset,
                          lambda sd, rng: prep_fn(sd, rng=rng))
    loader = BatchLoader(
        prep_ds,
        batch_size=int(input_cfg.batch_size) or 2,
        shuffle=training,
        num_workers=int(input_cfg.num_workers) or 1,
        seed=seed,
        repeat=training,
        drop_last=training,
        buckets=buckets,
        bucket_plans=bucket_plans,
        process_workers=input_cfg.process_workers,
    )
    return prep_ds, loader
