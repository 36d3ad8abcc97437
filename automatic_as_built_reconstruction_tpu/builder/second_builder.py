"""VoxelNet proto + voxelizer + target assigner -> flax model + static config.

The reference's ``second_builder.build(cfg) -> VoxelNet(nn.Module)``
[ref: second/pytorch/builder/second_builder.py — UNVERIFIED]; here the
output is (VoxelNet flax module, VoxelNetConfig, feature_map_size) since
flax modules are stateless descriptions.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from ..models import middle_plans
from ..models.voxelnet import VoxelNet, VoxelNetConfig
from ..protos import second_pb2
from . import losses_builder

_LOSS_NORM = {0: "NormByNumPositives", 1: "NormByNumExamples",
              2: "NormByNumPosNeg", 3: "DontNorm"}


def feature_map_size_from(model_cfg, grid_size) -> Tuple[int, int, int]:
    """(D=1, H, W) anchor/feature grid given middle downsample factor."""
    df = int(model_cfg.middle_feature_extractor.downsample_factor) or 1
    gx, gy = int(grid_size[0]), int(grid_size[1])
    return (1, gy // df, gx // df)


def _sparse_window_kwargs(mid) -> dict:
    """Measured per-block (subm, strided) Pallas window / subwindow
    pairs + grouped-tap flag from the MiddleFeatureExtractor message
    (performance-only: over-span joins route to the exact XLA
    fallback).  Empty fields keep the VoxelNetConfig defaults."""
    out = {}
    ws, wt = list(mid.pallas_window_subm), list(mid.pallas_window_strided)
    if ws and wt:
        if len(ws) != len(wt):
            raise ValueError(
                f"pallas_window_subm has {len(ws)} entries but "
                f"pallas_window_strided has {len(wt)} — one pair per "
                f"middle block")
        out["sparse_pallas_window"] = tuple(
            (int(a), int(b)) for a, b in zip(ws, wt))
    ss, st = (list(mid.keymatch_subwindow_subm),
              list(mid.keymatch_subwindow_strided))
    if ss and st:
        if len(ss) != len(st):
            raise ValueError(
                f"keymatch_subwindow_subm has {len(ss)} entries but "
                f"keymatch_subwindow_strided has {len(st)} — one pair "
                f"per middle block")
        out["sparse_keymatch_subwindow"] = tuple(
            (int(a), int(b)) for a, b in zip(ss, st))
    if mid.keymatch_group_taps:
        out["sparse_keymatch_group"] = True
    return out


def build(model_cfg: "second_pb2.VoxelNet", voxel_generator, target_assigner):
    grid_size = voxel_generator.grid_size  # (gx, gy, gz)
    loss = losses_builder.build(model_cfg.loss)

    vfe = model_cfg.voxel_feature_extractor
    mid = model_cfg.middle_feature_extractor
    rpn = model_cfg.rpn

    middle_filters = (tuple(mid.num_filters_down1)
                      + tuple(mid.num_filters_down2)) or (16, 32, 64)
    nb = len(middle_filters)
    is_sparse = (mid.module_class_name or "").startswith(("SpMiddle",
                                                          "SparseMiddle"))
    # exact lineage layer plan when the name has one and the grid is deep
    # enough for it (models/middle_plans.py); tiny test grids fall back to
    # the parameterized heuristic below
    grid_dhw = (int(grid_size[2]), int(grid_size[1]), int(grid_size[0]))
    middle_blocks = middle_plans.lookup(mid.module_class_name or "",
                                        grid_dhw) if is_sparse else None
    middle_zpad = middle_plans.Z_PAD if middle_blocks is not None else 0
    if is_sparse:
        # z halves every block; xy downsample spread so the total equals
        # the configured downsample_factor
        df = int(mid.downsample_factor) or 8
        n_xy = max(int(np.log2(df)), 0)
        middle_xy = tuple(2 if i < n_xy else 1 for i in range(nb))
        middle_z = tuple(2 for _ in range(nb))
        middle_layers = tuple(2 for _ in range(nb))
        if middle_blocks is not None:
            df_plan = middle_plans.xy_downsample(middle_blocks)
            if df and df != df_plan:
                print(f"WARNING: config downsample_factor {df} != lineage "
                      f"plan {mid.module_class_name} xy downsample "
                      f"{df_plan}; anchors use the config value")
    else:
        middle_xy = tuple(1 for _ in range(nb - 1)) + (2,)
        middle_z = tuple(2 for _ in range(nb))
        middle_layers = tuple(2 for _ in range(nb))

    cfg = VoxelNetConfig(
        num_class=len(target_assigner.classes),
        vfe_name=vfe.module_class_name or "SimpleVoxel",
        vfe_num_filters=tuple(vfe.num_filters) or (64,),
        num_input_features=int(model_cfg.num_point_features) or 4,
        with_distance=vfe.with_distance,
        voxel_size=tuple(voxel_generator.voxel_size),
        pc_range=tuple(voxel_generator.point_cloud_range),
        grid_size=tuple(int(g) for g in grid_size),
        middle_name=mid.module_class_name or "PointPillarsScatter",
        sparse_use_pallas_gemm=model_cfg.use_pallas_sparse_gemm,
        sparse_keymatch=model_cfg.use_keymatch_sparse_gemm,
        sparse_out_caps=(tuple(int(c) for c in mid.out_site_caps)
                         or None),
        sparse_dense_tail_blocks=int(mid.dense_tail_blocks),
        **_sparse_window_kwargs(mid),
        middle_num_filters=middle_filters,
        middle_layers_per_block=middle_layers,
        middle_z_strides=middle_z,
        middle_xy_strides=middle_xy,
        middle_blocks=middle_blocks,
        middle_zpad=middle_zpad,
        rpn_layer_nums=tuple(rpn.layer_nums) or (3, 5, 5),
        rpn_layer_strides=tuple(int(s) for s in rpn.layer_strides) or (2, 2, 2),
        rpn_num_filters=tuple(rpn.num_filters) or (128, 128, 256),
        rpn_upsample_strides=tuple(rpn.upsample_strides) or (1, 2, 4),
        rpn_num_upsample_filters=(tuple(rpn.num_upsample_filters)
                                  or (256, 256, 256)),
        num_anchor_per_loc=target_assigner.num_anchors_per_location,
        box_code_size=target_assigner.box_code_size,
        encode_background_as_zeros=model_cfg.encode_background_as_zeros,
        use_direction_classifier=model_cfg.use_direction_classifier,
        num_direction_bins=int(model_cfg.num_direction_bins) or 2,
        direction_offset=model_cfg.direction_offset,
        use_yaw_quality_head=model_cfg.use_yaw_quality_head,
        yaw_quality_weight=model_cfg.yaw_quality_weight or 1.0,
        yaw_quality_predict_power=model_cfg.yaw_quality_predict_power or 1.0,
        encode_rad_error_by_sin=model_cfg.encode_rad_error_by_sin,
        sin_error_factor=model_cfg.sin_error_factor or 1.0,
        cls_weight=loss.cls_weight,
        loc_weight=loss.loc_weight,
        dir_weight=model_cfg.direction_loss_weight or 0.2,
        pos_cls_weight=model_cfg.pos_class_weight or 1.0,
        neg_cls_weight=model_cfg.neg_class_weight or 1.0,
        focal_gamma=loss.focal_gamma,
        focal_alpha=loss.focal_alpha,
        smooth_l1_sigma=loss.smooth_l1_sigma,
        code_weights=loss.code_weights,
        loss_norm_type=_LOSS_NORM[int(model_cfg.loss_norm_type)],
        post_center_limit_range=(tuple(model_cfg.post_center_limit_range)
                                 or None),
        use_rotate_nms=model_cfg.use_rotate_nms,
        nms_pre_max_size=int(model_cfg.nms_pre_max_size) or 1000,
        nms_post_max_size=int(model_cfg.nms_post_max_size) or 100,
        nms_score_threshold=model_cfg.nms_score_threshold or 0.05,
        nms_iou_threshold=model_cfg.nms_iou_threshold or 0.5,
        nms_center_suppress_radius=model_cfg.nms_center_suppress_radius,
        yaw_point_refine_classes=tuple(
            target_assigner.classes.index(c)
            for c in model_cfg.yaw_point_refine_classes
            if c in target_assigner.classes),
        yaw_point_refine_recenter=model_cfg.yaw_point_refine_recenter,
        yaw_point_refine_trim=model_cfg.yaw_point_refine_trim,
    )
    model = VoxelNet(cfg=cfg)
    fmap = feature_map_size_from(model_cfg, grid_size)
    return model, cfg, fmap
