"""VoxelNet — the single top-level model (three swappable stages).

Functional split (TPU-idiomatic, unlike the reference's monolithic
``nn.Module.forward`` [ref: second/pytorch/models/voxelnet.py —
UNVERIFIED]):

- :class:`VoxelNet` (flax): ``network_forward`` only — VFE -> middle -> RPN
  -> prediction maps.  No loss / no NMS inside the module, so one set of
  params serves jit-compiled train, eval, and sharded-inference programs.
- :func:`compute_loss`: pure fn of (preds, example) — focal cls + smooth-L1
  reg (sin-difference yaw) + direction CE.
- :func:`predict`: pure fn — decode, score, per-class rotated NMS; static
  output slots.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import box_jax, nms_jax
from . import losses as losses_mod
from .middle import DenseMiddle, SparseMiddle
from .pointpillars import PillarFeatureNet, PointPillarsScatter
from .rpn import RPN
from .voxel_encoder import (SimpleVoxel, SimpleVoxelRadius,
                            VoxelFeatureExtractor, VoxelFeatureExtractorV2)

VFE_REGISTRY = {
    "SimpleVoxel": SimpleVoxel,
    "SimpleVoxelRadius": SimpleVoxelRadius,
    "VoxelFeatureExtractor": VoxelFeatureExtractor,
    "VoxelFeatureExtractorV2": VoxelFeatureExtractorV2,
    "PillarFeatureNet": PillarFeatureNet,
    # PillarFeatureNet with the absolute BEV position folded to a radius
    "PillarFeatureNetRadius": PillarFeatureNet,
}

# every lineage SpMiddle* spelling builds the TPU sparse stack; the exact
# per-variant layer plan comes from models/middle_plans.py (wired in by
# second_builder as cfg.middle_blocks), falling back to the parameterized
# config fields for grids too small for the lineage plan
MIDDLE_REGISTRY = {
    "PointPillarsScatter": PointPillarsScatter,
    "DenseMiddle": DenseMiddle,
    "SparseMiddle": SparseMiddle,
    "SpMiddleFHD": SparseMiddle,
    "SpMiddleFHDV2": SparseMiddle,
    "SpMiddleFHDLite": SparseMiddle,
    "SpMiddleD4HD": SparseMiddle,
    "SpMiddleD4HDLite": SparseMiddle,
    "SpMiddleD8HD": SparseMiddle,
    "SpMiddle2K": SparseMiddle,
    "SpMiddle2KMerged": SparseMiddle,
}


def num_middle_blocks(cfg: "VoxelNetConfig") -> int:
    """Block count of the sparse middle stack (explicit plan wins)."""
    if cfg.middle_blocks is not None:
        return len(cfg.middle_blocks)
    return len(cfg.middle_num_filters)


def middle_plan(cfg: "VoxelNetConfig", v_cap: int):
    """Sparse middle-stack block plan for a config, or None if the middle
    extractor is dense/pillar.  Used by the input pipeline to precompute
    rulebooks on host (ops.rulebook_host)."""
    from ..ops import sparse_conv as sc
    if MIDDLE_REGISTRY.get(cfg.middle_name) is not SparseMiddle:
        return None
    grid_dhw = (cfg.grid_size[2] + cfg.middle_zpad, cfg.grid_size[1],
                cfg.grid_size[0])
    if cfg.middle_blocks is not None:
        specs = tuple(sc.BlockSpec(*b) for b in cfg.middle_blocks)
        return sc.plan_from_specs(grid_dhw, v_cap, specs,
                                  cfg.sparse_capacity_shrink,
                                  out_caps=cfg.sparse_out_caps)
    return sc.make_plan(grid_dhw, v_cap, cfg.middle_num_filters,
                        cfg.middle_layers_per_block, cfg.middle_z_strides,
                        cfg.middle_xy_strides, cfg.sparse_capacity_shrink,
                        out_caps=cfg.sparse_out_caps)


@dataclasses.dataclass(frozen=True)
class VoxelNetConfig:
    """Static model config (hashable — safe as a jit static arg)."""

    num_class: int = 1
    # VFE
    vfe_name: str = "PillarFeatureNet"
    vfe_num_filters: Tuple[int, ...] = (64,)
    num_input_features: int = 4
    with_distance: bool = False
    # geometry
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 4.0)
    pc_range: Tuple[float, ...] = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    grid_size: Tuple[int, int, int] = (352, 400, 1)  # (gx, gy, gz)
    # middle
    middle_name: str = "PointPillarsScatter"
    middle_num_filters: Tuple[int, ...] = (16, 32, 64)
    middle_layers_per_block: Tuple[int, ...] = (2, 2, 2)
    middle_z_strides: Tuple[int, ...] = (2, 2, 2)
    middle_xy_strides: Tuple[int, ...] = (1, 1, 2)
    # exact lineage layer plan (tuple of BlockSpec tuples; overrides the
    # four parameterized fields above — set by second_builder for lineage
    # SpMiddle* names via models/middle_plans.py)
    middle_blocks: Optional[Tuple[Tuple, ...]] = None
    # extra z cells added to the sparse grid (the lineage
    # sparse_shape = grid + [1, 0, 0] convention)
    middle_zpad: int = 0
    # RPN
    rpn_layer_nums: Tuple[int, ...] = (3, 5, 5)
    rpn_layer_strides: Tuple[int, ...] = (2, 2, 2)
    rpn_num_filters: Tuple[int, ...] = (64, 128, 256)
    rpn_upsample_strides: Tuple[float, ...] = (1, 2, 4)
    rpn_num_upsample_filters: Tuple[int, ...] = (128, 128, 128)
    num_anchor_per_loc: int = 2
    box_code_size: int = 7
    encode_background_as_zeros: bool = True
    use_direction_classifier: bool = True
    num_direction_bins: int = 2
    direction_offset: float = 0.0
    encode_rad_error_by_sin: bool = True
    sin_error_factor: float = 1.0
    # losses
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    dir_weight: float = 0.2
    # yaw-quality head: per-anchor logit trained against
    # |cos(pred_yaw - gt_yaw)| on positives, multiplied into the
    # detection score at predict time (thin-class yaw-ranking fix)
    use_yaw_quality_head: bool = False
    yaw_quality_weight: float = 1.0
    # predict-time calibration: score *= sigmoid(quality) ** power.
    # power > 1 sharpens the yaw-quality discrimination between a
    # correctly-oriented detection and its wrong-yaw duplicate.
    yaw_quality_predict_power: float = 1.0
    # post-NMS greedy same-class suppression by BEV center distance
    # (meters; 0 disables) — kills wrong-yaw duplicates of thin boxes
    # that rotated NMS can't see (near-zero mutual IoU, same center)
    nms_center_suppress_radius: float = 0.0
    # host-side post-NMS point-evidence pose refinement (class indices,
    # 0-based): snap thin planar elements' yaw (+ centre with recenter)
    # onto the local supporting point plane at eval/serving time
    # (core.point_refine) — runs OUTSIDE the jit program
    yaw_point_refine_classes: tuple = ()
    yaw_point_refine_recenter: bool = False
    yaw_point_refine_trim: bool = False
    pos_cls_weight: float = 1.0
    neg_cls_weight: float = 1.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_sigma: float = 3.0
    code_weights: Optional[Tuple[float, ...]] = None
    loss_norm_type: str = "NormByNumPositives"
    # performance
    compute_dtype: str = "float32"        # "bfloat16" for MXU-rate convs
    pillar_scatter_sorted: bool = False   # pillars arrive key-sorted ->
                                          # Pallas one-hot-matmul scatter
    # flat-VFE serving: boundary-arithmetic segment mean/max instead of
    # XLA segment ops (scatter-free; see PillarFeatureNet.segment_scan)
    flat_segment_scan: bool = False
    sparse_use_pallas_gemm: bool = False  # sparse middle gather-GEMM via
                                          # ops/pallas/sparse_gather_gemm
    sparse_pallas_tile: int = 256         # Pallas kernel rows per tile
    sparse_pallas_window: Union[int, Tuple[int, ...]] = 768
                                          # Pallas DMA window (see
                                          # sgg.choose_window); a tuple
                                          # gives each middle BLOCK its
                                          # own window — the one-hot
                                          # gather costs tile*window*Cin
                                          # per tap, so per-block sizing
                                          # (sgg.choose_windows) cuts the
                                          # dominant blocks' work vs one
                                          # global worst-case window
    sparse_keymatch: bool = False         # join keys INSIDE the kernel
                                          # (serving: no rulebook build)
    sparse_keymatch_subwindow: Union[int, Tuple] = 0
                                          # per-tap subwindow of the
                                          # shared DMA window (0 = off;
                                          # sgg.choose_keymatch_subwindow)
                                          # — same structure as
                                          # sparse_pallas_window, incl.
                                          # (subm, strided) pairs
    sparse_keymatch_group: bool = False   # grouped-tap kernel: stack
                                          # each (dy, dx) column's kz
                                          # dz-taps into one gather +
                                          # one accumulate matmul
                                          # (needs the subwindow mode)
    sparse_capacity_shrink: Optional[float] = None
                                          # middle active-site capacity
                                          # multiplier per strided conv;
                                          # None -> expansion-aware
                                          # heuristic (strided SparseConv
                                          # DILATES the active set ~3x)
    sparse_out_caps: Optional[Tuple[int, ...]] = None
                                          # exact per-block site caps
                                          # measured from data
                                          # (sc.measure_site_caps /
                                          # out_site_caps config field)
    sparse_dense_tail_blocks: int = 0     # run the last N middle blocks
                                          # as masked DENSE convs: past
                                          # ~4% active-site density the
                                          # one-hot gather costs more
                                          # MXU work than a plain dense
                                          # conv (tools/span_analysis.py)
    # post-processing
    post_center_limit_range: Optional[Tuple[float, ...]] = None
    nms_class_agnostic: bool = False
    use_rotate_nms: bool = True
    nms_pre_max_size: int = 1000
    nms_post_max_size: int = 100
    nms_score_threshold: float = 0.05
    nms_iou_threshold: float = 0.5

    @property
    def bev_shape(self) -> Tuple[int, int]:
        return (self.grid_size[1], self.grid_size[0])  # (H=ny, W=nx)


class VoxelNet(nn.Module):
    """VFE -> middle -> RPN.  Returns raw prediction maps."""

    cfg: VoxelNetConfig

    @nn.compact
    def __call__(self, voxels, num_points, coords, *, train: bool = False,
                 middle_rulebooks=None, return_stages: bool = False,
                 flat_points=None, flat_slot=None,
                 flat_slots_sorted: bool = False):
        """``middle_rulebooks``: optional host-precomputed sparse-conv
        rulebooks (see ``ops.rulebook_host``) — only meaningful for the
        sparse middle extractors.

        ``flat_points``/``flat_slot`` (from
        ``ops.voxelize_jax.voxelize_flat``): point-major pillar VFE path
        — skips the >90%-padded [B,V,T,*] intermediates (see
        ``PillarFeatureNet`` flat mode).  ``voxels`` may be None then.
        Pillar encoders only.

        ``return_stages``: also return the per-stage intermediate tensors
        (for the reference-style ``--measure_time`` breakdown — timing a
        jit program that returns only an earlier stage DCEs the rest
        [ref: second/pytorch/train.py --measure_time])."""
        cfg = self.cfg
        vfe_cls = VFE_REGISTRY[cfg.vfe_name]
        if vfe_cls is PillarFeatureNet:
            vfe = vfe_cls(num_input_features=cfg.num_input_features,
                          num_filters=cfg.vfe_num_filters,
                          with_distance=cfg.with_distance,
                          voxel_size=cfg.voxel_size[:2],
                          pc_range=cfg.pc_range[:2],
                          radius=cfg.vfe_name.endswith("Radius"),
                          segment_scan=cfg.flat_segment_scan,
                          dtype=(jnp.bfloat16
                                 if cfg.compute_dtype == "bfloat16"
                                 else jnp.float32))
        elif vfe_cls in (VoxelFeatureExtractor, VoxelFeatureExtractorV2):
            vfe = vfe_cls(num_input_features=cfg.num_input_features,
                          num_filters=cfg.vfe_num_filters,
                          with_distance=cfg.with_distance)
        else:
            vfe = vfe_cls(num_input_features=cfg.num_input_features)
        if flat_points is not None:
            if vfe_cls is not PillarFeatureNet:
                raise NotImplementedError(
                    "flat point input is a pillar-encoder path")
            voxel_features = vfe(None, num_points, coords, train=train,
                                 flat_points=flat_points,
                                 flat_slot=flat_slot,
                                 flat_slots_sorted=flat_slots_sorted)
        else:
            voxel_features = vfe(voxels, num_points, coords, train=train)

        if cfg.middle_name == "PointPillarsScatter":
            middle = PointPillarsScatter(
                output_shape=cfg.bev_shape,
                num_input_features=cfg.vfe_num_filters[-1],
                sorted_pallas=cfg.pillar_scatter_sorted)
            spatial = middle(voxel_features, coords, train=train)
        else:
            middle_cls = MIDDLE_REGISTRY[cfg.middle_name]
            grid_dhw = (cfg.grid_size[2], cfg.grid_size[1], cfg.grid_size[0])
            kwargs = {}
            if middle_cls is SparseMiddle:
                kwargs["dtype"] = (jnp.bfloat16
                                   if cfg.compute_dtype == "bfloat16"
                                   else jnp.float32)
                kwargs["use_pallas_gemm"] = cfg.sparse_use_pallas_gemm
                kwargs["pallas_tile"] = cfg.sparse_pallas_tile
                kwargs["pallas_window"] = cfg.sparse_pallas_window
                kwargs["use_keymatch"] = cfg.sparse_keymatch
                kwargs["keymatch_subwindow"] = \
                    cfg.sparse_keymatch_subwindow
                kwargs["keymatch_group"] = cfg.sparse_keymatch_group
                kwargs["blocks"] = cfg.middle_blocks
                kwargs["capacity_shrink"] = cfg.sparse_capacity_shrink
                kwargs["out_caps"] = cfg.sparse_out_caps
                kwargs["dense_tail_blocks"] = cfg.sparse_dense_tail_blocks
                grid_dhw = (grid_dhw[0] + cfg.middle_zpad, grid_dhw[1],
                            grid_dhw[2])
            middle = middle_cls(
                grid_dhw=grid_dhw,
                num_input_features=voxel_features.shape[-1],
                num_filters=cfg.middle_num_filters,
                layers_per_block=cfg.middle_layers_per_block,
                z_strides=cfg.middle_z_strides,
                xy_strides=cfg.middle_xy_strides, **kwargs)
            if isinstance(middle, SparseMiddle):
                spatial = middle(voxel_features, coords, train=train,
                                 rulebooks=middle_rulebooks)
            else:
                spatial = middle(voxel_features, coords, train=train)

        if cfg.compute_dtype == "bfloat16":
            spatial = spatial.astype(jnp.bfloat16)
        rpn = RPN(layer_nums=cfg.rpn_layer_nums,
                  layer_strides=cfg.rpn_layer_strides,
                  num_filters=cfg.rpn_num_filters,
                  upsample_strides=cfg.rpn_upsample_strides,
                  num_upsample_filters=cfg.rpn_num_upsample_filters,
                  num_anchor_per_loc=cfg.num_anchor_per_loc,
                  num_class=cfg.num_class,
                  box_code_size=cfg.box_code_size,
                  use_direction_classifier=cfg.use_direction_classifier,
                  num_direction_bins=cfg.num_direction_bins,
                  encode_background_as_zeros=cfg.encode_background_as_zeros,
                  use_yaw_quality=cfg.use_yaw_quality_head,
                  dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                         else jnp.float32))
        preds = rpn(spatial, train=train)
        preds = {k: v.astype(jnp.float32) for k, v in preds.items()}
        if return_stages:
            return preds, {"voxel_features": voxel_features,
                           "spatial_features": spatial}
        return preds


# ---------------------------------------------------------------------------
# loss (pure)
# ---------------------------------------------------------------------------


def _flatten_preds(preds: Dict[str, jax.Array], cfg: VoxelNetConfig):
    """[B,H,W,A*c] maps -> [B, H*W*A, c] aligned with the anchor axis."""
    out = {}
    B = preds["box_preds"].shape[0]
    out["box_preds"] = preds["box_preds"].reshape(B, -1, cfg.box_code_size)
    ncls = (cfg.num_class if cfg.encode_background_as_zeros
            else cfg.num_class + 1)
    out["cls_preds"] = preds["cls_preds"].reshape(B, -1, ncls)
    if "dir_cls_preds" in preds:
        out["dir_cls_preds"] = preds["dir_cls_preds"].reshape(
            B, -1, cfg.num_direction_bins)
    if "quality_preds" in preds:
        out["quality_preds"] = preds["quality_preds"].reshape(B, -1)
    return out


def compute_loss(preds: Dict[str, jax.Array], example: Dict[str, jax.Array],
                 cfg: VoxelNetConfig) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Total loss + per-term metrics.

    example: labels [B,A] int32, reg_targets [B,A,code], anchors [B,A,7].
    """
    p = _flatten_preds(preds, cfg)
    labels = example["labels"]
    reg_targets = example["reg_targets"]

    cls_weights, reg_weights, cared = losses_mod.prepare_loss_weights(
        labels, cfg.pos_cls_weight, cfg.neg_cls_weight, cfg.loss_norm_type)

    # classification: one-hot with background dropped
    cls_targets = jnp.where(cared, labels, 0)
    one_hot = jax.nn.one_hot(cls_targets, cfg.num_class + 1,
                             dtype=p["cls_preds"].dtype)
    if cfg.encode_background_as_zeros:
        one_hot = one_hot[..., 1:]
    focal = losses_mod.SigmoidFocalClassificationLoss(
        gamma=cfg.focal_gamma, alpha=cfg.focal_alpha)
    cls_losses = focal(p["cls_preds"], one_hot, cls_weights)
    cls_loss = cls_losses.sum() / labels.shape[0]

    # localization: sin-difference on yaw
    box_preds = p["box_preds"]
    if cfg.encode_rad_error_by_sin:
        box_preds_s, reg_targets_s = box_jax.add_sin_difference(
            box_preds, reg_targets)
    else:
        box_preds_s, reg_targets_s = box_preds, reg_targets
    smooth_l1 = losses_mod.WeightedSmoothL1LocalizationLoss(
        sigma=cfg.smooth_l1_sigma, code_weights=cfg.code_weights)
    loc_losses = smooth_l1(box_preds_s, reg_targets_s, reg_weights)
    loc_loss = loc_losses.sum() / labels.shape[0]

    total = cfg.cls_weight * cls_loss + cfg.loc_weight * loc_loss
    metrics = {"loss_cls": cls_loss, "loss_loc": loc_loss}

    if cfg.use_direction_classifier:
        dir_targets = box_jax.get_direction_target(
            example["anchors"], reg_targets, cfg.direction_offset,
            cfg.num_direction_bins)
        dir_one_hot = jax.nn.one_hot(dir_targets, cfg.num_direction_bins,
                                     dtype=p["dir_cls_preds"].dtype)
        dir_w = (labels > 0).astype(box_preds.dtype)
        dir_w = dir_w / jnp.maximum(dir_w.sum(-1, keepdims=True), 1.0)
        softmax_loss = losses_mod.WeightedSoftmaxClassificationLoss()
        dir_loss = softmax_loss(p["dir_cls_preds"], dir_one_hot,
                                dir_w).sum() / labels.shape[0]
        total = total + cfg.dir_weight * dir_loss
        metrics["loss_dir"] = dir_loss

    if cfg.use_yaw_quality_head and "quality_preds" in p:
        # quality target: |cos(pred_yaw - gt_yaw)| per positive anchor.
        # Both yaws are residuals against the same anchor, so their
        # difference IS the prediction's yaw error; |cos| folds the
        # 180-degree ambiguity (the direction head owns the sign) and
        # hits 0 at perpendicular — exactly the wrong-yaw-duplicate
        # failure the head must learn to score down.  The box head is
        # stop-gradiented: quality grades the yaw estimate, it must not
        # steer it.
        yaw_err = (jax.lax.stop_gradient(box_preds[..., 6])
                   - reg_targets[..., 6])
        q_target = jnp.abs(jnp.cos(yaw_err))
        q_logits = p["quality_preds"]
        q_bce = optax_sigmoid_bce(q_logits, q_target)
        pos_w = (labels > 0).astype(q_bce.dtype)
        pos_w = pos_w / jnp.maximum(pos_w.sum(-1, keepdims=True), 1.0)
        quality_loss = (q_bce * pos_w).sum() / labels.shape[0]
        total = total + cfg.yaw_quality_weight * quality_loss
        metrics["loss_quality"] = quality_loss

    metrics["loss"] = total
    return total, metrics


def optax_sigmoid_bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable sigmoid BCE with soft targets."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


# ---------------------------------------------------------------------------
# predict (pure)
# ---------------------------------------------------------------------------


def predict(preds: Dict[str, jax.Array], anchors: jax.Array,
            cfg: VoxelNetConfig,
            anchors_mask: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Decode + score-threshold + per-class rotated NMS.

    Args:
        preds: raw RPN maps.
        anchors: [B, A, 7].
        anchors_mask: optional [B, A] bool.

    Returns (static shapes, D = nms_post_max_size per class):
        boxes [B, K, 7], scores [B, K], labels [B, K] (int, 0-based class),
        valid [B, K] with K = num_class * post_max_size.
    """
    p = _flatten_preds(preds, cfg)
    box_preds = p["box_preds"].astype(jnp.float32)
    cls_preds = p["cls_preds"].astype(jnp.float32)

    if cfg.encode_background_as_zeros:
        scores_all = jax.nn.sigmoid(cls_preds)  # [B, A, num_class]
    else:
        scores_all = jax.nn.softmax(cls_preds, axis=-1)[..., 1:]

    if cfg.use_yaw_quality_head and "quality_preds" in p:
        # rank by cls_score * yaw_quality BEFORE top-k: wrong-yaw
        # duplicates drop below the correctly-oriented box instead of
        # outscoring it (the thin-class door failure)
        quality = jax.nn.sigmoid(p["quality_preds"].astype(jnp.float32))
        if cfg.yaw_quality_predict_power != 1.0:
            quality = quality ** cfg.yaw_quality_predict_power
        scores_all = scores_all * quality[..., None]

    if anchors_mask is not None:
        scores_all = jnp.where(anchors_mask[..., None], scores_all, 0.0)

    B, A = box_preds.shape[:2]
    C = cfg.num_class
    D = cfg.nms_post_max_size
    pre = min(cfg.nms_pre_max_size, A)

    # Top-k FIRST (scores only), then decode / dir-fix / NMS just the k
    # winners per (sample, class) row: the decode+dir work and all
    # box-sized intermediates shrink from the full anchor grid (~100k)
    # to nms_pre_max_size (~1k).  Selection is identical — decode does
    # not change scores.  (sample, class) flattens to R rows of one
    # batched NMS problem so the whole batch shares a single
    # pruned-vs-dense branch decision (a per-row lax.cond under vmap
    # would run BOTH branches).
    sc = jnp.moveaxis(scores_all, -1, 1)                  # [B, C, A]
    sc = jnp.where(sc >= cfg.nms_score_threshold, sc, -jnp.inf)
    top_sc, top_idx = jax.vmap(
        lambda s: jax.lax.top_k(s, pre))(sc.reshape(B * C, A))

    idx_b = top_idx.reshape(B, C * pre)                   # anchor ids
    gathered_bp = jnp.take_along_axis(box_preds, idx_b[..., None], axis=1)
    gathered_an = jnp.take_along_axis(anchors, idx_b[..., None], axis=1)
    boxes_top = box_jax.second_box_decode(gathered_bp, gathered_an)

    if cfg.use_direction_classifier:
        gathered_dir = jnp.take_along_axis(
            p["dir_cls_preds"].astype(jnp.float32),
            idx_b[..., None], axis=1)
        dir_labels = jnp.argmax(gathered_dir, axis=-1)
        period = 2 * jnp.pi / cfg.num_direction_bins
        dir_rot = box_jax.limit_period(
            boxes_top[..., 6] - cfg.direction_offset, 0.0, period)
        yaw = (dir_rot + cfg.direction_offset
               + period * dir_labels.astype(jnp.float32))
        boxes_top = boxes_top.at[..., 6].set(yaw)

    if cfg.post_center_limit_range:
        lim = cfg.post_center_limit_range
        centers_ok = ((boxes_top[..., 0] >= lim[0])
                      & (boxes_top[..., 1] >= lim[1])
                      & (boxes_top[..., 2] >= lim[2])
                      & (boxes_top[..., 0] <= lim[3])
                      & (boxes_top[..., 1] <= lim[4])
                      & (boxes_top[..., 2] <= lim[5]))
        top_sc = jnp.where(centers_ok.reshape(B * C, pre), top_sc,
                           -jnp.inf)

    boxes_r = boxes_top.reshape(B * C, pre, boxes_top.shape[-1])
    bev = boxes_r[:, :, jnp.array([0, 1, 3, 4, 6])]
    if cfg.use_rotate_nms:
        idx, valid = nms_jax.rotate_nms_presorted(
            bev, top_sc, cfg.nms_iou_threshold, post_max_size=D)
    else:
        near = jax.vmap(nms_jax.rbbox_to_near_bbox)(bev)
        idx, valid = nms_jax.nearest_nms_presorted(
            near, top_sc, cfg.nms_iou_threshold, post_max_size=D)

    safe = jnp.where(valid, idx, 0)                       # [B*C, D]
    boxes = jnp.take_along_axis(boxes_r, safe[..., None], axis=1)
    scores = jnp.where(valid,
                       jnp.take_along_axis(top_sc, safe, axis=1), 0.0)

    if cfg.nms_center_suppress_radius > 0:
        # Each [B*C] row is one (sample, class) in score order; greedy
        # center-distance suppression within the row removes wrong-yaw
        # duplicates of thin boxes (validated: door 3D AP 0.598 -> 0.676
        # on the as-built v5 checkpoint at radius 0.3).
        valid = nms_jax.center_suppress_presorted(
            boxes[..., :2], valid, cfg.nms_center_suppress_radius)
        scores = jnp.where(valid, scores, 0.0)
    labels = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :, None], (B, C, D))
    return {"box3d_lidar": boxes.reshape(B, C * D, -1),
            "scores": scores.reshape(B, C * D),
            "label_preds": labels.reshape(B, C * D),
            "valid": valid.reshape(B, C * D)}


def build_voxelnet(cfg: VoxelNetConfig) -> VoxelNet:
    return VoxelNet(cfg=cfg)
