"""Device (jit) target assignment — the XLA twin of
``core.target_assign.create_targets`` with fp32-identical outputs.

Static-shape formulation for TPU: gt boxes arrive PADDED to a fixed
capacity with a validity mask; every step (similarity, force-match,
threshold match, background fill, encoding) is expressed as masked
dense ops so the whole assignment jits and vmaps over the batch.

Semantics replicated exactly from the host oracle (which mirrors
second/core/target_ops.py::create_target_np — lineage-expected path,
UNVERIFIED):
- force match: every anchor achieving a gt's max similarity is assigned
  that gt; with several force-matched gts per anchor the HIGHEST gt index
  wins (the numpy fancy-indexing last-write order).
- threshold matches overwrite force matches with the per-anchor argmax gt.
- gts with max similarity <= 0 never force-match.
- anchors outside ``anchor_mask`` never match and end at label -1.
- zero valid gts -> all labels 0 (including masked anchors — oracle
  behavior).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from . import box_jax, rotated_iou

_NEG = -1e6


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def rbbox2d_to_near_bbox(rbboxes: jax.Array) -> jax.Array:
    """[N,5] (x,y,w,l,yaw) -> nearest axis-aligned [N,4] (x1,y1,x2,y2)."""
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = jnp.abs(limit_period(rots, 0.5, jnp.pi))
    cond = (rots_0_pi_div_2 > jnp.pi / 4)[..., None]
    bboxes_center = jnp.where(cond, rbboxes[:, jnp.array([0, 1, 3, 2])],
                              rbboxes[:, :4])
    centers, dims = bboxes_center[:, :2], bboxes_center[:, 2:]
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], -1)


def iou_2d(boxes: jax.Array, query_boxes: jax.Array) -> jax.Array:
    """Axis-aligned IoU [N,4] x [K,4] -> [N,K]."""
    area_q = ((query_boxes[:, 2] - query_boxes[:, 0])
              * (query_boxes[:, 3] - query_boxes[:, 1]))
    area_b = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    iw = (jnp.minimum(boxes[:, None, 2], query_boxes[None, :, 2])
          - jnp.maximum(boxes[:, None, 0], query_boxes[None, :, 0]))
    ih = (jnp.minimum(boxes[:, None, 3], query_boxes[None, :, 3])
          - jnp.maximum(boxes[:, None, 1], query_boxes[None, :, 1]))
    inter = jnp.clip(iw, 0) * jnp.clip(ih, 0)
    union = area_b[:, None] + area_q[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def similarity_matrix(anchors_bev: jax.Array, gt_bev: jax.Array,
                      kind: str = "nearest",
                      distance_norm: float = 2.0,
                      with_rotation: bool = False,
                      rotation_alpha: float = 0.5) -> jax.Array:
    """[A,5] x [G,5] -> [A,G] similarity (device twins of
    core.region_similarity calculators)."""
    if kind == "nearest":
        return iou_2d(rbbox2d_to_near_bbox(anchors_bev),
                      rbbox2d_to_near_bbox(gt_bev))
    if kind == "rotate":
        return rotated_iou.rotate_iou_matrix(anchors_bev, gt_bev)
    if kind == "distance":
        d = jnp.linalg.norm(
            anchors_bev[:, None, :2] - gt_bev[None, :, :2], axis=-1)
        dist = 1.0 - d / distance_norm
        if with_rotation:
            rot = jnp.cos(anchors_bev[:, None, -1] - gt_bev[None, :, -1])
            dist = (rotation_alpha * dist
                    + (1 - rotation_alpha) * (rot * 0.5 + 0.5))
        return dist
    raise ValueError(f"unknown similarity kind: {kind}")


def create_targets_jax(anchors: jax.Array,
                       gt_boxes: jax.Array,
                       gt_valid: jax.Array,
                       gt_classes: Optional[jax.Array] = None,
                       matched_threshold=0.6,
                       unmatched_threshold=0.45,
                       similarity: str = "nearest",
                       distance_norm: float = 2.0,
                       with_rotation: bool = False,
                       rotation_alpha: float = 0.5,
                       box_code: str = "ground3d",
                       vec_encode: bool = False,
                       linear_dim: bool = False,
                       anchor_mask: Optional[jax.Array] = None
                       ) -> Dict[str, jax.Array]:
    """Assign padded gt boxes to anchors on device.

    anchors [A,7]; gt_boxes [Gmax,7] padded; gt_valid [Gmax] bool;
    gt_classes [Gmax] int32 (1-based).  Returns the same dict as the host
    oracle: labels [A] i32, bbox_targets [A,code], bbox_outside_weights
    [A] f32, assigned_gt_inds [A] i32.
    """
    A = anchors.shape[0]
    G = gt_boxes.shape[0]
    if gt_classes is None:
        gt_classes = jnp.ones((G,), jnp.int32)
    matched_threshold = jnp.broadcast_to(
        jnp.asarray(matched_threshold, jnp.float32), (A,))
    unmatched_threshold = jnp.broadcast_to(
        jnp.asarray(unmatched_threshold, jnp.float32), (A,))
    valid_a = (jnp.asarray(anchor_mask, bool) if anchor_mask is not None
               else jnp.ones((A,), bool))
    gt_valid = jnp.asarray(gt_valid, bool)

    bev_a = anchors[:, jnp.array([0, 1, 3, 4, 6])]
    bev_g = gt_boxes[:, jnp.array([0, 1, 3, 4, 6])]
    sim = similarity_matrix(bev_a, bev_g, similarity, distance_norm,
                            with_rotation, rotation_alpha).astype(
                                jnp.float32)
    sim = jnp.where(valid_a[:, None] & gt_valid[None, :], sim, _NEG)

    anchor_to_gt_argmax = jnp.argmax(sim, axis=1)
    anchor_to_gt_max = jnp.max(sim, axis=1)

    gt_to_anchor_max = jnp.max(sim, axis=0)
    empty_gt = gt_to_anchor_max <= 0
    gt_to_anchor_max = jnp.where(empty_gt, -1.0, gt_to_anchor_max)

    # force match; ties across gts resolve to the HIGHEST gt index
    force = (sim == gt_to_anchor_max[None, :]) & gt_valid[None, :]
    force_any = force.any(axis=1)
    force_gt = (G - 1) - jnp.argmax(force[:, ::-1], axis=1)

    labels = jnp.full((A,), -1, jnp.int32)
    gt_ids = jnp.full((A,), -1, jnp.int32)
    labels = jnp.where(force_any, gt_classes[force_gt], labels)
    gt_ids = jnp.where(force_any, force_gt.astype(jnp.int32), gt_ids)

    pos = anchor_to_gt_max >= matched_threshold
    labels = jnp.where(pos, gt_classes[anchor_to_gt_argmax], labels)
    gt_ids = jnp.where(pos, anchor_to_gt_argmax.astype(jnp.int32), gt_ids)

    bg = anchor_to_gt_max < unmatched_threshold
    labels = jnp.where(bg & ~(labels > 0), 0, labels)
    if anchor_mask is not None:
        labels = jnp.where(valid_a, labels, -1)
        gt_ids = jnp.where(valid_a, gt_ids, -1)

    # oracle: zero (valid) gts -> everything background
    no_gt = ~gt_valid.any()
    labels = jnp.where(no_gt, 0, labels)
    gt_ids = jnp.where(no_gt, -1, gt_ids)

    fg = labels > 0
    safe_ids = jnp.clip(gt_ids, 0, G - 1)
    if box_code == "ground3d":
        enc = box_jax.second_box_encode(gt_boxes[safe_ids], anchors,
                                        vec_encode, linear_dim)
    elif box_code == "bev":
        idx = jnp.array([0, 1, 3, 4, 6])
        enc = box_jax.bev_box_encode(gt_boxes[safe_ids][:, idx],
                                     anchors[:, idx], vec_encode,
                                     linear_dim)
    else:
        raise ValueError(f"unknown box_code: {box_code}")
    bbox_targets = jnp.where(fg[:, None], enc.astype(jnp.float32), 0.0)
    bbox_outside_weights = jnp.where(fg, 1.0, 0.0).astype(jnp.float32)

    return {
        "labels": labels,
        "bbox_targets": bbox_targets,
        "bbox_outside_weights": bbox_outside_weights,
        "assigned_gt_inds": gt_ids,
    }
