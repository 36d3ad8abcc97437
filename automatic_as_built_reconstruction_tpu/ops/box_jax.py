"""JAX twins of the core box math — differentiable / jit-able.

Mirrors ``core.box_ops`` exactly at fp32 (parity-tested).  This is the
device-side half the reference implemented in torch (``box_torch_ops``).

[ref: second/pytorch/core/box_torch_ops.py — lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def second_box_encode(boxes, anchors, encode_angle_to_vector: bool = False,
                      smooth_dim: bool = False):
    """Encode gt [.., 7] against anchors [.., 7] -> residuals [.., 7|8]."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(boxes, 7, axis=-1)
    diagonal = jnp.sqrt(la**2 + wa**2)
    zg = zg + hg / 2
    za = za + ha / 2
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    if smooth_dim:
        lt = lg / la - 1
        wt = wg / wa - 1
        ht = hg / ha - 1
    else:
        lt = jnp.log(lg / la)
        wt = jnp.log(wg / wa)
        ht = jnp.log(hg / ha)
    if encode_angle_to_vector:
        rtx = jnp.cos(rg) - jnp.cos(ra)
        rty = jnp.sin(rg) - jnp.sin(ra)
        return jnp.concatenate([xt, yt, zt, wt, lt, ht, rtx, rty], axis=-1)
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rg - ra], axis=-1)


def second_box_decode(encodings, anchors, encode_angle_to_vector: bool = False,
                      smooth_dim: bool = False):
    """Inverse of :func:`second_box_encode` -> boxes [.., 7]."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    if encode_angle_to_vector:
        xt, yt, zt, wt, lt, ht, rtx, rty = jnp.split(encodings, 8, axis=-1)
    else:
        xt, yt, zt, wt, lt, ht, rt = jnp.split(encodings, 7, axis=-1)
    diagonal = jnp.sqrt(la**2 + wa**2)
    za = za + ha / 2
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    if smooth_dim:
        lg = (lt + 1) * la
        wg = (wt + 1) * wa
        hg = (ht + 1) * ha
    else:
        lg = jnp.exp(lt) * la
        wg = jnp.exp(wt) * wa
        hg = jnp.exp(ht) * ha
    if encode_angle_to_vector:
        rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
    else:
        rg = rt + ra
    zg = zg - hg / 2
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)


def bev_box_encode(boxes, anchors, encode_angle_to_vector=False,
                   smooth_dim=False):
    xa, ya, wa, la, ra = jnp.split(anchors, 5, axis=-1)
    xg, yg, wg, lg, rg = jnp.split(boxes, 5, axis=-1)
    diagonal = jnp.sqrt(la**2 + wa**2)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    if smooth_dim:
        lt, wt = lg / la - 1, wg / wa - 1
    else:
        lt, wt = jnp.log(lg / la), jnp.log(wg / wa)
    if encode_angle_to_vector:
        return jnp.concatenate(
            [xt, yt, wt, lt, jnp.cos(rg) - jnp.cos(ra),
             jnp.sin(rg) - jnp.sin(ra)], axis=-1)
    return jnp.concatenate([xt, yt, wt, lt, rg - ra], axis=-1)


def bev_box_decode(encodings, anchors, encode_angle_to_vector=False,
                   smooth_dim=False):
    xa, ya, wa, la, ra = jnp.split(anchors, 5, axis=-1)
    if encode_angle_to_vector:
        xt, yt, wt, lt, rtx, rty = jnp.split(encodings, 6, axis=-1)
    else:
        xt, yt, wt, lt, rt = jnp.split(encodings, 5, axis=-1)
    diagonal = jnp.sqrt(la**2 + wa**2)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    if smooth_dim:
        lg, wg = (lt + 1) * la, (wt + 1) * wa
    else:
        lg, wg = jnp.exp(lt) * la, jnp.exp(wt) * wa
    if encode_angle_to_vector:
        rg = jnp.arctan2(rty + jnp.sin(ra), rtx + jnp.cos(ra))
    else:
        rg = rt + ra
    return jnp.concatenate([xg, yg, wg, lg, rg], axis=-1)


# ---------------------------------------------------------------------------
# corners (device)
# ---------------------------------------------------------------------------

# numpy, NOT jnp: a module-scope jnp.array creates a device buffer at
# import time, initializing the default backend (= grabbing a TPU-relay
# client) in every process that merely imports the package.
_CORNERS2D = np.array(
    [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], np.float32)


def center_to_corner_box2d(centers, dims, angles):
    """[..,2] centers, [..,2] dims, [..] yaw -> [..,4,2] CCW corners."""
    corners = dims[..., None, :] * _CORNERS2D  # [.., 4, 2]
    c, s = jnp.cos(angles), jnp.sin(angles)
    x = corners[..., 0] * c[..., None] - corners[..., 1] * s[..., None]
    y = corners[..., 0] * s[..., None] + corners[..., 1] * c[..., None]
    return jnp.stack([x, y], axis=-1) + centers[..., None, :]


def add_sin_difference(boxes1, boxes2):
    """Replace yaw channel with sin(a-b) split trick used by the loss:
    sin(a)cos(b), cos(a)sin(b).  Returns modified (boxes1, boxes2)."""
    rad_pred = boxes1[..., -1:]
    rad_tg = boxes2[..., -1:]
    b1 = jnp.concatenate(
        [boxes1[..., :-1], jnp.sin(rad_pred) * jnp.cos(rad_tg)], axis=-1)
    b2 = jnp.concatenate(
        [boxes2[..., :-1], jnp.cos(rad_pred) * jnp.sin(rad_tg)], axis=-1)
    return b1, b2


def get_direction_target(anchors, reg_targets, dir_offset: float = 0.0,
                         num_bins: int = 2):
    """Direction-classifier targets from yaw residuals.

    rot_gt = reg_target_yaw + anchor_yaw; bin = floor((rot_gt - offset) /
    (2pi / num_bins)) mod num_bins.  Default 2 bins = sign of yaw.
    """
    rot_gt = reg_targets[..., 6] + anchors[..., 6]
    offset_rot = limit_period(rot_gt - dir_offset, 0.0, 2 * jnp.pi)
    dir_cls = jnp.clip(
        jnp.floor(offset_rot / (2 * jnp.pi / num_bins)).astype(jnp.int32),
        0, num_bins - 1)
    return dir_cls
