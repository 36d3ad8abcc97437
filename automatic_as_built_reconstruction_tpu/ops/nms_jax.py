"""On-device NMS — iterative mask formulation, jit/vmap friendly.

Replaces the lineage's bitmask CUDA NMS [ref: second/core/
non_max_suppression/nms_gpu.py — UNVERIFIED] with: top-k by score, one
batched IoU matrix, then an O(K) greedy `fori_loop` over rows.  Static
output: boolean keep mask (callers pad/slice).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import rotated_iou


def _greedy_suppress(iou: jax.Array, valid: jax.Array,
                     iou_threshold: float) -> jax.Array:
    """Greedy NMS given a [K,K] IoU matrix of score-sorted boxes.

    EXACT greedy semantics via fixpoint iteration instead of a K-step
    sequential row loop (851 ms/scan at K=1000 on TPU — each fori step
    is a tiny serialized vector op).  The greedy solution is the unique
    fixpoint of ``keep_i = valid_i ∧ ¬∃ j<i: keep_j ∧ iou_ji > thr``
    (row 0 is determined, row i depends only on rows < i — induction),
    and iterating F from keep=valid finalizes at least one more leading
    row per sweep, so the while_loop exits at the exact greedy answer —
    typically after ~chain-depth (<10) sweeps, each one masked-matmul
    on the MXU."""
    k = iou.shape[0]
    row = jnp.arange(k)[:, None]
    col = jnp.arange(k)[None, :]
    # M[j, i] = suppressor mask: j earlier than i and overlapping
    sup_m = ((iou > iou_threshold) & (row < col)).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        suppressed = (keep.astype(jnp.float32) @ sup_m) > 0
        return valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    return keep


def _circle_lens_area(d: jax.Array, r1: jax.Array,
                      r2: jax.Array) -> jax.Array:
    """Intersection area of two discs at center distance d (standard
    lens formula, branch-free)."""
    far = d >= r1 + r2
    nested = d <= jnp.abs(r1 - r2)
    dd = jnp.maximum(d, 1e-6)
    d2 = dd * dd
    a1 = jnp.clip((d2 + r1 * r1 - r2 * r2)
                  / jnp.maximum(2.0 * dd * r1, 1e-9), -1.0, 1.0)
    a2 = jnp.clip((d2 + r2 * r2 - r1 * r1)
                  / jnp.maximum(2.0 * dd * r2, 1e-9), -1.0, 1.0)
    s = jnp.maximum(
        (-dd + r1 + r2) * (dd + r1 - r2) * (dd - r1 + r2) * (dd + r1 + r2),
        0.0)
    lens = (r1 * r1 * jnp.arccos(a1) + r2 * r2 * jnp.arccos(a2)
            - 0.5 * jnp.sqrt(s))
    rmin = jnp.minimum(r1, r2)
    return jnp.where(far, 0.0,
                     jnp.where(nested, jnp.pi * rmin * rmin, lens))


def _neighbor_candidates(top_boxes: jax.Array, valid: jax.Array,
                         M: int, iou_threshold: float = 0.0):
    """Conservative overlap candidates: (nidx [K, M], sel [K, M], fits).

    A pair can only be suppressor/victim when its IoU can exceed the
    threshold, and the IoU of two rotated boxes is upper-bounded by the
    IoU of their circumscribed circles (box ⊆ circumcircle on both
    sides): ub = lens(d, r_a, r_b) / max(area_a, area_b, a+b-lens).
    This prunes ~98% of pairs at NMS sizes — far tighter than the bare
    center-distance gate once iou_threshold > 0.  Each row's first M
    candidate columns are picked with one lane-axis sort of keys
    ``col`` (candidate) / ``k+col`` (not) — sorts are near-free on TPU
    where data-dependent searchsorted/scatter serialize.  ``fits`` is
    False when some row has more than M candidates (callers fall back
    to the exact full-matrix path)."""
    k = top_boxes.shape[0]
    centers = top_boxes[:, :2]
    rad = 0.5 * jnp.hypot(top_boxes[:, 2], top_boxes[:, 3])
    area = top_boxes[:, 2] * top_boxes[:, 3]
    d = jnp.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    r1, r2 = rad[:, None], rad[None, :]
    inter_ub = _circle_lens_area(d, r1, r2)
    union_lb = jnp.maximum(jnp.maximum(area[:, None], area[None, :]),
                           area[:, None] + area[None, :] - inter_ub)
    iou_ub = inter_ub / jnp.maximum(union_lb, 1e-9)
    # 1e-3 relative slack: the circle bound overestimates box IoU by a
    # geometric margin, never by mere rounding — this keeps fp noise in
    # the lens formula from ever pruning a true above-threshold pair
    possible = (iou_ub > iou_threshold * 0.999) & valid[None, :] \
        & valid[:, None]
    possible = possible & ~jnp.eye(k, dtype=bool)
    n_cand = jnp.sum(possible, axis=1)
    fits = jnp.max(jnp.where(valid, n_cand, 0)) <= M
    col = jnp.arange(k, dtype=jnp.int32)[None]
    key = jnp.where(possible, col, k + col)
    srt = jnp.sort(key, axis=1)[:, :M]              # ascending cols
    sel = srt < k
    return jnp.where(sel, srt, 0), sel, fits


def rotate_nms_keep_batch(top_boxes: jax.Array, valid: jax.Array,
                          iou_threshold, neighbor_cap: int = 64
                          ) -> jax.Array:
    """Batched exact greedy keep masks: [B, K, 5] x [B, K] -> [B, K].

    One batch-level ``lax.cond``: when EVERY sample's candidate rows fit
    the cap, the whole batch runs one flattened pruned fixpoint;
    otherwise the whole batch runs the dense path.  (A per-sample cond
    under vmap would lower to run-both-branches and always pay the
    dense clip.)

    TPU-shaped throughout:
    - (sample, box) flattens to ONE row axis with per-sample index
      offsets, so the candidate-box gather stays a single-level
      [R, M]-from-[R] lookup (the same gather with a vmap batch
      dimension serializes — measured 67 ms vs 1 ms at [8, 1000, 128]);
    - the exact clip runs only on the [R, M] candidate pairs;
    - the greedy fixpoint sweeps are batched matvecs on the MXU against
      a dense suppressor matrix built by ONE scatter from the pruned
      IoUs (a gather per sweep costs ~6 ms/sweep at this size; the
      scatter is paid once)."""
    B, k = top_boxes.shape[:2]
    M = min(int(neighbor_cap), k)
    nidx, sel, fits = jax.vmap(
        lambda b, v: _neighbor_candidates(b, v, M, iou_threshold))(
        top_boxes, valid)

    def pruned(_):
        offs = (jnp.arange(B, dtype=jnp.int32) * k)[:, None, None]
        nidx_g = (nidx + offs).reshape(B * k, M)
        flat_boxes = top_boxes.reshape(B * k, -1)
        nboxes = flat_boxes[nidx_g]                      # [BK, M, 5]
        iou_m = rotated_iou.rotate_iou_pairs(
            jnp.broadcast_to(flat_boxes[:, None], nboxes.shape), nboxes)
        iou_m = iou_m.reshape(B, k, M)
        row = jnp.arange(k, dtype=jnp.int32)[None, :, None]
        sup_m = sel & (iou_m > iou_threshold) & (nidx < row)  # [B,k,M]
        # dense suppressor tensor S[b, j, i] = 1 iff kept j suppresses i
        # (out-of-range j for non-suppressor slots -> dropped)
        b_ix = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None, None], (B, k, M))
        i_ix = jnp.broadcast_to(row, (B, k, M))
        j_ix = jnp.where(sup_m, nidx, k)
        sup = jnp.zeros((B, k, k), jnp.float32).at[
            b_ix, j_ix, i_ix].set(1.0, mode="drop")

        def cond_f(state):
            keep, prev, it = state
            return jnp.any(keep != prev) & (it < k)

        def body(state):
            keep, _, it = state
            suppressed = jnp.einsum(
                "bj,bji->bi", keep.astype(jnp.float32), sup,
                preferred_element_type=jnp.float32) > 0
            return valid & ~suppressed, keep, it + 1

        keep, _, _ = jax.lax.while_loop(
            cond_f, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
        return keep

    def full(_):
        def one(b, v):
            iou = rotated_iou.rotate_iou_matrix(b, b)
            return _greedy_suppress(iou, v, iou_threshold)
        return jax.lax.map(lambda bv: one(*bv), (top_boxes, valid))

    return jax.lax.cond(jnp.all(fits), pruned, full, None)


def center_suppress_presorted(centers: jax.Array, valid: jax.Array,
                              radius: float) -> jax.Array:
    """Greedy suppression by BEV center distance on score-sorted rows.

    centers [R, K, 2], valid [R, K] -> keep [R, K].  A detection is
    dropped when a higher-scored KEPT detection in the same row lies
    within ``radius`` meters.  Complements rotated-IoU NMS for thin
    boxes: a wrong-yaw duplicate of a door has near-zero mutual IoU
    (perpendicular thin rectangles) so NMS keeps both, but the centers
    coincide.  Same exact-greedy fixpoint as :func:`_greedy_suppress`.
    """
    d2 = jnp.sum(
        (centers[:, :, None, :] - centers[:, None, :, :]) ** 2, axis=-1)
    near = (d2 < radius * radius).astype(jnp.float32)
    return jax.vmap(lambda m, v: _greedy_suppress(m, v, 0.5))(near, valid)


def _compact_keep(keep: jax.Array, top_idx: jax.Array,
                  post_max_size: int):
    """Kept score-order indices -> [post_max_size] slots (-1 pad)."""
    kpos = jnp.cumsum(keep) - 1
    out_idx = jnp.full((post_max_size,), -1, jnp.int32)
    out_idx = out_idx.at[jnp.where(keep & (kpos < post_max_size),
                                   kpos, post_max_size)].set(
        top_idx.astype(jnp.int32), mode="drop")
    return out_idx, out_idx >= 0


@functools.partial(jax.jit,
                   static_argnames=("pre_max_size", "post_max_size",
                                    "neighbor_cap"))
def rotate_nms_batch(boxes: jax.Array, scores: jax.Array,
                     iou_threshold: float, pre_max_size: int,
                     post_max_size: int, neighbor_cap: int = 128):
    """Batched rotated NMS: [R, N, 5] x [R, N] -> ([R, post], [R, post]).

    The whole batch shares one pruned-vs-dense decision
    (:func:`rotate_nms_keep_batch`), so the candidate clip stays a
    vmapped [R, K, M] pair job on the VPU instead of R serialized
    dispatches."""
    n = boxes.shape[1]
    k = min(pre_max_size, n)
    top_scores, top_idx = jax.vmap(lambda s: jax.lax.top_k(s, k))(scores)
    top_boxes = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)
    valid = top_scores > -jnp.inf
    keep = rotate_nms_keep_batch(top_boxes, valid, iou_threshold,
                                 neighbor_cap)
    return jax.vmap(lambda ke, ti: _compact_keep(ke, ti, post_max_size))(
        keep, top_idx)


@functools.partial(jax.jit,
                   static_argnames=("post_max_size", "neighbor_cap",
                                    "compact_cap"))
def rotate_nms_presorted(boxes: jax.Array, scores: jax.Array,
                         iou_threshold: float, post_max_size: int,
                         neighbor_cap: int = 128, compact_cap: int = 256):
    """:func:`rotate_nms_batch` for rows ALREADY score-sorted descending
    (e.g. straight out of a caller's top_k): skips the internal top_k
    and returns indices into each row's K axis.

    Two-level problem sizing: because rows are score-DESCENDING, every
    valid (> -inf, i.e. above the caller's score threshold) entry forms
    a prefix — so when no row has more than ``compact_cap`` valid
    candidates, running NMS on the first ``compact_cap`` columns is
    EXACT, and the O(K^2) candidate/suppressor buffers shrink ~16x at
    the serving default (K=1000, cap=256).  After training, real scans
    rarely exceed a couple hundred above-threshold anchors per class, so
    this is the common path; dense rows fall back to the full width.

    boxes: [R, K, 5]; scores: [R, K] descending, -inf = invalid."""
    R, K = scores.shape
    valid = scores > -jnp.inf
    idx = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (R, K))
    K2 = min(int(compact_cap), K)

    def run(b, v, k_width):
        keep = rotate_nms_keep_batch(b, v, iou_threshold, neighbor_cap)
        return jax.vmap(lambda ke, ti: _compact_keep(ke, ti,
                                                     post_max_size))(
            keep, idx[:, :k_width])

    if K2 >= K:
        return run(boxes, valid, K)
    small = jnp.max(jnp.sum(valid, axis=1)) <= K2
    return jax.lax.cond(
        small,
        lambda _: run(boxes[:, :K2], valid[:, :K2], K2),
        lambda _: run(boxes, valid, K),
        None)


@functools.partial(jax.jit, static_argnames=("post_max_size",
                                             "compact_cap"))
def nearest_nms_presorted(boxes_bev: jax.Array, scores: jax.Array,
                          iou_threshold: float, post_max_size: int,
                          compact_cap: int = 256):
    """:func:`nearest_nms` for rows ALREADY score-sorted descending;
    returns indices into each row's K axis.  Same exact two-level
    sizing as :func:`rotate_nms_presorted` (valid entries form a prefix
    of a descending row).

    boxes_bev: [R, K, 4] (x1, y1, x2, y2); scores: [R, K] descending."""
    R, K = scores.shape

    def one(b, s, k_width):
        valid = s > -jnp.inf
        area = (jnp.maximum(b[:, 2] - b[:, 0], 0)
                * jnp.maximum(b[:, 3] - b[:, 1], 0))
        iw = jnp.minimum(b[:, None, 2], b[None, :, 2]) - jnp.maximum(
            b[:, None, 0], b[None, :, 0])
        ih = jnp.minimum(b[:, None, 3], b[None, :, 3]) - jnp.maximum(
            b[:, None, 1], b[None, :, 1])
        inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
        union = area[:, None] + area[None, :] - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        keep = _greedy_suppress(iou, valid, iou_threshold)
        return _compact_keep(keep, jnp.arange(k_width, dtype=jnp.int32),
                             post_max_size)

    def run(b, s, k_width):
        return jax.lax.map(lambda bs: one(*bs, k_width), (b, s))

    K2 = min(int(compact_cap), K)
    if K2 >= K:
        return run(boxes_bev, scores, K)
    small = jnp.max(jnp.sum(scores > -jnp.inf, axis=1)) <= K2
    return jax.lax.cond(
        small,
        lambda _: run(boxes_bev[:, :K2], scores[:, :K2], K2),
        lambda _: run(boxes_bev, scores, K),
        None)


@functools.partial(jax.jit,
                   static_argnames=("pre_max_size", "post_max_size",
                                    "neighbor_cap"))
def rotate_nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
               pre_max_size: int, post_max_size: int,
               neighbor_cap: int = 128):
    """Rotated NMS.

    Args:
        boxes: [N, 5] (x,y,w,l,yaw); invalid boxes must carry score -inf.
        scores: [N].
        neighbor_cap: max in-radius neighbors per box for the pruned
            exact IoU (falls back to the full clip when exceeded).

    Returns:
        indices [post_max_size] into the input (-1 padding), and a
        validity mask [post_max_size].
    """
    n = boxes.shape[0]
    k = min(pre_max_size, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    valid = top_scores > -jnp.inf
    keep = rotate_nms_keep_batch(top_boxes[None], valid[None],
                                 iou_threshold, neighbor_cap)[0]
    return _compact_keep(keep, top_idx, post_max_size)


@functools.partial(jax.jit,
                   static_argnames=("pre_max_size", "post_max_size"))
def nearest_nms(boxes_bev: jax.Array, scores: jax.Array, iou_threshold: float,
                pre_max_size: int, post_max_size: int):
    """Axis-aligned NMS on yaw-snapped BEV boxes (the lineage's fast path).

    boxes_bev: [N, 4] (x1, y1, x2, y2)."""
    n = boxes_bev.shape[0]
    k = min(pre_max_size, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    b = boxes_bev[top_idx]
    valid = top_scores > -jnp.inf
    area = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    iw = jnp.minimum(b[:, None, 2], b[None, :, 2]) - jnp.maximum(
        b[:, None, 0], b[None, :, 0])
    ih = jnp.minimum(b[:, None, 3], b[None, :, 3]) - jnp.maximum(
        b[:, None, 1], b[None, :, 1])
    inter = jnp.maximum(iw, 0) * jnp.maximum(ih, 0)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
    keep = _greedy_suppress(iou, valid, iou_threshold)
    return _compact_keep(keep, top_idx, post_max_size)


def rbbox_to_near_bbox(rbboxes: jax.Array) -> jax.Array:
    """jnp twin of core.box_ops.rbbox2d_to_near_bbox."""
    from . import box_jax
    rots = rbboxes[..., -1]
    rots_0_pi_div_2 = jnp.abs(box_jax.limit_period(rots, 0.5, jnp.pi))
    cond = (rots_0_pi_div_2 > jnp.pi / 4)[..., None]
    bboxes_center = jnp.where(
        cond, rbboxes[..., jnp.array([0, 1, 3, 2])], rbboxes[..., :4])
    centers = bboxes_center[..., :2]
    dims = bboxes_center[..., 2:]
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)
