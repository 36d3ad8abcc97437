"""Per-substage latency breakdown for the rotated-NMS serving path.

The pillar full pipeline spends ~half its time in decode+NMS (BENCH r3:
3.57 of 7.40 ms/scan), so this probes cumulative prefixes of
``ops/nms_jax.py::rotate_nms_batch`` at bench shapes (XLA dead-code
eliminates everything after the returned value — same trick as
tools/probe_fhd.py):

  S0 top_k       [R, A] -> [R, K] scores + gather boxes
  S1 +candidates circle-lens upper bound + per-row candidate sort
  S2 +clip       exact rotated IoU on the [R*K, M] candidate pairs
  S3 +fixpoint   scatter suppressor tensor + greedy fixpoint + compact

Boxes/scores mimic the bench's random-init model: every anchor passes
the 0.05 score threshold, boxes sit on the dense anchor grid with noise
(heavy legitimate overlap — the worst case for the pruner).

Usage:
  python tools/probe_nms.py [--rows 8] [--num_anchors 107136]
      [--pre 1000] [--cap 128] [--cpu] [--trace_only]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--num_anchors", type=int, default=107136)
    ap.add_argument("--pre", type=int, default=1000)
    ap.add_argument("--post", type=int, default=100)
    ap.add_argument("--cap", type=int, default=128)
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace_only", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import bench
    from automatic_as_built_reconstruction_tpu.ops import (
        nms_jax, rotated_iou)

    R, A, K, M = args.rows, args.num_anchors, args.pre, args.cap
    rng = np.random.default_rng(0)
    # anchor-grid-like boxes: KITTI car anchors at 0.32 m stride + jitter
    n_side = int(np.sqrt(A / 2)) + 1
    gx, gy = np.meshgrid(np.arange(n_side) * 0.32,
                         np.arange(n_side) * 0.32)
    cent = np.stack([gx.ravel(), gy.ravel()], 1)
    cent = np.concatenate([cent, cent])[:A]
    boxes = np.concatenate([
        cent + rng.normal(0, 0.4, (A, 2)),
        np.tile([1.6, 3.9], (A, 1)) * rng.uniform(0.8, 1.2, (A, 2)),
        rng.uniform(0, np.pi, (A, 1))], 1).astype(np.float32)
    boxes_b = jnp.asarray(np.stack([boxes] * R))
    scores0 = jnp.asarray(
        rng.uniform(0.3, 0.7, (R, A)).astype(np.float32))

    def s0_topk(i, sc):
        top_scores, top_idx = jax.vmap(
            lambda s: jax.lax.top_k(s, K))(sc + i * 1e-6)
        top_boxes = jnp.take_along_axis(
            boxes_b, top_idx[..., None], axis=1)
        return jnp.sum(top_scores) + jnp.sum(top_boxes)

    def _prep(i, sc):
        top_scores, top_idx = jax.vmap(
            lambda s: jax.lax.top_k(s, K))(sc + i * 1e-6)
        top_boxes = jnp.take_along_axis(
            boxes_b, top_idx[..., None], axis=1)
        valid = top_scores > -jnp.inf
        return top_boxes, valid, top_idx

    def s1_candidates(i, sc):
        top_boxes, valid, _ = _prep(i, sc)
        nidx, sel, fits = jax.vmap(
            lambda b, v: nms_jax._neighbor_candidates(b, v, M, args.iou))(
            top_boxes, valid)
        return (jnp.sum(nidx) + jnp.sum(sel)).astype(jnp.float32)

    def s2_clip(i, sc):
        top_boxes, valid, _ = _prep(i, sc)
        nidx, sel, fits = jax.vmap(
            lambda b, v: nms_jax._neighbor_candidates(b, v, M, args.iou))(
            top_boxes, valid)
        offs = (jnp.arange(R, dtype=jnp.int32) * K)[:, None, None]
        nidx_g = (nidx + offs).reshape(R * K, M)
        flat_boxes = top_boxes.reshape(R * K, -1)
        nboxes = flat_boxes[nidx_g]
        iou_m = rotated_iou.rotate_iou_pairs(
            jnp.broadcast_to(flat_boxes[:, None], nboxes.shape), nboxes)
        return jnp.sum(iou_m)

    def s3_full(i, sc):
        top_boxes, valid, top_idx = _prep(i, sc)
        keep = nms_jax.rotate_nms_keep_batch(
            top_boxes, valid, args.iou, M)
        out_idx, out_valid = jax.vmap(
            lambda ke, ti: nms_jax._compact_keep(ke, ti, args.post))(
            keep, top_idx)
        return (jnp.sum(out_idx) + jnp.sum(out_valid)).astype(jnp.float32)

    stages = [("topk", s0_topk), ("+candidates", s1_candidates),
              ("+clip", s2_clip), ("+fixpoint", s3_full)]

    if args.trace_only:
        for name, fn in stages:
            out = jax.eval_shape(fn, jnp.float32(0), scores0)
            print(f"[probe] trace {name:12s} -> {out.shape} {out.dtype}")
        print(json.dumps({"trace_only": True}))
        return

    out, prev = {}, 0.0
    for name, fn in stages:
        dt = bench._loop_delta(jax, jnp, fn, (scores0,), 1, 3)
        per_row_ms = dt / R * 1e3
        print(f"[probe] {name:12s} cum {per_row_ms:8.3f} ms/row "
              f"(delta {per_row_ms - prev:+8.3f})", flush=True)
        out[name] = round(per_row_ms, 3)
        prev = per_row_ms
    print(json.dumps(out))


if __name__ == "__main__":
    main()
