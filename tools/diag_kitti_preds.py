"""Offline error decomposition for a trained KITTI checkpoint.

Loads a checkpoint on CPU, runs predict on a few val frames, greedily
matches detections to GT in the lidar frame, and prints per-component
error statistics (center, dims, yaw mod pi, BEV/3D IoU).  Pinpoints WHY
a devkit AP number is low (z vs xy vs size vs yaw vs score ordering)
without occupying the TPU relay.

Usage:
  python tools/diag_kitti_preds.py --model_dir /tmp/kitti_fhd_r4 \
      [--num_frames 9] [--score_thresh 0.3]
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")   # never touch the TPU relay


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--config", default=None,
                    help="defaults to <model_dir>/pipeline.config")
    ap.add_argument("--num_frames", type=int, default=9)
    ap.add_argument("--score_thresh", type=float, default=0.3)
    args = ap.parse_args()

    import pickle

    from automatic_as_built_reconstruction_tpu.core import (box_ops,
                                                            geometry)
    from automatic_as_built_reconstruction_tpu.data import batching
    from automatic_as_built_reconstruction_tpu.data import kitti_common as kc
    from automatic_as_built_reconstruction_tpu.train import checkpoint as ck
    from automatic_as_built_reconstruction_tpu.train.train import (
        Bundle, init_state, make_predict_fn, _to_device)

    model_dir = pathlib.Path(args.model_dir)
    cfg_path = args.config or model_dir / "pipeline.config"
    bundle = Bundle(str(cfg_path))
    prep_ds, loader = bundle.input_reader(training=False)

    # GT lookup (lidar frame) by image_idx, same conversion as the dataset
    infos = pickle.load(
        open(bundle.config.eval_input_reader.dataset.kitti_info_path, "rb"))
    gt_by_idx = {}
    for info in infos:
        annos = kc.remove_dontcare(info["annos"])
        boxes_cam = kc.anno_to_rbboxes(annos)
        gt_by_idx[info["image_idx"]] = box_ops.box_camera_to_lidar(
            boxes_cam, info["calib/R0_rect"], info["calib/Tr_velo_to_cam"])
    state, _ = init_state(bundle)
    state, step = ck.try_restore_latest(str(model_dir), state)
    assert state is not None, f"no checkpoint under {model_dir}"
    print(f"checkpoint step {step}")
    predict_fn = make_predict_fn(bundle, mesh=None)

    errs = {k: [] for k in
            ("dx", "dy", "dz", "dw", "dl", "dh", "dyaw", "bev_iou",
             "score")}
    n_gt = n_det = n_matched = 0
    frames = 0
    for batch in loader:
        example = _to_device(batching.device_example(batch), None)
        out = jax.device_get(
            predict_fn(state["params"], state["batch_stats"], example))
        for b in range(out["box3d_lidar"].shape[0]):
            valid = out["valid"][b]
            boxes = np.asarray(out["box3d_lidar"][b][valid])
            scores = np.asarray(out["scores"][b][valid])
            keep = scores >= args.score_thresh
            boxes, scores = boxes[keep], scores[keep]
            gtb = gt_by_idx[batch["metadata"][b]["image_idx"]]
            n_gt += len(gtb)
            n_det += len(boxes)
            if len(gtb) == 0 or len(boxes) == 0:
                continue
            # greedy match by BEV center distance
            used = set()
            for g in gtb:
                d = np.hypot(boxes[:, 0] - g[0], boxes[:, 1] - g[1])
                order = np.argsort(d)
                for j in order:
                    if j in used or d[j] > 2.0:
                        break
                    used.add(j)
                    p = boxes[j]
                    errs["dx"].append(p[0] - g[0])
                    errs["dy"].append(p[1] - g[1])
                    errs["dz"].append(p[2] - g[2])
                    errs["dw"].append(p[3] - g[3])
                    errs["dl"].append(p[4] - g[4])
                    errs["dh"].append(p[5] - g[5])
                    dy_ = (p[6] - g[6] + np.pi / 2) % np.pi - np.pi / 2
                    errs["dyaw"].append(dy_)
                    iou = geometry.rotate_iou_matrix(
                        p[None, [0, 1, 3, 4, 6]],
                        np.asarray(g)[None, [0, 1, 3, 4, 6]])[0, 0]
                    errs["bev_iou"].append(iou)
                    errs["score"].append(scores[j])
                    n_matched += 1
                    break
            frames += 1
        if frames >= args.num_frames:
            break

    print(f"frames={frames} gt={n_gt} det(>= {args.score_thresh})={n_det} "
          f"matched={n_matched}")
    for k, v in errs.items():
        if not v:
            continue
        a = np.asarray(v)
        print(f"{k:8s} mean={a.mean():+.3f} |mean|={np.abs(a).mean():.3f} "
              f"p50={np.percentile(np.abs(a), 50):.3f} "
              f"p90={np.percentile(np.abs(a), 90):.3f}")
    if errs["bev_iou"]:
        a = np.asarray(errs["bev_iou"])
        for t in (0.5, 0.7):
            print(f"matched BEV IoU >= {t}: {(a >= t).mean():.3f}")


if __name__ == "__main__":
    main()
