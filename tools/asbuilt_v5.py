"""Round-4 as-built accuracy run v5: yaw-QUALITY scoring head.

Two rounds of evidence say the thin-class (door) plateau at ~0.6 AP is a
RANKING failure, not a recall failure (tools/door_filter_exp.py: recall
94% at IoU 0.25, but a wrong-yaw duplicate outscores the right box on
~28% of doors; post-hoc filters don't help; v4's 4-rotation anchor sweep
REGRESSED to 0.471).  Anchors are exhausted as a fix — v5 changes the
score itself:

- the RPN grows a per-anchor yaw-quality logit trained with BCE against
  |cos(pred_yaw - gt_yaw)| on positive anchors (models/rpn.py
  conv_quality; voxelnet.compute_loss loss_quality),
- predict() multiplies sigmoid(quality) into the classification score
  BEFORE top-k, so a perpendicular-yaw duplicate ranks below the
  correctly-oriented detection even when its cls confidence is higher,
- everything else is the v3 recipe (the best so far: 1024 scenes,
  gt-db sampling door=8/column=5, eval score threshold 0.05, door
  matched_threshold 0.62, 2-rotation anchors, one-cycle, 12000 steps).

Targets (VERDICT r3 item 3): door 3D AP >= 0.70, mAP.bev >= 0.85, no
regression on wall/column.

Usage:
  python tools/asbuilt_v5.py --model_dir /tmp/asbuilt_v5 \
      [--data_root /tmp/building_1k] [--steps 12000] [--chunk 1000]
      [--quality_weight 1.0] [--eval_only]
"""
from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def ensure_data(root: pathlib.Path, num_scenes: int = 1024) -> None:
    if (root / "building_dbinfos_train.pkl").exists():
        print(f"data already prepared under {root}")
        return
    from automatic_as_built_reconstruction_tpu.data import create_data
    create_data.building_data_prep(root, num_scenes=num_scenes,
                                   num_val=32, seed=0)


def make_config(data_root: pathlib.Path, steps: int,
                quality_weight: float) -> str:
    from automatic_as_built_reconstruction_tpu import builder

    cfg = builder.load_config(
        REPO / "automatic_as_built_reconstruction_tpu" / "configs"
        / "building" / "asbuilt_pillars.config")
    m = cfg.model.second
    m.nms_score_threshold = 0.05
    m.use_yaw_quality_head = True
    m.yaw_quality_weight = quality_weight
    # center-distance suppression: the offline sweep on the v5
    # checkpoint (tools/door_rank_exp.py) picked radius 0.3 / power 1
    m.nms_center_suppress_radius = 0.3
    # point-evidence pose refinement at eval (core.point_refine):
    # offline on the v5 checkpoint door 3D AP 0.676 -> 0.926
    del m.yaw_point_refine_classes[:]
    m.yaw_point_refine_classes.extend(["wall", "door"])
    m.yaw_point_refine_recenter = True
    for cs in m.target_assigner.class_settings:
        if cs.class_name == "door":
            cs.anchor_generator_range.matched_threshold = 0.62
    tr = cfg.train_input_reader
    tr.dataset.kitti_root_path = str(data_root)
    tr.dataset.kitti_info_path = str(
        data_root / "building_infos_train.pkl")
    pp = tr.preprocess
    db = pp.database_sampler
    db.database_info_path = str(data_root / "building_dbinfos_train.pkl")
    g = db.sample_groups.add()
    g.name_to_max_num["door"] = 8
    g = db.sample_groups.add()
    g.name_to_max_num["column"] = 5
    ps = db.database_prep_steps.add()
    ps.filter_by_min_num_points.min_num_point_pairs["door"] = 40
    ps.filter_by_min_num_points.min_num_point_pairs["column"] = 60
    db.rate = 1.0
    tc = cfg.train_config
    tc.steps = steps
    tc.steps_per_eval = steps + 1
    tc.save_checkpoints_secs = 120
    # eval reader stays zero-disk synthetic (num_synthetic=32, seed 7) —
    # the SAME val split every round reports on
    return str(cfg)


def run_chunk(cfg_path, model_dir, upto: int) -> int:
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from automatic_as_built_reconstruction_tpu.train import train as t\n"
        "state = t.train(%r, %r, max_steps=%d, display_step=50)\n"
        "print('chunk done at step', int(state['step']))\n"
        % (str(REPO), str(cfg_path), str(model_dir), upto))
    return subprocess.call([sys.executable, "-c", code])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--data_root", default="/tmp/building_1k")
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--quality_weight", type=float, default=1.0)
    ap.add_argument("--eval_only", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the eval onto CPU — required while any "
                         "other process holds the single-client TPU relay")
    args = ap.parse_args()

    data_root = pathlib.Path(args.data_root)
    model_dir = pathlib.Path(args.model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    ensure_data(data_root)
    cfg_path = model_dir / "asbuilt_v5.config"
    if not cfg_path.exists():
        cfg_path.write_text(make_config(data_root, args.steps,
                                        args.quality_weight))
        print(f"config -> {cfg_path}")

    if not args.eval_only:
        # resume the chunk ladder from the newest on-disk checkpoint (a
        # babysitter restart must not spin up no-op TPU clients — each
        # client init risks re-wedging the single-client relay)
        done = 0
        ckpt_dir = model_dir / "checkpoints"
        if ckpt_dir.is_dir():
            steps_on_disk = [int(p.name) for p in ckpt_dir.iterdir()
                             if p.name.isdigit()]
            if steps_on_disk:
                done = max(steps_on_disk)
        upto = (done // args.chunk + 1) * args.chunk
        while True:
            target = min(upto, args.steps)
            print(f"=== chunk to step {target} ===", flush=True)
            rc = run_chunk(cfg_path, model_dir, target)
            if rc != 0:
                print(f"chunk exited rc={rc}; stopping")
                return rc
            if target == args.steps:
                break
            upto += args.chunk

    print("=== evaluate ===", flush=True)
    force_cpu = ("import jax; jax.config.update('jax_platforms', 'cpu')\n"
                 if args.cpu else "")
    template = (
        "import sys; sys.path.insert(0, %r)\n" + force_cpu +
        "from automatic_as_built_reconstruction_tpu.train import train as t\n"
        "r = t.evaluate(%r, %r)\n"
        "ks = sorted(k for k, v in r.items() if isinstance(v, float))\n"
        "print('\\n'.join('%%s: %%.4f' %% (k, r[k]) for k in ks))\n")
    code = template % (str(REPO), str(cfg_path), str(model_dir))
    return subprocess.call([sys.executable, "-c", code])


if __name__ == "__main__":
    raise SystemExit(main())
