"""Per-stage latency breakdown for the SECOND/FHD serving path.

Times cumulative jit-program prefixes (XLA DCEs everything after the
returned stage, the same trick as ``evaluate --measure_time``
[ref: second/pytorch/train.py --measure_time per-stage timers]):

  S0 voxelize | S1 +VFE+middle | S2 +RPN | S3 +decode+NMS (full)

for both sparse serving modes (on-device merge-join rulebooks vs
key-match join inside the Pallas kernel), using bench.py's loop-delta
measurement so the relay dispatch overhead cancels.

Usage:
  python tools/probe_fhd.py [--batch 2] [--vcap 16384] [--cpu]

--cpu forces the CPU platform (mechanics check; timings meaningless).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--vcap", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--trace_only", action="store_true",
                    help="jax.eval_shape every stage instead of timing "
                         "(mechanics check without device execution)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.models.voxelnet import (
        VoxelNet)
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    B, VCAP, PPV = args.batch, args.vcap, 5
    _, vcfg, anchors_np = bench._fhd_model(jax, jnp)
    vcfg = dataclasses.replace(
        vcfg, compute_dtype="bfloat16", sparse_use_pallas_gemm=True)

    base = np.stack([bench.make_scene(1000 + b) for b in range(B)])
    num_valid = jnp.full((B,), bench.NUM_POINTS, jnp.int32)

    def voxelize(p, n):
        return voxelize_jax.voxelize(
            p, n, voxel_size=vcfg.voxel_size, pc_range=vcfg.pc_range,
            grid_size=vcfg.grid_size, max_points=PPV, max_voxels=VCAP,
            first_appearance=False)

    vox0 = jax.vmap(voxelize)(jnp.asarray(base), num_valid)
    anchors = jnp.asarray(anchors_np)
    anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)

    model0 = VoxelNet(cfg=vcfg)
    variables = model0.init(jax.random.key(0), vox0.voxels[:1, :64],
                            vox0.num_points[:1, :64], vox0.coords[:1, :64])

    def stage_fns(model, mcfg):
        def s0(i, pts0):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            return (jnp.sum(r.num_points) + jnp.sum(r.coords)).astype(
                jnp.float32)

        def s1(i, pts0):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            _, stages = model.apply(variables, r.voxels, r.num_points,
                                    r.coords, train=False,
                                    return_stages=True)
            return jnp.sum(
                stages["spatial_features"].astype(jnp.float32))

        def s2(i, pts0):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in preds.values())

        def s3(i, pts0):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            det = voxelnet_mod.predict(preds, anchors_b, mcfg)
            return (jnp.sum(det["box3d_lidar"]
                            * det["valid"][..., None]).astype(jnp.float32)
                    + jnp.sum(det["scores"]))

        return [("voxelize", s0), ("vfe_middle", s1), ("rpn", s2),
                ("decode_nms", s3)]

    pts = jnp.asarray(base)
    out = {}
    if args.trace_only:
        for mode in ("rulebook", "keymatch"):
            mcfg = dataclasses.replace(vcfg,
                                       sparse_keymatch=(mode == "keymatch"))
            model = VoxelNet(cfg=mcfg)
            for name, fn in stage_fns(model, mcfg):
                s = jax.eval_shape(fn, jnp.float32(1.0), pts)
                print(f"[probe] trace {mode:8s} {name:12s} -> "
                      f"{s.shape} {s.dtype}")
        print(json.dumps({"trace_only": True}))
        return
    for mode in ("rulebook", "keymatch"):
        mcfg = dataclasses.replace(vcfg, sparse_keymatch=(mode == "keymatch"))
        model = VoxelNet(cfg=mcfg)
        cum, prev = {}, 0.0
        for name, fn in stage_fns(model, mcfg):
            r_lo, r_hi = (2, 6) if name == "voxelize" else (1, 3)
            dt = bench._loop_delta(jax, jnp, fn, (pts,), r_lo, r_hi)
            per_scan_ms = dt / B * 1e3
            cum[name] = {"cum_ms": round(per_scan_ms, 3),
                         "delta_ms": round(per_scan_ms - prev, 3)}
            prev = per_scan_ms
            print(f"[probe] {mode:8s} {name:12s} cum {per_scan_ms:8.3f} ms"
                  f"  delta {cum[name]['delta_ms']:8.3f} ms", flush=True)
        out[mode] = {"stages": cum,
                     "full_scans_per_sec": round(B / (prev / 1e3 * B), 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
