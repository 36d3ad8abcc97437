"""Tile x batch sweep for the FHD key-match serving pipeline.

The shared-window Pallas kernel's dominant cost is the one-hot gather
matmul, ~tile x window x Cin per (tile, tap): the window (union span of
in-window input sites) scales sub-linearly with tile, so smaller tiles
can cut total gather FLOPs — at the price of more grid steps and DMA
descriptors.  This sweeps the (sparse_pallas_tile, batch) grid over the
FULL key-match pipeline (device voxelize -> middle -> RPN -> decode +
rotated NMS), with the key-match window re-autotuned per tile, and
prints one JSON line per combo.

Usage (needs the real TPU; ~2 min/combo, most of it relay compiles):
  python tools/sweep_fhd.py [--tiles 128,256,512] [--batches 2,4]
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
    ap.add_argument("--tiles", default="128,256,512")
    ap.add_argument("--batches", default="2,4")
    ap.add_argument("--vcap", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
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

    tiles = [int(t) for t in args.tiles.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    VCAP, PPV = args.vcap, 5
    _, vcfg0, anchors_np = bench._fhd_model(jax, jnp)
    vcfg0 = dataclasses.replace(
        vcfg0, compute_dtype="bfloat16", sparse_use_pallas_gemm=True,
        sparse_keymatch=True)
    plan = voxelnet_mod.middle_plan(vcfg0, VCAP)
    anchors = jnp.asarray(anchors_np)

    def voxelize(p, n):
        return voxelize_jax.voxelize(
            p, n, voxel_size=vcfg0.voxel_size, pc_range=vcfg0.pc_range,
            grid_size=vcfg0.grid_size, max_points=PPV, max_voxels=VCAP,
            first_appearance=False)

    results = []
    for B in batches:
        base = np.stack([bench.make_scene(1000 + b) for b in range(B)])
        num_valid = jnp.full((B,), bench.NUM_POINTS, jnp.int32)
        vox0 = jax.vmap(voxelize)(jnp.asarray(base), num_valid)
        anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)
        for tile in tiles:
            km_window = bench._keymatch_autotune(
                jax, jnp, vox0.coords[0], plan, tile)
            vcfg = dataclasses.replace(
                vcfg0, sparse_pallas_tile=tile,
                sparse_pallas_window=km_window)
            model = VoxelNet(cfg=vcfg)
            variables = model.init(
                jax.random.key(0), vox0.voxels[:1, :64],
                vox0.num_points[:1, :64], vox0.coords[:1, :64])

            def stage_full_km(i, pts0):
                r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0),
                                       num_valid)
                preds = model.apply(variables, r.voxels, r.num_points,
                                    r.coords, train=False)
                det = voxelnet_mod.predict(preds, anchors_b, vcfg)
                return (jnp.sum(det["box3d_lidar"]
                                * det["valid"][..., None])
                        .astype(jnp.float32) + jnp.sum(det["scores"]))

            pts = jnp.asarray(base)
            dt = bench._loop_delta(jax, jnp, stage_full_km, (pts,), 1, 3)
            row = {"tile": tile, "batch": B, "km_window": int(km_window),
                   "ms_per_scan": round(1e3 * dt / B, 3),
                   "scans_per_sec": round(B / dt, 2)}
            print(json.dumps(row), flush=True)
            results.append(row)

    best = min(results, key=lambda r: r["ms_per_scan"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
