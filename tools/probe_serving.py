"""Serving-perf probe: sweep the two cheap knobs on the real TPU.

- SECOND-FHD key-match pipeline: dense_tail_blocks in {1, 2, 3}
  (bench.py's headline uses 2; the crossover density is data-dependent).
- PointPillars full pipeline: batch in {8, 16} (per-chip scans/s can
  rise with more batch-amortization of decode+NMS).

Run ONLY while no other process holds the TPU relay.  Loads the
per-block windows from bench_cache.json like bench.py's default path.

Usage: python tools/probe_serving.py [--fhd] [--pillar]
"""
from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (repo-root bench.py: helpers + cache)


def probe_fhd(jax, jnp):
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    VoxelNet, vcfg, anchors_np = bench._fhd_model(jax, jnp)
    B, VCAP, PPV, n_pts = 2, 16384, 5, bench.NUM_POINTS
    vcfg = dataclasses.replace(
        vcfg, compute_dtype="bfloat16", sparse_use_pallas_gemm=True)
    base = np.stack([bench.make_scene(1000 + b, n_pts) for b in range(B)])
    num_valid = jnp.full((B,), n_pts, jnp.int32)

    def voxelize(p, n):
        return voxelize_jax.voxelize(
            p, n, voxel_size=vcfg.voxel_size, pc_range=vcfg.pc_range,
            grid_size=vcfg.grid_size, max_points=PPV, max_voxels=VCAP,
            first_appearance=False)

    vox0 = jax.vmap(voxelize)(jnp.asarray(base), num_valid)
    grid_dhw, specs = sc.respec(voxelnet_mod.middle_plan(vcfg, VCAP))
    site_caps = sc.measure_site_caps(
        list(np.asarray(vox0.coords)), grid_dhw, specs, safety=1.1)
    vcfg = dataclasses.replace(vcfg, sparse_out_caps=site_caps)
    cache_params = {"n_pts": n_pts, "B": B, "VCAP": VCAP, "PPV": PPV,
                    "tile": int(vcfg.sparse_pallas_tile),
                    "site_caps": [int(c) for c in site_caps]}
    cached = bench._cache_load(cache_params)
    assert cached is not None, "run bench.py first to fill bench_cache.json"
    km_windows = cached.get("keymatch_windows") or [
        int(cached["keymatch_window"])] * len(specs)
    vcfg = dataclasses.replace(
        vcfg, sparse_keymatch=True,
        sparse_pallas_window=tuple(int(w) for w in km_windows))

    anchors = jnp.asarray(anchors_np)
    anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)
    variables = None
    pts = jnp.asarray(base)
    for tail in (1, 2, 3):
        vcfg_t = dataclasses.replace(vcfg, sparse_dense_tail_blocks=tail)
        model = VoxelNet(cfg=vcfg_t)
        if variables is None:
            variables = model.init(
                jax.random.key(0), vox0.voxels[:1, :64],
                vox0.num_points[:1, :64], vox0.coords[:1, :64])

        def stage(i, pts0, model=model, vcfg_t=vcfg_t):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            det = voxelnet_mod.predict(preds, anchors_b, vcfg_t)
            return (jnp.sum(det["box3d_lidar"]
                            * det["valid"][..., None]).astype(jnp.float32)
                    + jnp.sum(det["scores"]))

        dt = bench._loop_delta(jax, jnp, stage, (pts,), 1, 3)
        print(f"fhd tail={tail}: {B / dt:.2f} scans/s "
              f"({dt / B * 1e3:.2f} ms/scan)", flush=True)


def probe_pillar(jax, jnp):
    from __graft_entry__ import _flagship_cfg
    from automatic_as_built_reconstruction_tpu.core import (
        anchors as anchors_mod)
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.models.voxelnet import (
        VoxelNet)
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    cfg = _flagship_cfg()
    model = VoxelNet(cfg=cfg)
    MAX_VOXELS, MAX_PPV, n_pts = 12000, 32, bench.NUM_POINTS
    fmap = (1, cfg.grid_size[1] // 2, cfg.grid_size[0] // 2)
    agen = anchors_mod.AnchorGeneratorRange(
        anchor_ranges=(cfg.pc_range[0], cfg.pc_range[1], -1.78,
                       cfg.pc_range[3], cfg.pc_range[4], -1.78),
        sizes=((1.6, 3.9, 1.56),), rotations=(0, np.pi / 2))
    anchors = jnp.asarray(
        agen.generate(fmap).reshape(-1, 7).astype(np.float32))

    for B in (8, 16):
        base = np.stack([bench.make_scene(b, n_pts) for b in range(B)])
        num_valid = jnp.full((B,), n_pts, jnp.int32)
        anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)
        voxelize = jax.vmap(
            lambda p, n: voxelize_jax.voxelize(
                p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
                grid_size=cfg.grid_size, max_points=MAX_PPV,
                max_voxels=MAX_VOXELS, first_appearance=False))
        r0 = voxelize(jnp.asarray(base), num_valid)
        variables = model.init(jax.random.key(0), r0.voxels[:1, :64],
                               r0.num_points[:1, :64], r0.coords[:1, :64])

        def stage(i, pts0, B=B, num_valid=num_valid, anchors_b=anchors_b,
                  voxelize=voxelize, variables=variables):
            r = voxelize(pts0 + 0.011 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            det = voxelnet_mod.predict(preds, anchors_b, cfg)
            return (jnp.sum(det["box3d_lidar"]
                            * det["valid"][..., None]).astype(jnp.float32)
                    + jnp.sum(det["scores"]))

        dt = bench._loop_delta(jax, jnp, stage, (jnp.asarray(base),), 1, 3)
        print(f"pillar B={B}: {B / dt:.2f} scans/s "
              f"({dt / B * 1e3:.3f} ms/scan)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fhd", action="store_true")
    ap.add_argument("--pillar", action="store_true")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    try:
        cache_dir = REPO / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    if args.fhd or not args.pillar:
        probe_fhd(jax, jnp)
    if args.pillar or not args.fhd:
        probe_pillar(jax, jnp)


if __name__ == "__main__":
    main()
