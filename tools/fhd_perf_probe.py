#!/usr/bin/env python
"""On-TPU serving perf probe — run ONLY when no other TPU client is live.

Sweeps the two knobs the round-4 perf plan needs measured (one JSON line
per variant, printed incrementally so a timeout still leaves data):

  --fhd     : car.fhd key-match full pipeline with dense_tail_blocks in
              --tails (the sparse-vs-dense crossover of DESIGN.md sec. 16)
  --pillar  : flagship pillar full pipeline at batch sizes in --batches
              (MXU utilization vs dispatch amortization)

Reuses bench.py's setup (measured site caps, cached autotuned windows,
loop-delta timing) so numbers are directly comparable with the headline
bench, and warms the on-disk XLA compile cache the driver's bench run
will hit.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def _emit(rec: dict):
    print(json.dumps(rec), flush=True)


def probe_fhd(jax, jnp, tails):
    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)

    s = bench._fhd_setup(jax, jnp)
    vcfg, B = s["vcfg"], s["B"]
    km_windows, km_window = s["km_windows"], s["km_window"]
    anchors = jnp.asarray(s["anchors_np"])
    anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)
    vox0, voxelize, num_valid = s["vox0"], s["voxelize"], s["num_valid"]
    pts = jnp.asarray(s["base"])

    vcfg_km = dataclasses.replace(
        vcfg, sparse_keymatch=True,
        sparse_pallas_window=(tuple(int(w) for w in km_windows)
                              if km_windows else km_window))
    # params/batch_stats names are shared across sparse and dense-tail
    # paths (MaskedBatchNorm <-> masked dense BN, same block names) —
    # init once, reuse for every tail depth
    model0 = s["VoxelNet"](cfg=vcfg_km)
    variables = model0.init(jax.random.key(0), vox0.voxels[:1, :64],
                            vox0.num_points[:1, :64], vox0.coords[:1, :64])

    for t in tails:
        vcfg_t = dataclasses.replace(vcfg_km, sparse_dense_tail_blocks=t)
        model = s["VoxelNet"](cfg=vcfg_t)

        def stage_full(i, pts0, model=model, vcfg_t=vcfg_t):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            det = voxelnet_mod.predict(preds, anchors_b, vcfg_t)
            return (jnp.sum(det["box3d_lidar"]
                            * det["valid"][..., None]).astype(jnp.float32)
                    + jnp.sum(det["scores"]))

        bench._progress(f"fhd probe: dense_tail_blocks={t}")
        try:
            dt = bench._loop_delta(jax, jnp, stage_full, (pts,), 1, 3)
            _emit({"probe": "fhd", "dense_tail_blocks": t,
                   "scans_per_sec": round(B / dt, 2),
                   "ms_per_scan": round(dt / B * 1e3, 2)})
        except Exception as e:  # keep sweeping the other depths
            _emit({"probe": "fhd", "dense_tail_blocks": t,
                   "error": repr(e)[:200]})


def probe_tiles(jax, jnp, tile_configs, dense_tail=1):
    """Sweep (pallas_tile, per-block keymatch windows) pairs for the
    key-match serving pipeline.  The one-hot gather does L * W(TN) MXU
    work per (join, Cin): W shrinks with the tile (a tile's query-key
    span is roughly linear in TN plus a tap-offset constant), so smaller
    tiles cut the dominant cost — tools/span_analysis.py predicts W(TN)
    on host; this measures the end-to-end effect on TPU.

    tile_configs: list of (tile, [w_block0, w_block1, ...])."""
    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)

    s = bench._fhd_setup(jax, jnp)
    vcfg, B = s["vcfg"], s["B"]
    anchors = jnp.asarray(s["anchors_np"])
    anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)
    vox0, voxelize, num_valid = s["vox0"], s["voxelize"], s["num_valid"]
    pts = jnp.asarray(s["base"])

    model0 = s["VoxelNet"](cfg=s["vcfg"])
    variables = model0.init(jax.random.key(0), vox0.voxels[:1, :64],
                            vox0.num_points[:1, :64], vox0.coords[:1, :64])

    for tile, windows in tile_configs:
        vcfg_t = dataclasses.replace(
            vcfg, sparse_keymatch=True, sparse_pallas_tile=int(tile),
            sparse_pallas_window=tuple(int(w) for w in windows),
            sparse_dense_tail_blocks=dense_tail)
        model = s["VoxelNet"](cfg=vcfg_t)

        def stage_full(i, pts0, model=model, vcfg_t=vcfg_t):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            det = voxelnet_mod.predict(preds, anchors_b, vcfg_t)
            return (jnp.sum(det["box3d_lidar"]
                            * det["valid"][..., None]).astype(jnp.float32)
                    + jnp.sum(det["scores"]))

        bench._progress(f"tile probe: tile={tile} windows={windows}")
        try:
            dt = bench._loop_delta(jax, jnp, stage_full, (pts,), 1, 3)
            _emit({"probe": "tile", "tile": int(tile),
                   "windows": [int(w) for w in windows],
                   "dense_tail_blocks": dense_tail,
                   "scans_per_sec": round(B / dt, 2),
                   "ms_per_scan": round(dt / B * 1e3, 2)})
        except Exception as e:
            _emit({"probe": "tile", "tile": int(tile),
                   "error": repr(e)[:200]})


def probe_pillar(jax, jnp, batches):
    import bench
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
    MAX_VOXELS, MAX_PPV = 12000, 32
    n_pts = bench.NUM_POINTS

    fmap = (1, cfg.grid_size[1] // 2, cfg.grid_size[0] // 2)
    agen = anchors_mod.AnchorGeneratorRange(
        anchor_ranges=(cfg.pc_range[0], cfg.pc_range[1], -1.78,
                       cfg.pc_range[3], cfg.pc_range[4], -1.78),
        sizes=((1.6, 3.9, 1.56),), rotations=(0, np.pi / 2))
    anchors = jnp.asarray(
        agen.generate(fmap).reshape(-1, 7).astype(np.float32))

    voxelize = jax.vmap(
        lambda p, n: voxelize_jax.voxelize(
            p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
            grid_size=cfg.grid_size, max_points=MAX_PPV,
            max_voxels=MAX_VOXELS, first_appearance=False))

    variables = None
    for B in batches:
        base = np.stack([bench.make_scene(b, n_pts) for b in range(B)])
        num_valid = jnp.full((B,), n_pts, jnp.int32)
        anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)
        if variables is None:
            r0 = voxelize(jnp.asarray(base[:1]), num_valid[:1])
            variables = model.init(jax.random.key(0), r0.voxels[:, :64],
                                   r0.num_points[:, :64], r0.coords[:, :64])

        def stage_full(i, pts0, num_valid=num_valid, anchors_b=anchors_b):
            r = voxelize(pts0 + 0.011 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            det = voxelnet_mod.predict(preds, anchors_b, cfg)
            return (jnp.sum(det["box3d_lidar"]
                            * det["valid"][..., None]).astype(jnp.float32)
                    + jnp.sum(det["scores"]))

        bench._progress(f"pillar probe: B={B}")
        try:
            dt = bench._loop_delta(jax, jnp, stage_full,
                                   (jnp.asarray(base),), 1, 3)
            _emit({"probe": "pillar", "batch": B,
                   "scans_per_sec": round(B / dt, 2),
                   "ms_per_scan": round(dt / B * 1e3, 3)})
        except Exception as e:
            _emit({"probe": "pillar", "batch": B, "error": repr(e)[:200]})


def probe_modes(jax, jnp, tiles, dense_tail=1):
    """Grouped-tap + dense-tail serving pipeline at alternative output
    tiles, with the FULL window/subwindow/group autotune pairs from
    tools/tile128_prep.py (artifacts/keymatch_tile_pairs.json) — the
    end-to-end measurement of span_analysis' tile-shrink prediction
    (463 -> 335 one-hot GMACs at tile 128 on bench scenes)."""
    import json as _json

    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)

    pairs = _json.loads(
        (REPO / "artifacts" / "keymatch_tile_pairs.json").read_text())
    s = bench._fhd_setup(jax, jnp)
    vcfg, B = s["vcfg"], s["B"]
    anchors = jnp.asarray(s["anchors_np"])
    anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)
    vox0, voxelize, num_valid = s["vox0"], s["voxelize"], s["num_valid"]
    pts = jnp.asarray(s["base"])

    # init through a TINY-caps twin: param/BN shapes depend only on
    # channel widths, and a full-caps init is one multi-second dispatch
    # — the profile that wedges the axon relay (see bench_second_fhd)
    vcfg_init = dataclasses.replace(
        vcfg, sparse_out_caps=tuple(256 for _ in s["site_caps"]),
        sparse_pallas_window=256, sparse_use_pallas_gemm=False)
    variables = s["VoxelNet"](cfg=vcfg_init).init(
        jax.random.key(0), vox0.voxels[:1, :64],
        vox0.num_points[:1, :64], vox0.coords[:1, :64])

    for tile in tiles:
        p = pairs[str(tile)]
        vcfg_t = dataclasses.replace(
            vcfg, sparse_keymatch=True, sparse_keymatch_group=True,
            sparse_pallas_tile=int(tile),
            sparse_pallas_window=tuple(tuple(int(w) for w in q)
                                       for q in p["win"]),
            sparse_keymatch_subwindow=tuple(tuple(int(w) for w in q)
                                            for q in p["grp"]),
            sparse_dense_tail_blocks=dense_tail)
        model = s["VoxelNet"](cfg=vcfg_t)

        def stage_full(i, pts0, model=model, vcfg_t=vcfg_t):
            r = jax.vmap(voxelize)(pts0 + 0.013 * (i + 1.0), num_valid)
            preds = model.apply(variables, r.voxels, r.num_points,
                                r.coords, train=False)
            det = voxelnet_mod.predict(preds, anchors_b, vcfg_t)
            return (jnp.sum(det["box3d_lidar"]
                            * det["valid"][..., None]).astype(jnp.float32)
                    + jnp.sum(det["scores"]))

        bench._progress(f"modes probe: tile={tile} grouped+dt{dense_tail}")
        try:
            dt = bench._loop_delta(jax, jnp, stage_full, (pts,), 1, 3)
            _emit({"probe": "modes", "tile": int(tile),
                   "dense_tail_blocks": dense_tail, "grouped": True,
                   "scans_per_sec": round(B / dt, 2),
                   "ms_per_scan": round(dt / B * 1e3, 2)})
        except Exception as e:
            _emit({"probe": "modes", "tile": int(tile),
                   "error": repr(e)[:200]})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fhd", action="store_true")
    ap.add_argument("--modes", default="",
                    help="comma-separated tiles for the grouped+dense-"
                         "tail probe (pairs from tile128_prep.py), "
                         "e.g. '128,192'")
    ap.add_argument("--pillar", action="store_true")
    ap.add_argument("--tails", default="0,1,2,3")
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--tile_configs", default="",
                    help="semicolon-separated tile:w0,w1,w2,w3 entries, "
                         "e.g. '128:256,384,512,512;64:128,256,384,384'")
    args = ap.parse_args()

    import jax

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    if args.fhd:
        probe_fhd(jax, jnp,
                  [int(t) for t in args.tails.split(",") if t != ""])
    if args.modes:
        probe_modes(jax, jnp,
                    [int(t) for t in args.modes.split(",") if t != ""])
    if args.tile_configs:
        cfgs = []
        for entry in args.tile_configs.split(";"):
            tile, ws = entry.split(":")
            cfgs.append((int(tile), [int(w) for w in ws.split(",")]))
        probe_tiles(jax, jnp, cfgs)
    if args.pillar:
        probe_pillar(jax, jnp,
                     [int(b) for b in args.batches.split(",") if b != ""])


if __name__ == "__main__":
    main()
