#!/usr/bin/env python
"""Per-stage timing of the flagship pillar network on TPU.

The pillar full pipeline sits at ~4.8 ms/scan (B=8): vox 0.66 / net 3.2
/ decode+NMS 0.9.  The network's 71 GFLOP at 3.2 ms is ~22 TF/s — ~11%
of v5e bf16 peak, far below what dense 3x3 convs should sustain.  This
probe times the forward's sub-stages separately to find the sink:

  pfn      : PillarFeatureNet + scatter to BEV canvas
  backbone : the three ConvBlock stacks (stride 2/2/2)
  upsample : the three ConvTranspose upsamples (1x/2x/4x)
  heads    : 1x1 conv heads on the concatenated 768-ch map

One JSON line per stage.  Run ONLY when no other TPU client is live.
"""
from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from automatic_as_built_reconstruction_tpu.models.rpn import (
        ConvBlock, RPN, Upsample)

    B = 8
    H, W, C = 496, 432, 64
    dt = jnp.bfloat16
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (B, H, W, C), dt)

    def emit(rec):
        print(json.dumps(rec), flush=True)

    # --- full RPN (reference point) — flagship pillar config
    # (__graft_entry__._flagship_cfg): filters (64,128,256), upsample
    # filters (128,128,128) -> 384-ch concat
    FILTERS = (64, 128, 256)
    UPF = (128, 128, 128)
    rpn = RPN(num_filters=FILTERS, num_upsample_filters=UPF, dtype=dt)
    vars_rpn = rpn.init(rng, x0, train=False)

    def stage_rpn(i, x):
        p = rpn.apply(vars_rpn, x + (i * 1e-3).astype(dt), train=False)
        return sum(jnp.sum(v).astype(jnp.float32) for v in p.values())

    bench._progress("rpn: full")
    t = bench._loop_delta(jax, jnp, stage_rpn, (x0,), 2, 6)
    emit({"probe": "rpn_full", "ms_per_batch": round(t * 1e3, 3),
          "ms_per_scan": round(t / B * 1e3, 3)})

    # --- backbone blocks only
    blocks = [ConvBlock(f, n, 2, dtype=dt)
              for n, f in zip((3, 5, 5), FILTERS)]
    bvars, xs = [], []
    x = x0
    for blk in blocks:
        bvars.append(blk.init(rng, x, train=False))
        xs.append(x)
        x = blk.apply(bvars[-1], x, train=False)

    def stage_backbone(i, x):
        h = x + (i * 1e-3).astype(dt)
        acc = jnp.float32(0)
        for blk, v in zip(blocks, bvars):
            h = blk.apply(v, h, train=False)
            acc = acc + jnp.sum(h).astype(jnp.float32)
        return acc

    bench._progress("rpn: backbone")
    t = bench._loop_delta(jax, jnp, stage_backbone, (x0,), 2, 6)
    emit({"probe": "rpn_backbone", "ms_per_batch": round(t * 1e3, 3)})

    # --- each upsample on its real input shape
    shapes = [tuple(blk.apply(v, xi, train=False).shape)
              for blk, v, xi in zip(blocks, bvars, xs)]
    for i, (s, up_s) in enumerate(zip(shapes, (1, 2, 4))):
        up = Upsample(UPF[i], up_s, dtype=dt)
        xi = jax.random.normal(rng, s, dt)
        uv = up.init(rng, xi, train=False)

        def stage_up(j, x, up=up, uv=uv):
            return jnp.sum(up.apply(
                uv, x + (j * 1e-3).astype(dt),
                train=False)).astype(jnp.float32)

        bench._progress(f"rpn: upsample{i} stride={up_s} in={s}")
        t = bench._loop_delta(jax, jnp, stage_up, (xi,), 2, 6)
        emit({"probe": f"rpn_upsample{i}", "stride": up_s,
              "in_shape": list(s), "ms_per_batch": round(t * 1e3, 3)})

    # --- heads on the concatenated map
    import flax.linen as nn

    xcat = jax.random.normal(rng, (B, H // 2, W // 2, sum(UPF)), dt)
    head = nn.Conv(2 * 7 + 2 * 1 + 2 * 2, (1, 1), dtype=dt)
    hv = head.init(rng, xcat)

    def stage_heads(i, x):
        return jnp.sum(head.apply(
            hv, x + (i * 1e-3).astype(dt))).astype(jnp.float32)

    bench._progress("rpn: heads")
    t = bench._loop_delta(jax, jnp, stage_heads, (xcat,), 2, 6)
    emit({"probe": "rpn_heads", "ms_per_batch": round(t * 1e3, 3)})

    probe_pfn(jax, jnp, emit)


def probe_pfn(jax, jnp, emit):
    """Flat-path PFN + scatter breakdown on the flagship pillar config.

    The r5 stage split (bench_r5a) puts the network stage at 2.28
    ms/scan of which the RPN probe accounts 0.81 — this times the
    remaining PFN (segment ops) and scatter (Pallas one-hot canvas)
    stages via return_stages + XLA dead-code elimination."""
    import bench
    from __graft_entry__ import _flagship_cfg
    from automatic_as_built_reconstruction_tpu.models.voxelnet import (
        VoxelNet)
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    cfg = _flagship_cfg()
    model = VoxelNet(cfg=cfg)
    B, MAX_VOXELS, MAX_PPV = 8, 12000, 32
    n_pts = bench.NUM_POINTS
    base = np.stack([bench.make_scene(b, n_pts) for b in range(B)])
    num_valid = jnp.full((B,), n_pts, jnp.int32)
    voxelize_flat = jax.vmap(
        lambda p, n: voxelize_jax.voxelize_flat(
            p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
            grid_size=cfg.grid_size, max_points=MAX_PPV,
            max_voxels=MAX_VOXELS, first_appearance=False))
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 64, MAX_PPV, base.shape[-1]), jnp.float32),
        jnp.zeros((1, 64), jnp.int32),
        jnp.full((1, 64, 3), -1, jnp.int32))
    pts = jnp.asarray(base)

    def cut(which):
        def stage(i, pts0):
            r = voxelize_flat(pts0 + 0.011 * (i + 1.0), num_valid)
            preds, stages = model.apply(
                variables, None, r.num_points, r.coords, train=False,
                flat_points=r.points, flat_slot=r.slot,
                flat_slots_sorted=True, return_stages=True)
            if which == "vfe":
                return jnp.sum(stages["voxel_features"]
                               .astype(jnp.float32))
            if which == "scatter":
                return jnp.sum(stages["spatial_features"]
                               .astype(jnp.float32))
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in preds.values())
        return stage

    prev = 0.0
    for which in ("vfe", "scatter", "net"):
        bench._progress(f"pfn probe: cut={which}")
        t = bench._loop_delta(jax, jnp, cut(which), (pts,), 1, 3)
        emit({"probe": f"pfn_cut_{which}",
              "ms_per_scan_cum": round(t / B * 1e3, 3),
              "ms_per_scan_delta": round((t - prev) / B * 1e3, 3)})
        prev = t

    # --- scatter-free segment ops (flat_segment_scan): full flat
    # pipeline with the boundary cumsum + segmented-scan max PFN
    import dataclasses
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.core import (
        anchors as anchors_mod)
    cfg_scan = dataclasses.replace(cfg, flat_segment_scan=True)
    model_scan = VoxelNet(cfg=cfg_scan)
    fmap = (1, cfg.grid_size[1] // 2, cfg.grid_size[0] // 2)
    agen = anchors_mod.AnchorGeneratorRange(
        anchor_ranges=(cfg.pc_range[0], cfg.pc_range[1], -1.78,
                       cfg.pc_range[3], cfg.pc_range[4], -1.78),
        sizes=((1.6, 3.9, 1.56),), rotations=(0, np.pi / 2))
    anchors = jnp.asarray(
        agen.generate(fmap).reshape(-1, 7).astype(np.float32))
    anchors_b = jnp.broadcast_to(anchors, (B,) + anchors.shape)

    def stage_scan_full(i, pts0):
        r = voxelize_flat(pts0 + 0.011 * (i + 1.0), num_valid)
        preds = model_scan.apply(
            variables, None, r.num_points, r.coords, train=False,
            flat_points=r.points, flat_slot=r.slot,
            flat_slots_sorted=True)
        det = voxelnet_mod.predict(preds, anchors_b, cfg_scan)
        return (jnp.sum(det["box3d_lidar"]
                        * det["valid"][..., None]).astype(jnp.float32)
                + jnp.sum(det["scores"]))

    bench._progress("pfn probe: full pipeline with flat_segment_scan")
    t = bench._loop_delta(jax, jnp, stage_scan_full, (pts,), 1, 3)
    emit({"probe": "pfn_segment_scan_full",
          "scans_per_sec": round(B / t, 2),
          "ms_per_scan": round(t / B * 1e3, 3)})


if __name__ == "__main__":
    main()
