"""Host-side window/tile design study for the FHD key-match kernel.

The Pallas gather-GEMM's dominant cost is the one-hot gather matmul
[TN, W] @ [W, Cin] — W-proportional MXU work (the window DMA is ~30x
cheaper at these shapes).  This tool reproduces bench.py's key-match
autotune ENTIRELY ON HOST (forced-CPU jax; no relay client) over the
bench scenes and compares candidate schemes:

  - output tile TN in {128, 256}: smaller tiles shrink each tile's
    query-key range, hence the union window W;
  - shared (per-tile union) vs per-tap windows: a single tap's matches
    span less than the K-tap union; per-tap windows trade K separate
    (smaller) gathers for the union gather.

For each scheme it prints the per-block minimal windows and a gather
cost model: total one-hot MACs = sum_joins L * K * W * Cin vs useful
MACs = sum_joins L * K * Cin * Cout, plus the speed-of-light ms at the
chip's bf16 peak.  Use it to pick (tile, window mode) BEFORE burning a
TPU run [ref: memory round4-run-queue: per-block windows are the top
round-5 perf lever].
"""
from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def union_spans(in_keys, qk, tile):
    from automatic_as_built_reconstruction_tpu.ops.pallas import (
        sparse_gather_gemm as sgg)
    s = sgg.keymatch_window_spans(in_keys, qk, tile)
    return int(s.max()) if s.size else 0


def pertap_spans(in_keys, qk, tile):
    """max over taps of the single-tap per-tile span (the window a
    per-tap-window kernel variant would need)."""
    from automatic_as_built_reconstruction_tpu.ops.pallas import (
        sparse_gather_gemm as sgg)
    worst = 0
    for k in range(qk.shape[0]):
        s = sgg.keymatch_window_spans(in_keys, qk[k:k + 1], tile)
        if s.size:
            worst = max(worst, int(s.max()))
    return worst


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    VoxelNet, vcfg, _ = bench._fhd_model(jax, jax.numpy)
    vcfg = dataclasses.replace(vcfg, compute_dtype="bfloat16",
                               sparse_use_pallas_gemm=True)
    VCAP, PPV, n_pts = 16384, 5, bench.NUM_POINTS
    scene = bench.make_scene(1000, n_pts)
    vox = voxelize_jax.voxelize(
        jax.numpy.asarray(scene), jax.numpy.asarray(n_pts),
        voxel_size=vcfg.voxel_size, pc_range=vcfg.pc_range,
        grid_size=vcfg.grid_size, max_points=PPV, max_voxels=VCAP,
        first_appearance=False)
    plan = voxelnet_mod.middle_plan(vcfg, VCAP)

    # site caps measured the same way bench does
    grid_dhw, specs = sc.respec(plan)
    site_caps = sc.measure_site_caps([np.asarray(vox.coords)], grid_dhw,
                                     specs, safety=1.1)
    print(f"site caps: {site_caps}")
    plan = sc.plan_from_specs(grid_dhw, VCAP, specs, out_caps=site_caps)

    peak_macs = bench.V5E_BF16_PEAK_FLOPS / 2

    for tile in (256, 128, 64):
        print(f"\n=== tile {tile} ===")
        coords = vox.coords
        valid = coords[..., 0] >= 0
        rows = []
        total = {"shared": 0.0, "pertap": 0.0, "useful": 0.0}
        cin = 16   # SimpleVoxel mean features enter block 0
        for bi, blk in enumerate(plan):
            in_keys = np.asarray(jax.jit(
                lambda c, b=blk: sc.linearize(c, b.grid))(coords))
            joins = []   # (label, qk, n_convs, cins, couts, xy_area)
            if blk.n_subm > 0:
                qk = np.asarray(jax.jit(
                    lambda c, v, b=blk: sc.subm_tap_keys(
                        c, v, b.grid, b.subm_kernel))(coords, valid))
                cins = [cin] + [blk.subm_channels] * (blk.n_subm - 1)
                joins.append(("subm", qk, cins, blk.subm_channels, 1))
            sites = jax.jit(lambda c, v, b=blk: sc.build_strided_sites(
                c, v, b.grid, b.kernel, b.stride, b.pad,
                b.out_cap))(coords, valid)
            qk = np.asarray(jax.jit(
                lambda s, b=blk: sc.strided_tap_keys(
                    s, b.grid, b.kernel, b.stride, b.pad))(sites))
            joins.append(
                ("strided", qk,
                 [blk.subm_channels if blk.n_subm else cin],
                 blk.cout, int(blk.stride[1] * blk.stride[2])))

            for label, qk, cins, cout, area in joins:
                K, M = qk.shape
                L = -(-max(len(in_keys), M) // tile) * tile
                w_u = -(-union_spans(in_keys, qk, tile) // 128) * 128
                w_t = -(-pertap_spans(in_keys, qk, tile) // 128) * 128
                w_u, w_t = max(w_u, 128), max(w_t, 128)
                for ci in cins:
                    total["shared"] += L * K * w_u * ci
                    total["pertap"] += L * K * w_t * ci
                    total["useful"] += L * K * ci * cout
                rows.append((bi, label, K, L, w_u, w_t, area))
            coords, valid = sites.out_coords, sites.out_valid
            cin = blk.cout
        print(f"{'blk':>3} {'join':>8} {'K':>3} {'L':>6} "
              f"{'W_union':>8} {'W_pertap':>9} {'xyarea':>6}")
        for r in rows:
            print(f"{r[0]:>3} {r[1]:>8} {r[2]:>3} {r[3]:>6} "
                  f"{r[4]:>8} {r[5]:>9} {r[6]:>6}")
        for mode in ("shared", "pertap"):
            macs = total[mode]
            print(f"{mode:>7}: gather {macs / 1e9:.2f} GMACs "
                  f"(+useful {total['useful'] / 1e9:.2f}) "
                  f"-> SoL {1e3 * (macs + total['useful']) / peak_macs:.2f} "
                  f"ms/scan at bf16 peak")


if __name__ == "__main__":
    main()
