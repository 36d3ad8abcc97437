"""Host-side MAC model for the key-match gather at successive window
policies, on the bench FHD scenes:

  union    : per-join union window (keymatch_win_pairs — shared kernel)
  subwin   : per-join per-tap SUBWINDOW (keymatch_sub_pairs — the
             committed subwindow kernel: compare width = sub)
  skip     : subwin + SKIP (tap, tile) pairs with zero matched rows
             (a pl.when on a prefetched flag would realize this)
  exact    : per-(tap, tile) exact 128-aligned span (unachievable ideal
             without per-pair variable widths — bounds further work)

Work modeled per (tap, tile): tile * width * Cin MACs (the one-hot
gather matmul, MXU) — the useful GEMM tile*Cin*Cout is policy-invariant
and reported once.  Prints GMACs and speed-of-light ms at v5e bf16 peak
so policies can be ranked before any TPU time is spent.
"""
from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

INT32_MAX = np.iinfo(np.int32).max


def tap_tile_spans(in_keys_sorted, qk, tile):
    """Per-(tap, tile) exact matched-row spans (128-aligned width) and
    per-tile union spans, numpy."""
    big = np.int64(INT32_MAX)
    keys = np.asarray(in_keys_sorted, np.int64)
    q = np.asarray(qk, np.int64)
    K, M = q.shape
    L = -(-max(len(keys), M) // tile) * tile
    kp = np.full(L, big)
    kp[:len(keys)] = keys
    qp = np.full((K, L), big)
    qp[:, :M] = q
    qt = qp.reshape(K, -1, tile)
    validq = qt != big
    lo = np.where(validq, qt, big).min(2)                     # [K, nt]
    hi = np.where(validq, qt, -1).max(2)
    start = np.searchsorted(kp, lo) // 128 * 128
    end = np.searchsorted(kp, hi, side="right")
    span = np.where(hi >= 0, np.maximum(end - start, 0), 0)   # [K, nt]
    # union across taps per tile
    lo_u = lo.min(0)
    hi_u = hi.max(0)
    su = np.searchsorted(kp, lo_u) // 128 * 128
    eu = np.searchsorted(kp, hi_u, side="right")
    uspan = np.where(hi_u >= 0, np.maximum(eu - su, 0), 0)    # [nt]
    return span, uspan, L


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    _, vcfg, _ = bench._fhd_model(jax, jax.numpy)
    vcfg = dataclasses.replace(vcfg, compute_dtype="bfloat16")
    VCAP, PPV = 16384, 5
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    tile = int(vcfg.sparse_pallas_tile)

    tot = {"union": 0.0, "subwin": 0.0, "skip": 0.0, "exact": 0.0,
           "useful": 0.0}
    empty_frac = []
    per_block = {}

    for seed in range(1000, 1000 + n_scenes):
        scene = bench.make_scene(seed, bench.NUM_POINTS)
        vox = voxelize_jax.voxelize(
            jax.numpy.asarray(scene), jax.numpy.asarray(bench.NUM_POINTS),
            voxel_size=vcfg.voxel_size, pc_range=vcfg.pc_range,
            grid_size=vcfg.grid_size, max_points=PPV, max_voxels=VCAP,
            first_appearance=False)
        plan = voxelnet_mod.middle_plan(vcfg, VCAP)
        grid_dhw, specs = sc.respec(plan)
        site_caps = sc.measure_site_caps([np.asarray(vox.coords)],
                                         grid_dhw, specs, safety=1.1)
        plan = sc.plan_from_specs(grid_dhw, VCAP, specs,
                                  out_caps=site_caps)

        coords = np.asarray(vox.coords)
        cin = 16
        for bi, blk in enumerate(plan):
            v = coords[:, 0] >= 0
            in_keys = np.sort(np.asarray(
                jax.jit(lambda c, b=blk: sc.linearize(
                    jax.numpy.asarray(c), b.grid))(coords))[v])
            joins = []
            if blk.n_subm:
                qk = np.asarray(jax.jit(
                    lambda c, vv, b=blk: sc.subm_tap_keys(
                        jax.numpy.asarray(c), jax.numpy.asarray(vv),
                        b.grid, b.subm_kernel))(coords, v))
                cins = [cin] + [blk.subm_cout] * (blk.n_subm - 1)
                joins.append(("subm", qk, cins))
            sites = jax.jit(lambda c, vv, b=blk: sc.build_strided_sites(
                jax.numpy.asarray(c), jax.numpy.asarray(vv),
                b.grid, b.kernel, b.stride, b.pad, b.out_cap))(coords, v)
            qk = np.asarray(jax.jit(lambda s, b=blk: sc.strided_tap_keys(
                s, b.grid, b.kernel, b.stride, b.pad))(sites))
            joins.append(("strided", qk,
                          [blk.subm_cout if blk.n_subm else cin]))

            for label, qk, cins in joins:
                span, uspan, L = tap_tile_spans(in_keys, qk, tile)
                K, nt = span.shape
                w_u = max(128, -(-int(uspan.max()) // 128) * 128)
                w_s = max(128, -(-int(span.max()) // 128) * 128)
                nonempty = span > 0
                empty_frac.append(1.0 - nonempty.mean())
                c_sum = float(sum(cins))
                g = tile * c_sum
                tot["union"] += g * K * nt * w_u
                tot["subwin"] += g * K * nt * w_s
                tot["skip"] += g * float(nonempty.sum()) * w_s
                tot["exact"] += g * float(
                    (-(-span[nonempty] // 128) * 128).sum())
                cout = (blk.subm_cout if label == "subm" else blk.cout)
                tot["useful"] += tile * K * nt * c_sum * cout / max(
                    len(cins), 1) * 0  # reported separately below
                key = (bi, label)
                d = per_block.setdefault(key, dict(
                    w_u=0, w_s=0, empty=0.0, n=0))
                d["w_u"] = max(d["w_u"], w_u)
                d["w_s"] = max(d["w_s"], w_s)
                d["empty"] += float(1.0 - nonempty.mean())
                d["n"] += 1
            coords = np.asarray(sites.out_coords)
            cin = blk.cout

    peak_macs = bench.V5E_BF16_PEAK_FLOPS / 2
    print(f"scenes={n_scenes} tile={tile}")
    for pol in ("union", "subwin", "skip", "exact"):
        gm = tot[pol] / 1e9 / n_scenes
        print(f"{pol:>7}: gather {gm:7.1f} GMACs/scan  "
              f"SoL {1e3 * gm * 1e9 / peak_macs:5.2f} ms")
    print("\nper (block, join): union W -> subwin W, empty (tap,tile) frac")
    for (bi, lb), d in sorted(per_block.items()):
        print(f"  b{bi}/{lb:>7}: {d['w_u']:5d} -> {d['w_s']:5d}   "
              f"empty {d['empty'] / d['n']:.2f}")


if __name__ == "__main__":
    main()
