"""Host-side key-ORDER study for the FHD key-match gather kernel.

The windowed gather's dominant cost is W-proportional one-hot work, and
W is set by how far apart a tile's matched table rows sit in the sort
order.  The depth-minor row-major order (``sparse_conv.linearize``)
makes a dy=+-1 tap jump ~one BEV row of active sites.  This tool
measures, entirely on host (forced-CPU jax + numpy), what per-block
union windows alternative LOCALITY-PRESERVING orders would need on the
bench scenes:

  - rowmajor   : (y*W + x)*D + z            (current)
  - block B    : BEV tiled into BxB blocks, blocks row-major, row-major
                 inside, z minor
  - morton     : 2D Morton interleave of (y, x), z minor

Ordering is a pure permutation of table rows + query columns, so
results are exact for any kernel that consumes sorted keys.  Reports
per-block W_union (tile 256) at p100 and the modeled gather GMACs, so
the order can be chosen BEFORE any TPU time is spent.
"""
from __future__ import annotations

import dataclasses
import pathlib
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

INT32_MAX = np.iinfo(np.int32).max


def _spread2(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of v (Morton helper)."""
    v = v.astype(np.int64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def make_keyfn(name: str, grid_dhw):
    D, H, W = (int(g) for g in grid_dhw)

    def valid(c):
        z, y, x = c[..., 0], c[..., 1], c[..., 2]
        return ((z >= 0) & (z < D) & (y >= 0) & (y < H)
                & (x >= 0) & (x < W))

    if name == "rowmajor":
        def f(c):
            key = ((c[..., 1].astype(np.int64) * W + c[..., 2]) * D
                   + c[..., 0])
            return np.where(valid(c), key, INT32_MAX)
    elif name.startswith("block"):
        B = int(name[5:])
        nbx = -(-W // B)

        def f(c):
            y, x, z = (c[..., 1].astype(np.int64),
                       c[..., 2].astype(np.int64),
                       c[..., 0].astype(np.int64))
            bev = (y // B * nbx + x // B) * (B * B) + (y % B) * B + x % B
            return np.where(valid(c), bev * D + z, INT32_MAX)
    elif name == "morton":
        def f(c):
            y, x, z = (c[..., 1].astype(np.int64),
                       c[..., 2].astype(np.int64),
                       c[..., 0].astype(np.int64))
            bev = (_spread2(y) << 1) | _spread2(x)
            return np.where(valid(c), bev * D + z, INT32_MAX)
    else:
        raise ValueError(name)
    return f


def union_window(in_keys_sorted, qk, tile=256):
    from automatic_as_built_reconstruction_tpu.ops.pallas import (
        sparse_gather_gemm as sgg)
    s = sgg.keymatch_window_spans(in_keys_sorted, qk, tile)
    if not s.size:
        return 128, 128
    mx = -(-int(s.max()) // 128) * 128
    p99 = -(-int(np.percentile(s, 99)) // 128) * 128
    return max(mx, 128), max(p99, 128)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    _, vcfg, _ = bench._fhd_model(jax, jax.numpy)
    vcfg = dataclasses.replace(vcfg, compute_dtype="bfloat16")
    VCAP, PPV = 16384, 5
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tile = 256
    orders = ["rowmajor", "block16", "block32", "block64", "morton"]
    # per order: accumulated [block][join] max window + MAC model terms
    acc: dict = {o: {} for o in orders}

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
            cv = coords[v]
            # strided sites via the library (order-independent SET)
            sites = jax.jit(
                lambda c, vv, b=blk: sc.build_strided_sites(
                    jax.numpy.asarray(c), jax.numpy.asarray(vv),
                    b.grid, b.kernel, b.stride, b.pad, b.out_cap)
            )(coords, v)
            out_c = np.asarray(sites.out_coords)
            out_v = np.asarray(sites.out_valid)
            ocv = out_c[out_v]

            taps_subm = np.stack(np.meshgrid(
                *[np.arange(k) - k // 2 for k in (3, 3, 3)],
                indexing="ij"), -1).reshape(-1, 3)
            taps_str = np.stack(np.meshgrid(
                *[np.arange(k) for k in blk.kernel],
                indexing="ij"), -1).reshape(-1, 3)
            st = np.asarray(blk.stride)
            pd = np.asarray(blk.pad)

            for order in orders:
                f_in = make_keyfn(order, blk.grid)
                f_out = make_keyfn(order, blk.out_grid)
                ik = f_in(cv)
                iperm = np.argsort(ik, kind="stable")
                ik_s = ik[iperm]
                joins = []
                if blk.n_subm:
                    # queries in table order (in sites == out sites)
                    qk = np.stack([f_in(cv[iperm] + off)
                                   for off in taps_subm])
                    cins = ([cin] + [blk.subm_cout] * (blk.n_subm - 1))
                    joins.append(("subm", qk, cins))
                ok = f_out(ocv)
                operm = np.argsort(ok, kind="stable")
                qk = np.stack([
                    f_in(ocv[operm] * st[None] + off[None] - pd[None])
                    for off in taps_str])
                joins.append(
                    ("strided", qk,
                     [blk.subm_cout if blk.n_subm else cin]))
                for label, qk, cins in joins:
                    wmax, wp99 = union_window(ik_s, qk, tile)
                    key = (bi, label)
                    cur = acc[order].get(key)
                    K, M = qk.shape
                    L = -(-max(len(ik_s), M) // tile) * tile
                    entry = (wmax, wp99, K, L, tuple(cins))
                    if cur is None or wmax > cur[0]:
                        acc[order][key] = entry
            coords = out_c
            cin = blk.cout

    peak_macs = bench.V5E_BF16_PEAK_FLOPS / 2
    print(f"scenes={n_scenes} tile={tile}")
    for order in orders:
        rows = sorted(acc[order].items())
        gmacs = sum(L * K * w * ci
                    for (_, _), (w, _, K, L, cins) in rows
                    for ci in cins) / 1e9
        detail = " ".join(f"b{bi}/{lb[:3]}:W{w}(p99 {p99})"
                          for (bi, lb), (w, p99, K, L, cins) in rows)
        print(f"{order:>9}: gather {gmacs:7.1f} GMACs "
              f"SoL {1e3 * gmacs * 1e9 / peak_macs:5.2f} ms | {detail}")


if __name__ == "__main__":
    main()
