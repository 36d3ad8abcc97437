"""HLO op-census of the SECOND/FHD serving graph (CPU-compilable).

Compiles bench.py's FHD ``stage_full`` (XLA sparse path — the Pallas
kernel doesn't lower on CPU) and counts the expensive op classes plus
XLA's cost analysis. Run on any box; no TPU needed.

Round-3 finding (B=1, 16384-voxel cap, car.fhd):
  sorts 22 · gathers 37 · scatters 10 · while 2
  flops 82.4 G · bytes accessed 16.0 GB/scan
The ~16 GB of HBM traffic puts a ~20 ms floor on the serving latency at
v5e bandwidth (~800 GB/s) — matching the measured 53 ms/scan — and 17 of
the 22 sorts are the per-layer merge-join rulebook builds, which the
key-match serving mode (sparse_keymatch=True) eliminates.

Usage: python tools/census_fhd.py [--batch 1] [--vcap 16384]
"""
from __future__ import annotations

import argparse
import collections
import dataclasses
import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--vcap", type=int, default=16384)
    ap.add_argument("--keymatch", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as vm)
    from automatic_as_built_reconstruction_tpu.models.voxelnet import (
        VoxelNet)
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    _, vcfg, anchors_np = bench._fhd_model(jax, jnp)
    B, VCAP, PPV = args.batch, args.vcap, 5
    # keymatch mode only engages when the Pallas route is on
    # (models/middle.py::use_km); off-TPU the kernels run in interpret
    # mode, so the census still compiles — kernel-internal cost is not
    # TPU-representative, but the surrounding sort/gather census is.
    vcfg = dataclasses.replace(
        vcfg, compute_dtype="bfloat16",
        sparse_use_pallas_gemm=args.keymatch,
        sparse_keymatch=args.keymatch)
    base = np.stack([bench.make_scene(1000 + b) for b in range(B)])
    nv = jnp.full((B,), bench.NUM_POINTS, jnp.int32)

    def voxelize(p, n):
        return voxelize_jax.voxelize(
            p, n, voxel_size=vcfg.voxel_size, pc_range=vcfg.pc_range,
            grid_size=vcfg.grid_size, max_points=PPV, max_voxels=VCAP,
            first_appearance=False)

    vox0 = jax.vmap(voxelize)(jnp.asarray(base), nv)
    model = VoxelNet(cfg=vcfg)
    variables = model.init(jax.random.key(0), vox0.voxels[:1, :64],
                           vox0.num_points[:1, :64], vox0.coords[:1, :64])
    anchors_b = jnp.broadcast_to(
        jnp.asarray(anchors_np), (B,) + anchors_np.shape)

    def stage_full(pts0):
        r = jax.vmap(voxelize)(pts0, nv)
        preds = model.apply(variables, r.voxels, r.num_points, r.coords,
                            train=False)
        det = vm.predict(preds, anchors_b, vcfg)
        return jnp.sum(det["scores"])

    comp = jax.jit(stage_full).lower(jnp.asarray(base)).compile()
    hlo = comp.as_text()
    census = collections.Counter()
    for line in hlo.splitlines():
        for op in ("sort", "while", "scatter", "gather", "reduce-window",
                   "dynamic-slice", "dynamic-update-slice"):
            if f" {op}(" in line:
                census[op] += 1
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    out = {"census": dict(census),
           "flops": ca.get("flops"),
           "bytes_accessed": ca.get("bytes accessed"),
           "keymatch": args.keymatch, "batch": B, "vcap": VCAP}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
