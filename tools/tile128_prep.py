#!/usr/bin/env python
"""Host-side autotune of key-match window/subwindow/group pairs for
alternative output tiles (CPU-forced jax; safe beside a TPU training).

tools/span_analysis.py shows the per-tap compare spans shrink ~1.4x at
tile 128 (463 -> 335 GMACs of one-hot work on bench scenes); this
script computes the exact per-(join, tile) pairs the kernel needs so a
later TPU probe (tools/fhd_perf_probe.py --modes) can measure the
end-to-end effect without burning chip time on telemetry.

Writes artifacts/keymatch_tile_pairs.json: {tile: {win, sub, grp}}.
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
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax
    import dataclasses

    VoxelNet, vcfg, _ = bench._fhd_model(jax, jnp)
    vcfg = dataclasses.replace(vcfg, compute_dtype="bfloat16",
                               sparse_use_pallas_gemm=True)
    VCAP, PPV, n_pts = 16384, 5, bench.NUM_POINTS
    scene = bench.make_scene(1000, n_pts)
    vox = voxelize_jax.voxelize(
        jnp.asarray(scene), jnp.int32(n_pts),
        voxel_size=vcfg.voxel_size, pc_range=vcfg.pc_range,
        grid_size=vcfg.grid_size, max_points=PPV, max_voxels=VCAP,
        first_appearance=False)
    plan = voxelnet_mod.middle_plan(vcfg, VCAP)

    out = {}
    for tile in (128, 192, 256):
        win, sub, grp = bench._keymatch_autotune(
            jax, jnp, vox.coords, plan, tile)
        out[str(tile)] = {"win": win, "sub": sub, "grp": grp}
        print(f"tile {tile}: win={win} sub={sub} grp={grp}", flush=True)

    path = REPO / "artifacts" / "keymatch_tile_pairs.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"-> {path}")


if __name__ == "__main__":
    main()
