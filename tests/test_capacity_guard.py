"""Honest-capacity regression guard (VERDICT r4 item 9).

Round 3's convergence failure was silent active-site truncation from
undersized ``out_site_caps``; round 4 fixed it by sizing the caps from
the data (``ops.sparse_conv.measure_site_caps``).  This test pins that
surface: the committed serving config's capacities must cover what
``measure_site_caps`` measures on bench-scale scenes — a future edit
that shrinks them below the measured requirement goes red here instead
of silently truncating at serve time.

[ref: second/configs/car.fhd.config — lineage-expected surface,
UNVERIFIED (mount empty, SURVEY.md §0)]
"""
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from automatic_as_built_reconstruction_tpu import builder
from automatic_as_built_reconstruction_tpu.builder import (
    box_coder_builder, second_builder, target_assigner_builder,
    voxel_builder)
from automatic_as_built_reconstruction_tpu.models import voxelnet as vn
from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc
from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

CONFIG_DIR = (REPO / "automatic_as_built_reconstruction_tpu" / "configs")

# bench._fhd_setup's scene/capacity parameters (the scenes the serving
# numbers are measured on)
BENCH_N_PTS = 18000
BENCH_VCAP, BENCH_PPV = 16384, 5
BENCH_B = 2


def _bench_scene_coords():
    import bench

    cfg = builder.load_config(
        CONFIG_DIR / "second/car/car.fhd.serving.config")
    m = cfg.model.second
    gen = voxel_builder.build(m.voxel_generator)
    coder = box_coder_builder.build(m.box_coder)
    assigner = target_assigner_builder.build(m.target_assigner, coder)
    _, vcfg, _ = second_builder.build(m, gen, assigner)

    coords = []
    for b in range(BENCH_B):
        pts = bench.make_scene(1000 + b, BENCH_N_PTS)
        r = voxelize_jax.voxelize(
            pts.astype(np.float32), np.int32(BENCH_N_PTS),
            voxel_size=vcfg.voxel_size, pc_range=vcfg.pc_range,
            grid_size=vcfg.grid_size, max_points=BENCH_PPV,
            max_voxels=BENCH_VCAP, first_appearance=False)
        coords.append(np.asarray(r.coords))
    return vcfg, coords


def test_serving_caps_cover_measured_requirement():
    vcfg, coords = _bench_scene_coords()
    plan = vn.middle_plan(vcfg, BENCH_VCAP)
    grid_dhw, specs = sc.respec(plan)
    measured = sc.measure_site_caps(coords, grid_dhw, specs, safety=1.0)
    assert len(vcfg.sparse_out_caps) == len(measured)
    for i, (cap, need) in enumerate(zip(vcfg.sparse_out_caps, measured)):
        assert cap >= need, (
            f"serving out_site_caps[{i}]={cap} is below the measured "
            f"bench-scene requirement {need} — active-site truncation "
            f"(the round-3 silent convergence failure) would return")


def test_measure_site_caps_detects_shrunk_caps():
    """The guard actually bites: a 0.6x shrink (the round-3 bug's
    magnitude) must violate the measured requirement."""
    vcfg, coords = _bench_scene_coords()
    plan = vn.middle_plan(vcfg, BENCH_VCAP)
    grid_dhw, specs = sc.respec(plan)
    measured = sc.measure_site_caps(coords, grid_dhw, specs, safety=1.0)
    shrunk = [int(c * 0.6) for c in vcfg.sparse_out_caps]
    assert any(s < need for s, need in zip(shrunk, measured))
