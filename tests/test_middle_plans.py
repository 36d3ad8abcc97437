"""Exact lineage middle-stack layer plans (VERDICT r2 item 3).

Asserts that each lineage SpMiddle* name builds its specific per-variant
architecture — grid walk, channel schedule, layer count, kernel shapes —
and that car.fhd.config produces a layer-for-layer SpMiddleFHD
equivalent (param tree checked tap-for-tap)."""
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from automatic_as_built_reconstruction_tpu import builder  # noqa: E402
from automatic_as_built_reconstruction_tpu.builder import (  # noqa: E402
    box_coder_builder, second_builder, target_assigner_builder,
    voxel_builder)
from automatic_as_built_reconstruction_tpu.models import (  # noqa: E402
    middle_plans)
from automatic_as_built_reconstruction_tpu.models.middle import (  # noqa: E402
    SparseMiddle)
from automatic_as_built_reconstruction_tpu.models.voxelnet import (  # noqa: E402
    middle_plan)
from automatic_as_built_reconstruction_tpu.ops import (  # noqa: E402
    rulebook_host as rbh, sparse_conv as sc)

CONFIG_DIR = (pathlib.Path(__file__).parent.parent
              / "automatic_as_built_reconstruction_tpu" / "configs")
FHD_GRID = (40, 1600, 1408)   # (D, H, W) before the +1 z pad


class TestPlanRegistry:
    def test_fhd_grid_walk(self):
        """SpMiddleFHD on KITTI-FHD geometry: 41 -> 21 -> 11 -> 5 -> 2."""
        specs = middle_plans.lookup("SpMiddleFHD", FHD_GRID)
        assert specs is not None
        plan = sc.plan_from_specs((41, 1600, 1408), 16000, specs)
        assert [b.grid[0] for b in plan] == [41, 21, 11, 5]
        assert plan[-1].out_grid == (2, 200, 176)
        assert [b.cout for b in plan] == [32, 64, 64, 64]
        assert [b.subm_channels for b in plan] == [16, 32, 64, 64]
        assert [b.n_subm for b in plan] == [2, 2, 3, 3]
        assert plan[-1].kernel == (3, 1, 1)
        assert plan[2].pad == (0, 1, 1)
        assert middle_plans.xy_downsample(specs) == 8
        assert middle_plans.bev_channels(specs, FHD_GRID) == 128

    def test_all_names_fit_canonical_grids(self):
        for name in ["SpMiddleFHD", "SpMiddleFHDV2", "SpMiddleD8HD",
                     "SpMiddleFHDLite", "SpMiddleD4HD", "SpMiddleD4HDLite"]:
            assert middle_plans.lookup(name, FHD_GRID) is not None, name
        assert middle_plans.lookup("SpMiddle2K", (80, 3200, 2816)) is not None
        assert middle_plans.lookup("PointPillarsScatter", FHD_GRID) is None

    def test_lite_has_no_subm(self):
        specs = middle_plans.lookup("SpMiddleFHDLite", FHD_GRID)
        assert all(s.n_subm == 0 for s in specs)
        assert [s.down_cout for s in specs] == [32, 64, 64, 64]

    def test_d4_downsamples_xy_by_4(self):
        specs = middle_plans.lookup("SpMiddleD4HD", FHD_GRID)
        assert middle_plans.xy_downsample(specs) == 4
        plan = sc.plan_from_specs((41, 1600, 1408), 16000, specs)
        assert plan[-1].out_grid == (2, 400, 352)

    def test_small_grid_falls_back(self):
        # the sparse-dryrun micro grid (z=8) cannot host the FHD plan
        assert middle_plans.lookup("SpMiddleFHD", (8, 16, 16)) is None

    def test_zonly_stride_with_dilating_kernel_expands(self):
        """A 3x3x3 kernel with z-only stride dilates y/x and EXPANDS the
        active set — the heuristic must give it the expansion schedule,
        not the 1.0 pure-collapse multiplier (advisor r3 medium)."""
        grid = (32, 256, 256)
        v_cap = 8192
        dilating = (sc.BlockSpec(0, -1, 16, (3, 3, 3), (2, 1, 1),
                                 (1, 1, 1)),)
        plan = sc.plan_from_specs(grid, v_cap, dilating)
        assert plan[0].out_cap >= 3 * v_cap            # 3.0x schedule
        collapse = (sc.BlockSpec(0, -1, 16, (3, 1, 1), (2, 1, 1),
                                 (0, 0, 0)),)
        plan = sc.plan_from_specs(grid, v_cap, collapse)
        assert plan[0].out_cap <= v_cap + 128          # true z-collapse

    def test_out_caps_length_validated(self):
        specs = middle_plans.lookup("SpMiddleFHD", FHD_GRID)
        with pytest.raises(ValueError, match="4 strided blocks"):
            sc.plan_from_specs((41, 1600, 1408), 16000, specs,
                               out_caps=(1000, 2000))


class TestCarFHDConfigBuildsLineageStack:
    @pytest.fixture(scope="class")
    def built(self):
        cfg = builder.load_config(
            CONFIG_DIR / "second" / "car" / "car.fhd.config")
        m = cfg.model.second
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        return second_builder.build(m, gen, assigner)

    def test_config_carries_exact_plan(self, built):
        _, vcfg, fmap = built
        assert vcfg.middle_zpad == 1
        specs = tuple(sc.BlockSpec(*b) for b in vcfg.middle_blocks)
        assert specs == middle_plans.MIDDLE_PLANS["SpMiddleFHD"]
        assert fmap == (1, 200, 176)

    def test_param_tree_layer_for_layer(self, built):
        """init the sparse middle alone (host rulebooks, tiny V) and
        check every conv weight's (taps, cin, cout) against the lineage
        SpMiddleFHD sequence."""
        _, vcfg, _ = built
        grid_dhw = (vcfg.grid_size[2] + vcfg.middle_zpad,
                    vcfg.grid_size[1], vcfg.grid_size[0])
        V = 64
        m = SparseMiddle(grid_dhw=grid_dhw, num_input_features=4,
                         blocks=vcfg.middle_blocks)
        plan = middle_plan(vcfg, V)
        rng = np.random.default_rng(0)
        coords = np.full((V, 3), -1, np.int32)
        n = 32
        coords[:n] = np.stack([rng.integers(0, 40, n),
                               rng.integers(0, 1600, n),
                               rng.integers(0, 1408, n)], 1)
        books = rbh.unflatten(
            {k: v[None] for k, v in
             rbh.build_middle_rulebooks(coords, plan).items()}, len(plan))
        feats = rng.normal(size=(1, V, 4)).astype(np.float32)
        variables = m.init(jax.random.key(0), feats, coords[None],
                           rulebooks=books)
        p = variables["params"]
        expect = {
            "b0_subm0_w": (27, 4, 16), "b0_subm1_w": (27, 16, 16),
            "b0_down_w": (27, 16, 32),
            "b1_subm0_w": (27, 32, 32), "b1_subm1_w": (27, 32, 32),
            "b1_down_w": (27, 32, 64),
            "b2_subm0_w": (27, 64, 64), "b2_subm1_w": (27, 64, 64),
            "b2_subm2_w": (27, 64, 64), "b2_down_w": (27, 64, 64),
            "b3_subm0_w": (27, 64, 64), "b3_subm1_w": (27, 64, 64),
            "b3_subm2_w": (27, 64, 64), "b3_down_w": (3, 64, 64),
        }
        got = {k: tuple(v.shape) for k, v in p.items() if k.endswith("_w")}
        assert got == expect
        # output: depth 2 folded into channels at the /8 BEV grid
        out = m.apply(variables, feats, coords[None], rulebooks=books)
        assert out.shape == (1, 200, 176, 128)


class TestZOnlyBlockParity:
    """Host-rulebook and device-LUT paths agree on a stack containing a
    z-only (3,1,1) strided block — the new kernel shape the lineage
    plans introduce."""

    def test_host_vs_device(self):
        grid = (11, 12, 12)
        blocks = (
            sc.BlockSpec(1, 8, 8, (3, 3, 3), (2, 2, 2), (1, 1, 1)),
            sc.BlockSpec(1, 8, 8, (3, 1, 1), (2, 1, 1), (0, 0, 0)),
        )
        V = 96
        rng = np.random.default_rng(3)
        lin = rng.choice(np.prod(grid), 60, replace=False)
        coords = np.full((V, 3), -1, np.int32)
        coords[:60] = np.stack([lin // (grid[1] * grid[2]),
                                (lin // grid[2]) % grid[1],
                                lin % grid[2]], 1)
        feats = rng.normal(size=(1, V, 4)).astype(np.float32)
        m = SparseMiddle(grid_dhw=grid, num_input_features=4, blocks=blocks,
                         min_capacity=64)
        plan = m.plan(V)
        books = rbh.unflatten(
            {k: v[None] for k, v in
             rbh.build_middle_rulebooks(coords, plan).items()}, len(plan))
        variables = m.init(jax.random.key(1), feats, coords[None])
        out_dev = m.apply(variables, feats, coords[None])
        out_host = m.apply(variables, feats, coords[None], rulebooks=books)
        np.testing.assert_allclose(np.asarray(out_dev),
                                   np.asarray(out_host), atol=1e-5)

    def test_numpy_twin_matches_native(self):
        grid = (7, 8, 8)
        blk_plan = sc.plan_from_specs(
            grid, 64,
            (sc.BlockSpec(0, 0, 8, (3, 1, 1), (2, 1, 1), (0, 0, 0)),),
            min_capacity=32)[0]
        rng = np.random.default_rng(4)
        lin = rng.choice(np.prod(grid), 40, replace=False)
        coords = np.full((64, 3), -1, np.int32)
        coords[:40] = np.stack([lin // 64, (lin // 8) % 8, lin % 8], 1)
        a = rbh.strided_layout_np(coords, grid, blk_plan.kernel,
                                  blk_plan.stride, blk_plan.pad,
                                  blk_plan.out_cap)
        b = rbh.strided_layout(coords, grid, blk_plan.kernel,
                               blk_plan.stride, blk_plan.pad,
                               blk_plan.out_cap)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
