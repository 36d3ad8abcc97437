"""Config system: textproto parse -> builder tree -> model/assigner."""
import pathlib

import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu import builder
from automatic_as_built_reconstruction_tpu.builder import (
    box_coder_builder, optimizer_builder, second_builder,
    target_assigner_builder, voxel_builder)

CONFIG_DIR = (pathlib.Path(__file__).parent.parent
              / "automatic_as_built_reconstruction_tpu" / "configs")


@pytest.fixture(scope="module")
def pp_cfg():
    return builder.load_config(
        CONFIG_DIR / "pointpillars" / "car" / "xyres_16.config")


class TestConfigZoo:
    """Every shipped config parses and builds (model, cfg, fmap) through
    the full builder tree — the lineage config-family surface."""

    @pytest.mark.parametrize("rel", sorted(
        str(p.relative_to(CONFIG_DIR))
        for p in CONFIG_DIR.rglob("*.config")))
    def test_builds(self, rel):
        cfg = builder.load_config(CONFIG_DIR / rel)
        m = cfg.model.second
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        model, vcfg, fmap = second_builder.build(m, gen, assigner)
        assert vcfg.num_class == len(assigner.classes)
        assert all(f > 0 for f in fmap)
        # anchor generation on the real feature map stays consistent
        ret = assigner.generate_anchors(fmap)
        n_loc = fmap[0] * fmap[1] * fmap[2]
        assert ret["anchors"].shape == (
            n_loc * assigner.num_anchors_per_location, 7)
        # optimizer builds for the config's schedule
        import jax.numpy as jnp  # noqa: F401
        tx = optimizer_builder.build(cfg.train_config.optimizer,
                                     int(cfg.train_config.steps) or 100)
        assert tx is not None

    def test_people_fhd_classes(self):
        cfg = builder.load_config(CONFIG_DIR / "second/people.fhd.config")
        names = [cs.class_name for cs in
                 cfg.model.second.target_assigner.class_settings]
        assert names == ["Pedestrian", "Cyclist"]
        assert list(cfg.train_input_reader.class_names) == names

    def test_pp_multiclass(self):
        cfg = builder.load_config(
            CONFIG_DIR / "pointpillars/all/xyres_16.config")
        names = [cs.class_name for cs in
                 cfg.model.second.target_assigner.class_settings]
        assert names == ["Car", "Pedestrian", "Cyclist"]

    def test_fhd_mixed_precision_flag(self):
        cfg = builder.load_config(
            CONFIG_DIR / "second/car/car.fhd.mixed.config")
        assert cfg.train_config.enable_mixed_precision


class TestConfigParse:
    def test_roundtrip(self, pp_cfg, tmp_path):
        builder.save_config(pp_cfg, tmp_path / "out.config")
        cfg2 = builder.load_config(tmp_path / "out.config")
        assert cfg2 == pp_cfg

    def test_fields(self, pp_cfg):
        m = pp_cfg.model.second
        assert m.voxel_feature_extractor.module_class_name == "PillarFeatureNet"
        assert list(m.voxel_generator.voxel_size) == pytest.approx(
            [0.16, 0.16, 4.0])
        assert m.target_assigner.class_settings[0].class_name == "Car"
        assert pp_cfg.train_config.steps == 296960


class TestBuilders:
    def test_voxel_builder(self, pp_cfg):
        gen = voxel_builder.build(pp_cfg.model.second.voxel_generator)
        np.testing.assert_array_equal(gen.grid_size, [432, 496, 1])
        assert gen.max_num_points == 100

    def test_target_assigner(self, pp_cfg):
        m = pp_cfg.model.second
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        assert assigner.classes == ["Car"]
        assert assigner.num_anchors_per_location == 2
        ret = assigner.generate_anchors((1, 248, 216))
        assert ret["anchors"].shape == (248 * 216 * 2, 7)
        # stride anchors: first anchor at offset
        np.testing.assert_allclose(ret["anchors"][0, :3],
                                   [0.16, -39.52, -1.78], atol=1e-5)
        np.testing.assert_allclose(ret["matched_thresholds"][0], 0.6)

    def test_second_builder(self, pp_cfg):
        m = pp_cfg.model.second
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        model, cfg, fmap = second_builder.build(m, gen, assigner)
        assert cfg.vfe_name == "PillarFeatureNet"
        assert cfg.grid_size == (432, 496, 1)
        assert cfg.num_class == 1
        assert cfg.loc_weight == 2.0
        assert fmap == (1, 248, 216)
        assert cfg.rpn_layer_nums == (3, 5, 5)
        assert cfg.use_yaw_quality_head is False

    def test_yaw_quality_head_wired(self, pp_cfg):
        m = pp_cfg.model.second
        m.use_yaw_quality_head = True
        m.yaw_quality_weight = 0.5
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        _, cfg, _ = second_builder.build(m, gen, assigner)
        assert cfg.use_yaw_quality_head is True
        assert cfg.yaw_quality_weight == 0.5

    def test_optimizer_builder(self, pp_cfg):
        import jax.numpy as jnp
        tx = optimizer_builder.build(pp_cfg.train_config.optimizer,
                                     pp_cfg.train_config.steps)
        params = {"w": jnp.zeros((3,))}
        state = tx.init(params)
        grads = {"w": jnp.ones((3,))}
        updates, state = tx.update(grads, state, params)
        assert jnp.isfinite(updates["w"]).all()

    def test_onecycle_schedule_shape(self, pp_cfg):
        sched = optimizer_builder.build_lr_schedule(
            pp_cfg.train_config.optimizer.adam_optimizer.learning_rate,
            total_steps=1000)
        lr0 = float(sched(0))
        lr_peak = float(sched(400))
        lr_end = float(sched(999))
        assert lr_peak == pytest.approx(0.003, rel=1e-3)
        assert lr0 == pytest.approx(0.003 / 10.0, rel=1e-3)
        assert lr_end < lr0


class TestSecondConfigs:
    @pytest.mark.parametrize("rel", [
        "second/car/car.fhd.config", "second/all.fhd.config",
        "building/asbuilt_pillars.config",
        "building/asbuilt_pillars_tiny.config"])
    def test_parse_and_build(self, rel):
        from automatic_as_built_reconstruction_tpu.builder import (
            second_builder as sb)
        cfg = builder.load_config(CONFIG_DIR / rel)
        m = cfg.model.second
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        model, mcfg, fmap = sb.build(m, gen, assigner)
        assert mcfg.num_class == len(assigner.classes)
        if "fhd" in rel:
            assert mcfg.middle_name == "SpMiddleFHD"
            assert mcfg.middle_num_filters == (16, 32, 64, 64)
            assert mcfg.middle_xy_strides == (2, 2, 2, 1)
            assert fmap == (1, 200, 176)

    def test_dense_tail_blocks_wired(self, pp_cfg):
        m = pp_cfg.model.second
        m.middle_feature_extractor.dense_tail_blocks = 2
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        _, cfg, _ = second_builder.build(m, gen, assigner)
        assert cfg.sparse_dense_tail_blocks == 2

    def test_serving_window_fields_wired(self):
        """car.fhd.serving.config's measured Pallas window / subwindow
        pairs and grouped-tap flag reach VoxelNetConfig."""
        cfg = builder.load_config(
            CONFIG_DIR / "second/car/car.fhd.serving.config")
        m = cfg.model.second
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        _, vcfg, _ = second_builder.build(m, gen, assigner)
        assert vcfg.sparse_keymatch and vcfg.sparse_keymatch_group
        assert vcfg.sparse_dense_tail_blocks == 1
        assert vcfg.sparse_pallas_window == (
            (512, 384), (768, 768), (1024, 1536), (1024, 512))
        assert vcfg.sparse_keymatch_subwindow == (
            (384, 256), (512, 512), (512, 1024), (512, 512))
        assert vcfg.sparse_out_caps == (52096, 61184, 40320, 35328)

    def test_window_pair_length_mismatch_raises(self, pp_cfg):
        m = pp_cfg.model.second
        m.middle_feature_extractor.pallas_window_subm.extend([512, 768])
        m.middle_feature_extractor.pallas_window_strided.extend([384])
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        with pytest.raises(ValueError, match="one pair per"):
            second_builder.build(m, gen, assigner)


def test_sparse_configs_default_to_keymatch_training():
    """r5: key-match is the default training mode for the sparse
    configs — train() builds no host rulebooks (the behavior itself is
    covered by test_train_runtime's keymatch no-rb test)."""
    for rel in ("second/car/car.fhd.config", "second/all.fhd.config"):
        cfg = builder.load_config(CONFIG_DIR / rel)
        m = cfg.model.second
        assert m.use_pallas_sparse_gemm, rel
        assert m.use_keymatch_sparse_gemm, rel
        gen = voxel_builder.build(m.voxel_generator)
        coder = box_coder_builder.build(m.box_coder)
        assigner = target_assigner_builder.build(m.target_assigner, coder)
        _, vcfg, _ = second_builder.build(m, gen, assigner)
        assert vcfg.sparse_keymatch and vcfg.sparse_use_pallas_gemm, rel
