"""Train/eval runtime smoke test on CPU: a micro config end-to-end through
the CLI-level train() and evaluate() functions, including checkpoint
resume."""
import pathlib

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from automatic_as_built_reconstruction_tpu.train import train as train_mod

MICRO_CONFIG = """
model: {
  second: {
    voxel_generator {
      point_cloud_range: [0.0, 0.0, -0.2, 8.0, 8.0, 3.4]
      voxel_size: [0.5, 0.5, 3.6]
      max_number_of_points_per_voxel: 8
      max_number_of_voxels: 256
    }
    voxel_feature_extractor: {
      module_class_name: "PillarFeatureNet"
      num_filters: [8]
    }
    middle_feature_extractor: {
      module_class_name: "PointPillarsScatter"
      downsample_factor: 2
    }
    rpn: {
      layer_nums: [1]
      layer_strides: [2]
      num_filters: [8]
      upsample_strides: [1.0]
      num_upsample_filters: [8]
    }
    loss: {
      classification_loss: { weighted_sigmoid_focal: { alpha: 0.25 gamma: 2.0 } }
      localization_loss: { weighted_smooth_l1: { sigma: 3.0 } }
      classification_weight: 1.0
      localization_weight: 2.0
    }
    num_point_features: 4
    encode_background_as_zeros: true
    encode_rad_error_by_sin: true
    use_direction_classifier: true
    loss_norm_type: NormByNumPositives
    use_rotate_nms: true
    nms_pre_max_size: 64
    nms_post_max_size: 8
    nms_score_threshold: 0.1
    nms_iou_threshold: 0.3
    box_coder: { ground_box3d_coder: {} }
    target_assigner: {
      class_settings: {
        class_name: "wall"
        anchor_generator_range: {
          sizes: [0.15, 2.0, 2.8]
          anchor_ranges: [0.0, 0.0, 0.0, 8.0, 8.0, 0.0]
          rotations: [0.0, 1.5707963267948966]
          matched_threshold: 0.5
          unmatched_threshold: 0.25
        }
        region_similarity_calculator: { distance_similarity: { distance_norm: 2.0 } }
      }
    }
  }
}
train_input_reader: {
  batch_size: 1
  class_names: ["wall"]
  dataset: { dataset_class_name: "BuildingDataset" }
  preprocess: {
    max_number_of_voxels: 256
    shuffle_points: true
    anchor_area_threshold: -1.0
  }
  num_workers: 1
}
train_config: {
  optimizer: {
    adam_optimizer: {
      learning_rate: { constant_learning_rate: { learning_rate: 0.001 } }
    }
  }
  steps: 6
  save_checkpoints_secs: 100000
  save_summary_steps: 2
}
eval_input_reader: {
  batch_size: 1
  class_names: ["wall"]
  dataset: { dataset_class_name: "BuildingDataset" }
  preprocess: {
    max_number_of_voxels: 256
    shuffle_points: false
    anchor_area_threshold: -1.0
  }
}
"""


SPARSE_MICRO_CONFIG = MICRO_CONFIG.replace(
    'module_class_name: "PillarFeatureNet"',
    'module_class_name: "SimpleVoxel"',
).replace(
    'voxel_size: [0.5, 0.5, 3.6]',
    'voxel_size: [0.5, 0.5, 0.45]',   # gz=8 -> a real 3D sparse grid
).replace(
    '''module_class_name: "PointPillarsScatter"
      downsample_factor: 2''',
    '''module_class_name: "SpMiddleFHD"
      num_filters_down1: [8]
      num_filters_down2: [8]
      downsample_factor: 8''',
)


@pytest.fixture(scope="module")
def micro_cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "micro.config"
    p.write_text(MICRO_CONFIG)
    return p


@pytest.fixture(scope="module")
def sparse_micro_cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "micro_sparse.config"
    p.write_text(SPARSE_MICRO_CONFIG)
    return p


class TestTrainRuntime:
    def test_train_eval_resume(self, micro_cfg_path, tmp_path):
        model_dir = tmp_path / "run"
        # NOTE: 8x8m range with 0.5m pillars (16x16 grid) keeps this fast
        state = train_mod.train(micro_cfg_path, model_dir, max_steps=3,
                                display_step=1)
        assert int(state["step"]) == 3
        assert (model_dir / "log.txt").exists()
        assert (model_dir / "metrics.jsonl").exists()
        assert (model_dir / "pipeline.config").exists()

        # resume continues from the saved step
        state2 = train_mod.train(micro_cfg_path, model_dir, max_steps=5,
                                 display_step=1)
        assert int(state2["step"]) == 5

        result = train_mod.evaluate(micro_cfg_path, model_dir)
        assert "mAP.bev" in result

    def test_evaluate_with_point_refine(self, tmp_path):
        # yaw_point_refine_* flows proto -> builder (name -> index) ->
        # evaluate's host-side post-NMS refinement
        cfg = MICRO_CONFIG.replace(
            "nms_iou_threshold: 0.3",
            'nms_iou_threshold: 0.3\n'
            '    yaw_point_refine_classes: "wall"\n'
            '    yaw_point_refine_recenter: true')
        cfg_path = tmp_path / "refine.config"
        cfg_path.write_text(cfg)
        bundle = train_mod.Bundle(str(cfg_path))
        assert bundle.model_cfg.yaw_point_refine_classes == (0,)
        assert bundle.model_cfg.yaw_point_refine_recenter
        model_dir = tmp_path / "run"
        train_mod.train(cfg_path, model_dir, max_steps=1, display_step=1)
        result = train_mod.evaluate(cfg_path, model_dir)
        assert "mAP.bev" in result
        assert np.isfinite(result["mAP.bev"])

    def test_no_resume_flag(self, micro_cfg_path, tmp_path):
        model_dir = tmp_path / "run2"
        train_mod.train(micro_cfg_path, model_dir, max_steps=2,
                        display_step=1)
        state = train_mod.train(micro_cfg_path, model_dir, max_steps=2,
                                display_step=1, resume=False)
        assert int(state["step"]) == 2


class TestSparseTrainRuntime:
    """SECOND-style sparse middle end-to-end, with host-precomputed
    rulebooks flowing input pipeline -> batch -> jit step."""

    def test_host_rulebooks_reach_the_batch(self, sparse_micro_cfg_path):
        from automatic_as_built_reconstruction_tpu.data import batching
        bundle = train_mod.Bundle(sparse_micro_cfg_path)
        assert bundle.model_cfg.middle_name == "SpMiddleFHD"
        _, loader = bundle.input_reader(training=True)
        batch = next(iter(loader))
        example = batching.device_example(batch)
        assert "rb0_subm_idx" in example
        assert example["rb0_subm_idx"].shape == (1, 27, 256)
        assert "rb1_out_valid" in example

    def test_train_eval_sparse(self, sparse_micro_cfg_path, tmp_path):
        model_dir = tmp_path / "sparse_run"
        state = train_mod.train(sparse_micro_cfg_path, model_dir,
                                max_steps=2, display_step=1)
        assert int(state["step"]) == 2
        result = train_mod.evaluate(sparse_micro_cfg_path, model_dir)
        assert "mAP.bev" in result
        assert np.isfinite(result["mAP.bev"])

    def test_capacity_saturation_aborts(self, sparse_micro_cfg_path,
                                        tmp_path, monkeypatch):
        """Persistent mid_capacity_saturated > 0 must abort training
        loudly (the round-3 failure burned 2500 steps silently)."""
        real_make = train_mod.make_train_step

        def make_saturating(bundle, tx, mesh=None):
            step_fn = real_make(bundle, tx, mesh=mesh)

            def wrapped(state, example):
                state, metrics = step_fn(state, example)
                metrics = dict(metrics,
                               mid_capacity_saturated=np.float32(3.0))
                return state, metrics
            return wrapped

        monkeypatch.setattr(train_mod, "make_train_step", make_saturating)
        with pytest.raises(train_mod.CapacitySaturationError,
                           match="measure_site_caps"):
            train_mod.train(sparse_micro_cfg_path, tmp_path / "sat_run",
                            max_steps=10, display_step=1,
                            saturation_abort_windows=2)


class TestPodFromCheckpoint:
    def test_serving_entry_point(self, micro_cfg_path, tmp_path):
        import numpy as np
        from automatic_as_built_reconstruction_tpu.parallel import (
            pod_inference_from_checkpoint)
        model_dir = tmp_path / "srv"
        train_mod.train(micro_cfg_path, model_dir, max_steps=2,
                        display_step=1)
        pod = pod_inference_from_checkpoint(
            micro_cfg_path, model_dir, max_voxels=256,
            max_points_per_voxel=8)
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.uniform(0, 8, (2, 1500, 2)),
            rng.uniform(0, 3, (2, 1500, 1)),
            rng.random((2, 1500, 1))], axis=-1).astype(np.float32)
        out = pod(pts, np.array([1500, 1500], np.int32))
        dets = pod.detections_list(out)
        assert len(dets) == 2
        assert all(np.isfinite(d["scores"]).all() for d in dets)


class TestDataParallelTrainer:
    """train()/evaluate() with num_devices: the real trainer on a mesh."""

    @pytest.fixture(scope="class")
    def dp_cfg_path(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("cfg") / "micro_dp.config"
        p.write_text(MICRO_CONFIG.replace("batch_size: 1", "batch_size: 8"))
        return p

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 (virtual) devices")
    def test_dp_train_matches_single_device(self, dp_cfg_path, tmp_path):
        s1 = train_mod.train(dp_cfg_path, tmp_path / "dp1", max_steps=2,
                             display_step=1, num_devices=8)
        s2 = train_mod.train(dp_cfg_path, tmp_path / "dp2", max_steps=2,
                             display_step=1)
        assert int(s1["step"]) == int(s2["step"]) == 2
        flat1 = jax.tree.leaves(jax.device_get(s1["params"]))
        flat2 = jax.tree.leaves(jax.device_get(s2["params"]))
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    @pytest.mark.skipif(len(jax.devices()) < 8,
                        reason="needs 8 (virtual) devices")
    def test_dp_evaluate(self, dp_cfg_path, tmp_path):
        train_mod.train(dp_cfg_path, tmp_path / "dpe", max_steps=1,
                        display_step=1, num_devices=8)
        result = train_mod.evaluate(dp_cfg_path, tmp_path / "dpe",
                                    num_devices=8)
        assert "mAP.bev" in result
        assert np.isfinite(result["mAP.bev"])

    def test_batch_size_divisibility_check(self, micro_cfg_path, tmp_path):
        with pytest.raises(ValueError, match="not divisible"):
            train_mod.train(micro_cfg_path, tmp_path / "bad", max_steps=1,
                            num_devices=8)


class TestObservability:
    def test_pr_logged_and_stage_breakdown(self, micro_cfg_path, tmp_path,
                                           capsys):
        model_dir = tmp_path / "obs"
        train_mod.train(micro_cfg_path, model_dir, max_steps=2,
                        display_step=1)
        log = (model_dir / "log.txt").read_text()
        assert "PR @0.1" in log or "PR @" in log  # PrecisionRecall lines
        train_mod.evaluate(micro_cfg_path, model_dir, measure_time=True)
        out = capsys.readouterr().out
        for stage in ("vfe", "middle", "rpn", "predict"):
            assert f"stage {stage}:" in out

    def test_tensorboard_and_profile(self, micro_cfg_path, tmp_path):
        model_dir = tmp_path / "tbprof"
        train_mod.train(micro_cfg_path, model_dir, max_steps=4,
                        display_step=2, profile_steps=1)
        assert (model_dir / "summary").exists()
        assert any((model_dir / "summary").iterdir())
        assert (model_dir / "profile").exists()


class TestSparsePallasTrainRuntime:
    """SECOND sparse training with the Pallas gather-GEMM config flags
    (interpret mode on CPU): key-sorted voxels -> monotone rulebooks ->
    windowed kernel, with the custom-VJP backward."""

    @pytest.fixture(scope="class")
    def pallas_cfg_path(self, tmp_path_factory):
        cfg = SPARSE_MICRO_CONFIG.replace(
            "  second: {",
            "  second: {\n    use_pallas_sparse_gemm: true", 1,
        ).replace(
            "max_number_of_voxels: 256\n    shuffle_points: true",
            "max_number_of_voxels: 256\n    sort_voxels_by_key: true\n"
            "    shuffle_points: true",
        )
        p = tmp_path_factory.mktemp("cfg") / "micro_sparse_pallas.config"
        p.write_text(cfg)
        return p

    def test_train_eval_with_pallas_gemm(self, pallas_cfg_path, tmp_path):
        model_dir = tmp_path / "sp_pl"
        bundle = train_mod.Bundle(pallas_cfg_path)
        assert bundle.model_cfg.sparse_use_pallas_gemm
        state = train_mod.train(pallas_cfg_path, model_dir, max_steps=2,
                                display_step=1)
        assert int(state["step"]) == 2
        result = train_mod.evaluate(pallas_cfg_path, model_dir)
        assert np.isfinite(result["mAP.bev"])

    def test_train_eval_keymatch_no_host_rulebooks(self, pallas_cfg_path,
                                                   tmp_path):
        """use_keymatch_sparse_gemm trains WITHOUT host rulebooks: the
        input pipeline must not build/dispatch rb* arrays (the per-step
        rulebook batch is ~140 MB at honest FHD capacities, which the
        TPU relay leaks into host RSS — the r4c rehearsal OOM)."""
        cfg = pathlib.Path(pallas_cfg_path).read_text().replace(
            "use_pallas_sparse_gemm: true",
            "use_pallas_sparse_gemm: true\n"
            "    use_keymatch_sparse_gemm: true", 1)
        cfg_path = tmp_path / "micro_sparse_km.config"
        cfg_path.write_text(cfg)
        bundle = train_mod.Bundle(cfg_path)
        assert bundle.model_cfg.sparse_keymatch
        _, loader = bundle.input_reader(training=True)
        batch = next(iter(loader))
        assert not any(k.startswith("rb") for k in batch), \
            f"host rulebooks built in keymatch mode: {sorted(batch)}"
        model_dir = tmp_path / "sp_km"
        state = train_mod.train(cfg_path, model_dir, max_steps=2,
                                display_step=1)
        assert int(state["step"]) == 2
        result = train_mod.evaluate(cfg_path, model_dir)
        assert np.isfinite(result["mAP.bev"])


class TestBucketedSparse:
    """static_shape_buckets on the SECOND path: host rulebooks built at
    the example's bucket, padded to the batch bucket (VERDICT r2 item 7)."""

    @pytest.fixture(scope="class")
    def bucket_cfg_path(self, tmp_path_factory):
        cfg = SPARSE_MICRO_CONFIG.replace(
            "anchor_area_threshold: -1.0",
            "anchor_area_threshold: -1.0\n"
            "    static_shape_buckets: [64, 128, 256]", 1
        ).replace("batch_size: 1", "batch_size: 2", 1)
        p = tmp_path_factory.mktemp("cfg") / "micro_sparse_bucket.config"
        p.write_text(cfg)
        return p

    def test_batches_arrive_bucketed(self, bucket_cfg_path):
        bundle = train_mod.Bundle(bucket_cfg_path)
        _, loader = bundle.input_reader(training=True)
        batch = next(iter(loader))
        V = batch["voxels"].shape[1]
        assert V in (64, 128, 256)
        # rulebook shapes must match the bucket's plan, not full capacity
        from automatic_as_built_reconstruction_tpu.ops import (
            sparse_conv as sc)
        from automatic_as_built_reconstruction_tpu.models import (
            voxelnet as voxelnet_mod)
        grid, specs = sc.respec(
            voxelnet_mod.middle_plan(bundle.model_cfg, 256))
        plan_b = sc.plan_from_specs(grid, V, specs)
        assert batch["rb0_subm_idx"].shape[-1] == plan_b[0].in_cap
        assert batch["rb0_out_coords"].shape[-2] == plan_b[0].out_cap

    def test_bucketed_forward_matches_full_capacity(self, bucket_cfg_path):
        """Same scan at bucket capacity vs full capacity -> identical
        RPN maps (padding is semantically neutral end to end)."""
        import jax as _jax
        from automatic_as_built_reconstruction_tpu.data import batching
        from automatic_as_built_reconstruction_tpu.models import (
            voxelnet as voxelnet_mod)
        from automatic_as_built_reconstruction_tpu.ops import (
            rulebook_host as rbh, sparse_conv as sc)

        bundle = train_mod.Bundle(bucket_cfg_path)
        full_plan = voxelnet_mod.middle_plan(bundle.model_cfg, 256)
        prep_ds, _ = bundle.input_reader(training=True)
        # pick the sparsest of a few scenes so a sub-capacity bucket
        # is actually exercised
        exs = [prep_ds.example(i, seed=11 + i) for i in range(4)]
        ex = min(exs, key=lambda e: int(e["num_voxels"]))
        nv = int(ex["num_voxels"])
        buckets = tuple(range(64, 257, 64))
        # full-capacity rulebooks for the reference forward
        ex_full = dict(ex)
        ex_full.update(rbh.build_middle_rulebooks(
            ex["coordinates"], full_plan))
        # bucketed twin at the smallest bucket holding nv
        bucket = batching.pick_bucket(nv, buckets)
        assert bucket < 256 or nv > 192, "no sub-capacity bucket hit"

        grid, specs = sc.respec(full_plan)
        plan_b = sc.plan_from_specs(grid, bucket, specs)
        ex_b = batching.shrink_to_bucket(dict(ex), bucket)
        ex_b.update(rbh.build_middle_rulebooks(
            ex_b["coordinates"], plan_b))
        ex_b = batching.pad_rulebooks_to_plan(ex_b, plan_b)

        model = bundle.model
        variables = model.init(
            _jax.random.key(0), ex_full["voxels"][None],
            ex_full["num_points"][None], ex_full["coordinates"][None])

        def fwd(e, plan):
            books = rbh.unflatten(
                {k: v[None] for k, v in e.items()
                 if k.startswith("rb")}, len(plan))
            return model.apply(variables, e["voxels"][None],
                               e["num_points"][None],
                               e["coordinates"][None],
                               middle_rulebooks=books)
        p_full = fwd(ex_full, full_plan)
        p_b = fwd(ex_b, plan_b)
        for k in p_full:
            np.testing.assert_allclose(np.asarray(p_full[k]),
                                       np.asarray(p_b[k]),
                                       rtol=1e-4, atol=1e-4)

    def test_bucketed_training_runs(self, bucket_cfg_path, tmp_path):
        state = train_mod.train(bucket_cfg_path, tmp_path / "bkt",
                                max_steps=2, display_step=1)
        assert int(state["step"]) == 2


DENSE_TAIL_CONFIG = SPARSE_MICRO_CONFIG.replace(
    "downsample_factor: 8",
    "downsample_factor: 8\n      dense_tail_blocks: 1",
)


@pytest.fixture(scope="module")
def dense_tail_cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "micro_dense_tail.config"
    p.write_text(DENSE_TAIL_CONFIG)
    return p


class TestDenseTailTrainRuntime:
    """sparse middle with dense_tail_blocks: the trailing blocks run as
    masked dense convs — no host rulebooks are built for them and the
    train/eval loop works end to end."""

    def test_tail_blocks_skip_host_rulebooks(self, dense_tail_cfg_path):
        from automatic_as_built_reconstruction_tpu.data import batching
        bundle = train_mod.Bundle(dense_tail_cfg_path)
        assert bundle.model_cfg.sparse_dense_tail_blocks == 1
        from automatic_as_built_reconstruction_tpu.models import (
            voxelnet as voxelnet_mod)
        n_blocks = voxelnet_mod.num_middle_blocks(bundle.model_cfg)
        _, loader = bundle.input_reader(training=True)
        batch = next(iter(loader))
        example = batching.device_example(batch)
        assert "rb0_subm_idx" in example
        for bi in range(n_blocks - 1, n_blocks):
            assert f"rb{bi}_out_valid" not in example

    def test_train_eval_dense_tail(self, dense_tail_cfg_path, tmp_path):
        model_dir = tmp_path / "dense_tail_run"
        state = train_mod.train(dense_tail_cfg_path, model_dir,
                                max_steps=2, display_step=1)
        assert int(state["step"]) == 2
        result = train_mod.evaluate(dense_tail_cfg_path, model_dir)
        assert "mAP.bev" in result
        assert np.isfinite(result["mAP.bev"])


class TestStaticBatchCache:
    """Run-constant batch keys (anchors) are cached on device instead of
    re-shipped every step (~2 MB/example/step of H2D + relay RSS leak)."""

    def test_same_anchors_reuse_device_array(self):
        import numpy as np
        from automatic_as_built_reconstruction_tpu.train import train as t
        t._STATIC_DEVICE_CACHE.clear()
        anchors = np.random.default_rng(0).normal(
            size=(2, 100, 7)).astype(np.float32)
        a1 = t._to_device({"anchors": anchors, "labels": np.zeros(3)})
        a2 = t._to_device({"anchors": anchors.copy(),
                           "labels": np.ones(3)})
        assert a1["anchors"] is a2["anchors"]

    def test_changed_anchors_refresh(self):
        import numpy as np
        from automatic_as_built_reconstruction_tpu.train import train as t
        t._STATIC_DEVICE_CACHE.clear()
        rng = np.random.default_rng(1)
        anchors = rng.normal(size=(2, 100, 7)).astype(np.float32)
        a1 = t._to_device({"anchors": anchors})
        changed = anchors * 2.0
        a2 = t._to_device({"anchors": changed})
        assert a1["anchors"] is not a2["anchors"]
        assert np.allclose(np.asarray(a2["anchors"]), changed)
