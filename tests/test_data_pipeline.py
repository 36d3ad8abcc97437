"""Augmentation, GT-db sampler, building scenes, prep_pointcloud, eval."""
import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.core import (
    anchors as anchors_mod, augment, box_coders, box_ops, geometry,
    region_similarity, sample_ops, target_assign, voxelize)
from automatic_as_built_reconstruction_tpu.data import building, preprocess
from automatic_as_built_reconstruction_tpu.utils import eval as eval_mod


def boxes_with_points(rng, n=4):
    boxes = np.stack([
        rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
        np.full(n, -1.5), rng.uniform(1, 2, n), rng.uniform(2, 4, n),
        np.full(n, 1.5), rng.uniform(-np.pi, np.pi, n)], axis=1)
    # spread boxes out to avoid initial collisions
    boxes[:, 0] += np.arange(n) * 8
    pts = []
    for b in boxes:
        local = rng.uniform(-0.45, 0.45, (50, 3)) * b[3:6] + [0, 0, b[5] / 2]
        c, s = np.cos(b[6]), np.sin(b[6])
        pts.append(np.c_[local[:, 0] * c - local[:, 1] * s + b[0],
                         local[:, 0] * s + local[:, 1] * c + b[1],
                         local[:, 2] + b[2], np.ones((50, 1))])
    return boxes.astype(np.float64), np.concatenate(pts)


class TestAugment:
    def test_global_rotation_consistency(self):
        rng = np.random.default_rng(0)
        boxes, points = boxes_with_points(rng)
        inside_before = box_ops.points_in_rbbox(points, boxes).sum()
        augment.global_rotation(boxes, points, rng=rng)
        inside_after = box_ops.points_in_rbbox(points, boxes).sum()
        assert inside_before == inside_after

    def test_global_scaling_consistency(self):
        rng = np.random.default_rng(1)
        boxes, points = boxes_with_points(rng)
        inside_before = box_ops.points_in_rbbox(points, boxes).sum()
        augment.global_scaling(boxes, points, (0.8, 1.2), rng=rng)
        assert box_ops.points_in_rbbox(points, boxes).sum() == inside_before

    def test_flip_consistency(self):
        rng = np.random.default_rng(2)
        boxes, points = boxes_with_points(rng)
        inside_before = box_ops.points_in_rbbox(points, boxes).sum()
        augment.random_flip(boxes, points, probability=1.0, rng=rng)
        assert box_ops.points_in_rbbox(points, boxes).sum() == inside_before

    def test_noise_per_object_moves_points_with_boxes(self):
        rng = np.random.default_rng(3)
        boxes, points = boxes_with_points(rng)
        inside_before = box_ops.points_in_rbbox(points, boxes).sum()
        augment.noise_per_object(boxes, points,
                                 center_noise_std=(0.6, 0.6, 0.2),
                                 rotation_perturb=(-0.3, 0.3), rng=rng)
        inside_after = box_ops.points_in_rbbox(points, boxes).sum()
        # points travel with their boxes (tiny edge losses tolerated)
        assert inside_after >= inside_before * 0.95
        # no collisions introduced
        bev = boxes[:, [0, 1, 3, 4, 6]]
        coll = geometry.box_collision_test(bev, bev)
        np.fill_diagonal(coll, False)
        assert not coll.any()


class TestSampler:
    @pytest.fixture
    def db(self, tmp_path):
        rng = np.random.default_rng(4)
        infos = {"Car": [], "Pedestrian": []}
        for i in range(20):
            name = "Car" if i % 2 == 0 else "Pedestrian"
            box = np.array([rng.uniform(0, 40), rng.uniform(-20, 20), -1.5,
                            1.6, 3.9, 1.56, rng.uniform(-np.pi, np.pi)],
                           np.float32)
            pts = rng.uniform(-0.5, 0.5, (30, 4)).astype(np.float32)
            path = tmp_path / f"obj_{i}.bin"
            pts.tofile(path)
            infos[name].append({
                "name": name, "path": path.name,
                "box3d_lidar": box, "num_points_in_gt": 30,
                "difficulty": 0})
        return infos, tmp_path

    def test_sample_all_quota(self, db):
        infos, root = db
        sampler = sample_ops.DataBaseSampler(
            infos, groups=[{"Car": 6}], root_path=root,
            rng=np.random.default_rng(5))
        gt = np.array([[5.0, 0.0, -1.5, 1.6, 3.9, 1.56, 0.0]], np.float32)
        res = sampler.sample_all(gt, np.array(["Car"]))
        assert res is not None
        assert len(res["gt_boxes"]) <= 5  # 6 - 1 existing
        assert (res["gt_names"] == "Car").all()
        # no collisions among result + scene
        allb = np.concatenate([gt, res["gt_boxes"]])[:, [0, 1, 3, 4, 6]]
        coll = geometry.box_collision_test(allb, allb)
        np.fill_diagonal(coll, False)
        assert not coll.any()
        # points restored to world position near boxes
        assert len(res["points"]) == 30 * len(res["gt_boxes"])

    def test_filters(self, db):
        infos, _ = db
        out = sample_ops.filter_by_min_num_points(
            {k: list(v) for k, v in infos.items()}, {"Car": 31})
        assert len(out["Car"]) == 0
        out = sample_ops.filter_by_difficulty(
            {k: list(v) for k, v in infos.items()}, [0])
        assert len(out["Car"]) == 0

    def test_batch_sampler_epoch(self):
        items = [{"i": i} for i in range(5)]
        bs = sample_ops.BatchSampler(items, rng=np.random.default_rng(0))
        got = [x["i"] for x in bs.sample(5)]
        assert sorted(got) == list(range(5))
        got2 = [x["i"] for x in bs.sample(7)]
        assert len(got2) == 7


class TestBuildingScenes:
    def test_generate(self):
        scene = building.generate_building_scene(0)
        assert len(scene["points"]) > 5000
        assert len(scene["gt_boxes"]) >= 4
        assert set(scene["gt_names"]) <= set(building.CLASSES)
        assert "wall" in scene["gt_names"]
        # walls are thin: w << l
        walls = scene["gt_boxes"][scene["gt_names"] == "wall"]
        assert (walls[:, 3] < 0.5).all() and (walls[:, 4] > 0.5).all()

    def test_deterministic(self):
        a = building.generate_building_scene(7)
        b = building.generate_building_scene(7)
        np.testing.assert_array_equal(a["points"], b["points"])
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])

    def test_dataset_adapter(self):
        ds = building.BuildingDataset(num_synthetic=4)
        assert len(ds) == 4
        sd = ds.get_sensor_data(1)
        assert sd["lidar"]["points"].shape[1] == 4
        assert len(sd["annotations"]["boxes"]) == len(
            sd["annotations"]["names"])

    def test_points_near_wall_surfaces(self):
        scene = building.generate_building_scene(3)
        walls = scene["gt_boxes"][scene["gt_names"] == "wall"]
        # grow walls slightly; a decent share of points must fall inside
        grown = walls.copy()
        grown[:, 3] += 0.1
        inside = box_ops.points_in_rbbox(scene["points"], grown)
        assert inside.any(axis=1).mean() > 0.2


class TestPrepPointcloud:
    def _setup(self):
        gen = voxelize.VoxelGenerator((0.25, 0.25, 4.0), (0, 0, -1, 16, 16, 3),
                                      max_num_points=10, max_voxels=6000)
        agen = anchors_mod.AnchorGeneratorRange(
            anchor_ranges=(0, 0, 0.0, 16, 16, 0.0),
            sizes=((0.2, 3.0, 2.8),), rotations=(0, np.pi / 2),
            match_threshold=0.35, unmatch_threshold=0.2,
            class_name="wall")
        assigner = target_assign.TargetAssigner(
            box_coder=box_coders.GroundBox3dCoder(),
            anchor_generators=[agen], classes=["wall"],
            region_similarity_calculator=(
                region_similarity.NearestIouSimilarity()))
        cfg = preprocess.PrepConfig(
            class_names=("wall",), max_voxels=6000,
            global_rotation_noise=(-0.1, 0.1),
            global_scaling_noise=(0.98, 1.02),
            anchor_area_threshold=1.0)
        return gen, assigner, cfg

    def test_training_example(self):
        gen, assigner, cfg = self._setup()
        ds = building.BuildingDataset(num_synthetic=2)
        ex = preprocess.prep_pointcloud(
            ds.get_sensor_data(0), gen, assigner, cfg, training=True,
            rng=np.random.default_rng(0), feature_map_size=(1, 32, 32))
        assert ex["voxels"].shape == (6000, 10, 4)
        assert ex["coordinates"].shape == (6000, 3)
        assert ex["anchors"].shape == (32 * 32 * 2, 7)
        assert ex["labels"].shape == (32 * 32 * 2,)
        assert (ex["labels"] > 0).sum() > 0, "no positive anchors"
        assert ex["anchors_mask"].dtype == bool
        assert ex["reg_targets"].shape == (32 * 32 * 2, 7)

    def test_eval_example_no_targets(self):
        gen, assigner, cfg = self._setup()
        ds = building.BuildingDataset(num_synthetic=2)
        ex = preprocess.prep_pointcloud(
            ds.get_sensor_data(0), gen, assigner, cfg, training=False,
            rng=np.random.default_rng(0), feature_map_size=(1, 32, 32))
        assert "labels" not in ex
        assert ex["num_voxels"] > 0

    def test_deterministic_given_rng(self):
        gen, assigner, cfg = self._setup()
        ds = building.BuildingDataset(num_synthetic=2)
        e1 = preprocess.prep_pointcloud(
            ds.get_sensor_data(1), gen, assigner, cfg, training=True,
            rng=np.random.default_rng(42), feature_map_size=(1, 32, 32))
        e2 = preprocess.prep_pointcloud(
            ds.get_sensor_data(1), gen, assigner, cfg, training=True,
            rng=np.random.default_rng(42), feature_map_size=(1, 32, 32))
        np.testing.assert_array_equal(e1["voxels"], e2["voxels"])
        np.testing.assert_array_equal(e1["labels"], e2["labels"])


class TestLidarEval:
    def test_perfect_detections(self):
        rng = np.random.default_rng(0)
        gt_annos, dets = [], []
        for i in range(4):
            n = 5
            boxes = np.c_[rng.uniform(0, 20, (n, 2)), np.zeros((n, 1)),
                          rng.uniform(1, 3, (n, 2)), np.full((n, 1), 2.0),
                          rng.uniform(-np.pi, np.pi, (n, 1))]
            gt_annos.append({"boxes": boxes, "names": np.array(["wall"] * n)})
            dets.append({"box3d_lidar": boxes.copy(),
                         "scores": rng.uniform(0.5, 1, n),
                         "label_preds": np.zeros(n, np.int64)})
        res = eval_mod.evaluate_lidar_ap(gt_annos, dets, ["wall"],
                                         {"wall": 0.5})
        assert res["wall.bev.ap"] == pytest.approx(1.0, abs=1e-6)
        assert res["wall.3d.ap"] == pytest.approx(1.0, abs=1e-6)

    def test_false_positives_lower_ap(self):
        rng = np.random.default_rng(1)
        n = 5
        boxes = np.c_[rng.uniform(0, 20, (n, 2)), np.zeros((n, 1)),
                      rng.uniform(1, 3, (n, 2)), np.full((n, 1), 2.0),
                      rng.uniform(-np.pi, np.pi, (n, 1))]
        gt = [{"boxes": boxes, "names": np.array(["wall"] * n)}]
        fps = boxes.copy()
        fps[:, 0] += 100  # far away -> all FPs
        det_boxes = np.concatenate([boxes, fps])
        # FPs get HIGHER scores -> they hurt precision at every recall
        dets = [{"box3d_lidar": det_boxes,
                 "scores": np.r_[np.full(n, 0.5), np.full(n, 0.9)],
                 "label_preds": np.zeros(2 * n, np.int64)}]
        res = eval_mod.evaluate_lidar_ap(gt, dets, ["wall"], {"wall": 0.5})
        assert 0.2 < res["wall.bev.ap"] < 0.9

    def test_missed_gt_caps_recall(self):
        rng = np.random.default_rng(2)
        n = 4
        boxes = np.c_[rng.uniform(0, 30, (n, 2)), np.zeros((n, 1)),
                      rng.uniform(1, 3, (n, 2)), np.full((n, 1), 2.0),
                      rng.uniform(-np.pi, np.pi, (n, 1))]
        gt = [{"boxes": boxes, "names": np.array(["wall"] * n)}]
        dets = [{"box3d_lidar": boxes[:2], "scores": np.array([0.9, 0.8]),
                 "label_preds": np.zeros(2, np.int64)}]
        res = eval_mod.evaluate_lidar_ap(gt, dets, ["wall"], {"wall": 0.5})
        assert res["wall.bev.ap"] == pytest.approx(0.5, abs=0.06)


class TestBucketedPadding:
    """SURVEY §5.7: batches ship at the smallest bucket holding their
    densest member; rulebook examples stay at full capacity."""

    def _fake_prep_ds(self, cap=256, with_rb=False):
        from automatic_as_built_reconstruction_tpu.train.input_pipeline \
            import PrepDataset

        class FakeDS:
            def __len__(self):
                return 8

            def get_sensor_data(self, idx):
                return {"idx": idx}

        def prep(sd, rng):
            nv = 40 if sd["idx"] % 2 == 0 else 100
            ex = {
                "voxels": np.zeros((cap, 4, 4), np.float32),
                "num_points": np.zeros((cap,), np.int32),
                "coordinates": np.full((cap, 3), -1, np.int32),
                "num_voxels": np.asarray(nv, np.int32),
                "anchors": np.zeros((16, 7), np.float32),
            }
            if with_rb:
                ex["rb0_subm_idx"] = np.zeros((27, cap), np.int32)
            return ex

        return PrepDataset(FakeDS(), prep)

    def test_batch_shrinks_to_bucket(self):
        from automatic_as_built_reconstruction_tpu.train.input_pipeline \
            import BatchLoader
        ds = self._fake_prep_ds()
        loader = BatchLoader(ds, batch_size=2, shuffle=False,
                             num_workers=1, repeat=False,
                             buckets=(64, 128, 256))
        batches = list(loader)
        # idx 0/1 -> max nv 100 -> bucket 128; anchors untouched
        assert batches[0]["voxels"].shape == (2, 128, 4, 4)
        assert batches[0]["coordinates"].shape == (2, 128, 3)
        assert batches[0]["anchors"].shape == (2, 16, 7)

    def test_all_small_batch_uses_small_bucket(self):
        from automatic_as_built_reconstruction_tpu.train.input_pipeline \
            import BatchLoader

        ds = self._fake_prep_ds()
        # batch of one even-index example (nv=40) -> bucket 64
        loader = BatchLoader(ds, batch_size=1, shuffle=False,
                             num_workers=1, repeat=False,
                             buckets=(64, 128, 256))
        first = next(iter(loader))
        assert first["voxels"].shape == (1, 64, 4, 4)

    def test_rulebook_examples_not_bucketed(self):
        from automatic_as_built_reconstruction_tpu.train.input_pipeline \
            import BatchLoader
        ds = self._fake_prep_ds(with_rb=True)
        loader = BatchLoader(ds, batch_size=2, shuffle=False,
                             num_workers=1, repeat=False,
                             buckets=(64, 128, 256))
        first = next(iter(loader))
        assert first["voxels"].shape == (2, 256, 4, 4)

    def test_pooled_producer_order_deterministic(self):
        from automatic_as_built_reconstruction_tpu.train.input_pipeline \
            import BatchLoader
        ds = self._fake_prep_ds()
        a = [b["num_voxels"].tolist() for b in BatchLoader(
            ds, batch_size=2, shuffle=True, num_workers=1, seed=3,
            repeat=False)]
        b = [b["num_voxels"].tolist() for b in BatchLoader(
            ds, batch_size=2, shuffle=True, num_workers=4, seed=3,
            repeat=False)]
        assert a == b

    def test_process_workers_match_threads(self):
        """The fork-inherited process pool (the lineage DataLoader model)
        must produce bit-identical batches in the same order as the
        thread producer."""
        from automatic_as_built_reconstruction_tpu.train.input_pipeline \
            import BatchLoader
        ds = self._fake_prep_ds()
        thr = list(BatchLoader(ds, batch_size=2, shuffle=True,
                               num_workers=2, seed=3, repeat=False))
        proc = list(BatchLoader(ds, batch_size=2, shuffle=True,
                                num_workers=2, seed=3, repeat=False,
                                process_workers=True))
        assert len(thr) == len(proc) == 4
        for bt, bp in zip(thr, proc):
            assert sorted(bt) == sorted(bp)
            for k in bt:
                np.testing.assert_array_equal(bt[k], bp[k])
