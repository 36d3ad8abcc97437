"""Round-2 sampler/augmentation completeness: sample-time global rotation
range, gt-db group handling, frustum dropout, gt-points dropout.
[ref: SURVEY.md §2.1 sampler + augmentation rows]"""
import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.core import (augment, box_ops,
                                                        sample_ops)


@pytest.fixture
def db(tmp_path):
    rng = np.random.default_rng(4)
    infos = {"Car": []}
    for i in range(24):
        box = np.array([rng.uniform(10, 40), rng.uniform(-20, 20), -1.5,
                        1.6, 3.9, 1.56, rng.uniform(-np.pi, np.pi)],
                       np.float32)
        # crops are bottom-center-relative: z in [0, h)
        pts = np.concatenate([
            rng.uniform(-0.5, 0.5, (30, 2)), rng.uniform(0.1, 1.4, (30, 1)),
            rng.random((30, 1))], axis=1).astype(np.float32)
        path = tmp_path / f"obj_{i}.bin"
        pts.tofile(path)
        infos["Car"].append({
            "name": "Car", "path": path.name, "box3d_lidar": box,
            "num_points_in_gt": 30, "difficulty": 0})
    return infos, tmp_path


class TestSampleTimeGlobalRotation:
    def test_azimuth_lands_in_range(self, db):
        infos, root = db
        lo, hi = 0.3, 0.9
        sampler = sample_ops.DataBaseSampler(
            infos, groups=[{"Car": 8}], root_path=root,
            global_rot_range=(lo, hi), rng=np.random.default_rng(5))
        res = sampler.sample_all(np.zeros((0, 7), np.float32),
                                 np.array([], dtype="<U8"))
        assert res is not None and len(res["gt_boxes"]) > 0
        az = np.arctan2(res["gt_boxes"][:, 1], res["gt_boxes"][:, 0])
        # rotation convention: centers transform with rot_mat_T, which
        # maps azimuth alpha -> alpha - rot; the draw targets [lo, hi]
        assert ((az >= -hi - 1e-4) & (az <= hi + 1e-4)).all()

    def test_points_follow_rotation(self, db):
        infos, root = db
        sampler = sample_ops.DataBaseSampler(
            infos, groups=[{"Car": 4}], root_path=root,
            global_rot_range=(-1.0, 1.0), rng=np.random.default_rng(6))
        res = sampler.sample_all(np.zeros((0, 7), np.float32),
                                 np.array([], dtype="<U8"))
        assert res is not None
        # every pasted crop's points lie inside (an enlarged copy of) its
        # rotated box — rotation applied consistently to box and points
        boxes = res["gt_boxes"].copy()
        boxes[:, 3:6] += 0.4
        inside = box_ops.points_in_rbbox(res["points"], boxes)
        n = 30
        for j in range(len(boxes)):
            assert inside[j * n: (j + 1) * n, j].mean() > 0.9

    def test_zero_range_is_identity(self, db):
        infos, root = db
        s1 = sample_ops.DataBaseSampler(
            infos, groups=[{"Car": 4}], root_path=root,
            global_rot_range=(0.0, 0.0), rng=np.random.default_rng(7))
        s2 = sample_ops.DataBaseSampler(
            infos, groups=[{"Car": 4}], root_path=root,
            rng=np.random.default_rng(7))
        empty = np.zeros((0, 7), np.float32)
        r1 = s1.sample_all(empty, np.array([], dtype="<U8"))
        r2 = s2.sample_all(empty, np.array([], dtype="<U8"))
        np.testing.assert_array_equal(r1["gt_boxes"], r2["gt_boxes"])


class TestGroupSampling:
    def test_group_members_sampled_together(self, tmp_path):
        rng = np.random.default_rng(8)
        infos = {"Pedestrian": []}
        # 6 groups of 2 pedestrians walking together
        for g in range(6):
            cx, cy = rng.uniform(10, 40), rng.uniform(-20, 20)
            for m in range(2):
                box = np.array([cx + m * 1.2, cy, -1.5, 0.6, 0.8, 1.7, 0.0],
                               np.float32)
                pts = rng.uniform(-0.3, 0.3, (10, 4)).astype(np.float32)
                path = tmp_path / f"ped_{g}_{m}.bin"
                pts.tofile(path)
                infos["Pedestrian"].append({
                    "name": "Pedestrian", "path": path.name,
                    "box3d_lidar": box, "group_id": g,
                    "num_points_in_gt": 10, "difficulty": 0})
        sampler = sample_ops.DataBaseSampler(
            infos, groups=[{"Pedestrian": 3}], root_path=tmp_path,
            rng=np.random.default_rng(9))
        res = sampler.sample_all(np.zeros((0, 7), np.float32),
                                 np.array([], dtype="<U8"))
        assert res is not None
        # members arrive in complete pairs
        assert len(res["gt_boxes"]) % 2 == 0
        assert len(res["gt_boxes"]) >= 2
        # paired members keep their 1.2 m spacing
        boxes = res["gt_boxes"].reshape(-1, 2, 7)
        gaps = np.linalg.norm(boxes[:, 1, :2] - boxes[:, 0, :2], axis=-1)
        np.testing.assert_allclose(gaps, 1.2, atol=1e-5)


class TestFrustumDropout:
    def test_wedge_removed(self):
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.uniform(-40, 40, (5000, 2)),
            rng.uniform(-2, 0, (5000, 1)), rng.random((5000, 1))],
            axis=1).astype(np.float32)
        out = augment.frustum_dropout(pts, probability=1.0,
                                      azimuth_width=np.pi / 6,
                                      rng=np.random.default_rng(1))
        # full-circle cloud: the wedge always hits, ~width/2pi removed
        assert len(out) < len(pts)
        assert len(out) > len(pts) * 0.8
        # surviving points leave an empty wedge: max azimuth gap >= width
        az = np.sort(np.arctan2(out[:, 1], out[:, 0]))
        gaps = np.diff(np.concatenate([az, az[:1] + 2 * np.pi]))
        assert gaps.max() >= np.pi / 6 * 0.95

    def test_probability_zero_identity(self):
        pts = np.ones((10, 4), np.float32)
        out = augment.frustum_dropout(pts, probability=0.0,
                                      rng=np.random.default_rng(0))
        np.testing.assert_array_equal(out, pts)


class TestGtPointsDropout:
    def test_caps_points_in_chosen_boxes(self):
        rng = np.random.default_rng(2)
        box = np.array([[10.0, 0.0, -1.0, 2.0, 4.0, 2.0, 0.3]], np.float32)
        inside = np.concatenate([
            rng.uniform(9.5, 10.5, (200, 1)), rng.uniform(-1, 1, (200, 1)),
            rng.uniform(-0.9, 0.5, (200, 1)), rng.random((200, 1))],
            axis=1).astype(np.float32)
        outside = np.full((50, 4), 30.0, np.float32)
        pts = np.concatenate([inside, outside])
        out = augment.drop_points_in_gt(pts, box, drop_percentage=1.0,
                                        max_keep_points=15,
                                        rng=np.random.default_rng(3))
        kept_inside = box_ops.points_in_rbbox(out, box)[:, 0].sum()
        assert kept_inside == 15
        # points outside untouched
        assert (out == 30.0).all(axis=1).sum() == 50

    def test_zero_percentage_identity(self):
        pts = np.ones((10, 4), np.float32)
        box = np.zeros((1, 7), np.float32)
        out = augment.drop_points_in_gt(pts, box, 0.0, 5,
                                        rng=np.random.default_rng(0))
        np.testing.assert_array_equal(out, pts)


class TestConfigRoundTrip:
    def test_preprocess_fields_reach_prep_config(self):
        from automatic_as_built_reconstruction_tpu.builder import (
            input_reader_builder)
        from automatic_as_built_reconstruction_tpu.protos import (
            input_reader_pb2)
        cfg = input_reader_pb2.InputReader()
        pp = cfg.preprocess
        pp.frustum_dropout_prob = 0.4
        pp.frustum_dropout_azimuth_width = 0.5
        pp.groundtruth_points_drop_percentage = 0.3
        pp.groundtruth_drop_max_keep_points = 7
        prep = input_reader_builder._prep_config(pp, ["Car"], 1)
        assert prep.frustum_dropout_prob == pytest.approx(0.4)
        assert prep.frustum_dropout_azimuth_width == pytest.approx(0.5)
        assert prep.gt_points_drop_percentage == pytest.approx(0.3)
        assert prep.gt_drop_max_keep_points == 7

    def test_sampler_global_rot_range_reaches_sampler(self, db, tmp_path):
        import pickle
        from automatic_as_built_reconstruction_tpu.builder import (
            dbsampler_builder)
        from automatic_as_built_reconstruction_tpu.protos import (
            sampler_pb2)
        infos, root = db
        info_path = tmp_path / "dbinfos.pkl"
        with open(info_path, "wb") as f:
            pickle.dump(infos, f)
        cfg = sampler_pb2.DatabaseSampler()
        cfg.database_info_path = str(info_path)
        g = cfg.sample_groups.add()
        g.name_to_max_num["Car"] = 4
        cfg.global_random_rotation_range_per_object.extend([0.2, 0.8])
        sampler = dbsampler_builder.build(cfg)
        assert sampler._global_rot_range == pytest.approx((0.2, 0.8))
