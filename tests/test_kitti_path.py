"""End-to-end KITTI adapter test on a synthetic mini-KITTI tree.

Exercises kitti_common parsing, create_data (infos, reduced clouds,
gt database), KittiDataset sensor data + camera->lidar conversion, and the
official eval with perfect detections (AP must be 100).
"""
import pathlib

import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.core import box_ops
from automatic_as_built_reconstruction_tpu.data import create_data, kitti_common
from automatic_as_built_reconstruction_tpu.data.kitti_dataset import KittiDataset

# velodyne -> camera: cam x=right(-velo y), y=down(-velo z), z=fwd(velo x)
TR_VELO_TO_CAM = np.array([
    [0.0, -1.0, 0.0, 0.0],
    [0.0, 0.0, -1.0, 0.0],
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0]])
P2 = np.array([
    [400.0, 0.0, 621.0, 0.0],
    [0.0, 400.0, 187.5, 0.0],
    [0.0, 0.0, 1.0, 0.0]])

CARS = [  # lidar-frame boxes [x, y, z(bottom), w, l, h, yaw]
    ([10.0, 2.0, -1.6, 1.6, 3.9, 1.5, 0.3], "000000"),
    ([15.0, -3.0, -1.6, 1.6, 3.9, 1.5, -1.2], "000000"),
    ([8.0, 0.0, -1.6, 1.6, 3.9, 1.5, 0.0], "000001"),
]


def _label_line(box_lidar):
    box_cam = box_ops.box_lidar_to_camera(
        np.asarray(box_lidar, np.float64)[None], np.eye(4), TR_VELO_TO_CAM)[0]
    x, y, z, l, h, w, ry = box_cam
    # project rough 2D bbox
    corners = box_ops.center_to_corner_box3d(
        box_cam[None, :3], box_cam[None, [3, 5, 4]][:, [0, 1, 2]],
        box_cam[None, 6], origin=(0.5, 1.0, 0.5), axis=1)[0]
    pix = box_ops.project_to_image(corners, P2)
    x1, y1 = pix.min(0)
    x2, y2 = pix.max(0)
    return (f"Car 0.00 0 0.0 {x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
            f"{h:.2f} {w:.2f} {l:.2f} {x:.2f} {y:.2f} {z:.2f} {ry:.2f}")


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_kitti")
    rng = np.random.default_rng(0)
    for sub in ("velodyne", "label_2", "calib"):
        (root / "training" / sub).mkdir(parents=True)
    (root / "ImageSets").mkdir()
    frames = {"000000": [], "000001": []}
    for box, frame in CARS:
        frames[frame].append(box)
    for frame, boxes in frames.items():
        # points: box surfaces + ground, all in front of the camera
        pts = [np.c_[rng.uniform(3, 40, (2000, 1)),
                     rng.uniform(-15, 15, (2000, 1)),
                     rng.uniform(-1.8, -1.6, (2000, 1)),
                     rng.random((2000, 1))]]
        for b in boxes:
            local = rng.uniform(-0.5, 0.5, (400, 3)) * np.asarray(b[3:6])
            local[:, 2] += b[5] / 2
            c, s = np.cos(b[6]), np.sin(b[6])
            pts.append(np.c_[
                local[:, 0] * c - local[:, 1] * s + b[0],
                local[:, 0] * s + local[:, 1] * c + b[1],
                local[:, 2] + b[2], np.ones((400, 1))])
        np.concatenate(pts).astype(np.float32).tofile(
            root / "training" / "velodyne" / f"{frame}.bin")
        (root / "training" / "label_2" / f"{frame}.txt").write_text(
            "\n".join(_label_line(b) for b in boxes) + "\n")
        calib = [
            "P0: " + " ".join(map(str, P2.reshape(-1))),
            "P1: " + " ".join(map(str, P2.reshape(-1))),
            "P2: " + " ".join(map(str, P2.reshape(-1))),
            "P3: " + " ".join(map(str, P2.reshape(-1))),
            "R0_rect: " + " ".join(map(str, np.eye(3).reshape(-1))),
            "Tr_velo_to_cam: " + " ".join(
                map(str, TR_VELO_TO_CAM[:3].reshape(-1))),
            "Tr_imu_to_velo: " + " ".join(
                map(str, np.eye(4)[:3].reshape(-1))),
        ]
        (root / "training" / "calib" / f"{frame}.txt").write_text(
            "\n".join(calib) + "\n")
    (root / "ImageSets" / "train.txt").write_text("0\n")
    (root / "ImageSets" / "val.txt").write_text("1\n")
    create_data.kitti_data_prep(root)
    return root


class TestKittiPipeline:
    def test_label_roundtrip(self, kitti_root):
        anno = kitti_common.get_label_anno(
            kitti_root / "training" / "label_2" / "000000.txt")
        assert list(anno["name"]) == ["Car", "Car"]
        assert anno["bbox"].shape == (2, 4)
        boxes_cam = kitti_common.anno_to_rbboxes(anno)
        back = box_ops.box_camera_to_lidar(boxes_cam, np.eye(4),
                                           TR_VELO_TO_CAM)
        ref = np.asarray([b for b, f in CARS if f == "000000"])
        np.testing.assert_allclose(back[:, :6], ref[:, :6], atol=0.02)

    def test_infos_and_reduced(self, kitti_root):
        import pickle
        with open(kitti_root / "kitti_infos_train.pkl", "rb") as f:
            infos = pickle.load(f)
        assert len(infos) == 1 and infos[0]["image_idx"] == 0
        assert "difficulty" in infos[0]["annos"]
        reduced = (kitti_root / "training" / "velodyne_reduced"
                   / "000000.bin")
        assert reduced.exists()
        pts = np.fromfile(reduced, np.float32).reshape(-1, 4)
        full = np.fromfile(
            kitti_root / "training" / "velodyne" / "000000.bin",
            np.float32).reshape(-1, 4)
        assert 0 < len(pts) <= len(full)

    def test_gt_database(self, kitti_root):
        import pickle
        with open(kitti_root / "kitti_dbinfos_train.pkl", "rb") as f:
            db = pickle.load(f)
        assert "Car" in db and len(db["Car"]) == 2
        info = db["Car"][0]
        pts = np.fromfile(kitti_root / info["path"], np.float32).reshape(
            -1, 4)
        assert len(pts) == info["num_points_in_gt"] > 100
        # stored box-relative: centered near origin
        assert np.abs(pts[:, :2].mean(0)).max() < 1.0

    def test_dataset_and_perfect_eval(self, kitti_root):
        ds = KittiDataset(root_path=kitti_root,
                          info_path=kitti_root / "kitti_infos_train.pkl",
                          class_names=["Car"])
        assert len(ds) == 1
        sd = ds.get_sensor_data(0)
        boxes = sd["annotations"]["boxes"]
        assert boxes.shape == (2, 7)
        counts = box_ops.points_in_rbbox(
            sd["lidar"]["points"], boxes).sum(0)
        assert (counts > 100).all()

        # perfect detections: under the exact devkit protocol 2 TPs fill
        # only 2 of 41 recall slots -> thresholds [0.9, 0.8], precision
        # [1, 1, 0...] -> AP11 = 100/11, AP40 = 100/40 (devkit-traced)
        dets = [{"box3d_lidar": boxes.astype(np.float64),
                 "scores": np.array([0.9, 0.8]),
                 "label_preds": np.array([0, 0])}]
        result = ds.evaluation(dets)
        for metric in ("bbox", "bev", "3d"):
            assert result[f"Car.{metric}.easy"] == pytest.approx(
                100.0 / 11, abs=1e-6), metric
            assert result[f"Car.{metric}.easy.R40"] == pytest.approx(
                100.0 / 40, abs=1e-6), metric
        assert "Car AP" in result["result_str"]


class TestResultWriting:
    def test_label_file_roundtrip(self, kitti_root, tmp_path):
        ds = KittiDataset(root_path=kitti_root,
                          info_path=kitti_root / "kitti_infos_train.pkl",
                          class_names=["Car"])
        sd = ds.get_sensor_data(0)
        boxes = sd["annotations"]["boxes"].astype(np.float64)
        dets = [{"box3d_lidar": boxes, "scores": np.array([0.9, 0.8]),
                 "label_preds": np.array([0, 0])}]
        ds.evaluation(dets, output_dir=tmp_path)
        out = tmp_path / "data" / "000000.txt"
        assert out.exists()
        # parse back: camera boxes must match the written ones
        reparsed = kitti_common.get_label_anno(out)
        assert list(reparsed["name"]) == ["Car", "Car"]
        back = box_ops.box_camera_to_lidar(
            kitti_common.anno_to_rbboxes(reparsed), np.eye(4),
            TR_VELO_TO_CAM)
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=0.01)
        assert (reparsed["score"] > 0).all()
