"""Real-scan ingestion: PLY/PCD readers + from-scans building data prep
(VERDICT r2 item 8)."""
import json

import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.data import (building,
                                                        create_data, scan_io)


@pytest.fixture()
def cloud():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    pts[:, 3] = rng.random(500)
    return pts


class TestPly:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, cloud, binary):
        p = tmp_path / "a.ply"
        scan_io.write_ply(cloud, p, binary=binary)
        back = scan_io.read_ply(p)
        np.testing.assert_allclose(back, cloud, atol=1e-5)

    def test_xyz_only(self, tmp_path, cloud):
        p = tmp_path / "b.ply"
        scan_io.write_ply(cloud[:, :3], p)
        back = scan_io.read_ply(p)
        assert back.shape == (500, 3)

    def test_nan_points_dropped(self, tmp_path, cloud):
        bad = cloud.copy()
        bad[7, 0] = np.nan
        p = tmp_path / "c.ply"
        scan_io.write_ply(bad, p)
        assert scan_io.read_ply(p).shape[0] == 499

    def test_extra_vertex_props_and_faces_ignored(self, tmp_path):
        # hand-built ascii PLY with extra channels + a face element
        body = "\n".join(
            f"{i} {i+0.5} {-i} 12 0.25" for i in range(4))
        p = tmp_path / "d.ply"
        p.write_text(
            "ply\nformat ascii 1.0\nelement vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty float intensity\n"
            "element face 1\nproperty list uchar int vertex_index\n"
            "end_header\n" + body + "\n3 0 1 2\n")
        pts = scan_io.read_ply(p)
        assert pts.shape == (4, 4)
        np.testing.assert_allclose(pts[:, 3], 0.25)
        np.testing.assert_allclose(pts[2], [2, 2.5, -2, 0.25])


class TestPcd:
    def _write_pcd(self, path, pts, mode):
        n = pts.shape[0]
        header = ("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z intensity\n"
                  "SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
                  f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                  f"POINTS {n}\nDATA {mode}\n")
        with open(path, "wb") as f:
            f.write(header.encode())
            if mode == "binary":
                f.write(np.ascontiguousarray(pts, "<f4").tobytes())
            else:
                np.savetxt(f, pts, fmt="%.6f")

    @pytest.mark.parametrize("mode", ["binary", "ascii"])
    def test_read(self, tmp_path, cloud, mode):
        p = tmp_path / "a.pcd"
        self._write_pcd(p, cloud, mode)
        back = scan_io.read_pcd(p)
        np.testing.assert_allclose(back, cloud, atol=1e-5)

    def test_dispatch(self, tmp_path, cloud):
        p = tmp_path / "a.pcd"
        self._write_pcd(p, cloud, "binary")
        np.testing.assert_allclose(scan_io.read_scan(p), cloud, atol=1e-5)
        b = tmp_path / "a.bin"
        cloud.tofile(b)
        np.testing.assert_allclose(scan_io.read_scan(b), cloud)


class TestFromScansPrep:
    @pytest.fixture(scope="class")
    def scan_root(self, tmp_path_factory):
        """Write synthetic scenes OUT as ply+json, ingest them back."""
        scan_dir = tmp_path_factory.mktemp("scans")
        for i in range(4):
            scene = building.generate_building_scene(100 + i)
            scan_io.write_ply(scene["points"],
                              scan_dir / f"scan_{i}.ply",
                              binary=(i % 2 == 0))
            scan_io.write_annotations(scan_dir / f"scan_{i}.json",
                                      scene["gt_boxes"],
                                      scene["gt_names"])
        root = tmp_path_factory.mktemp("ingested")
        create_data.building_data_prep_from_scans(scan_dir, root,
                                                  val_fraction=0.25)
        return root

    def test_layout(self, scan_root):
        assert (scan_root / "building_infos_train.pkl").exists()
        assert (scan_root / "building_infos_val.pkl").exists()
        assert (scan_root / "building_dbinfos_train.pkl").exists()
        assert len(list((scan_root / "scenes").glob("*.npz"))) == 4

    def test_dataset_reads_ingested_scans(self, scan_root):
        ds = building.BuildingDataset(
            root_path=scan_root,
            info_path=scan_root / "building_infos_train.pkl")
        assert len(ds) == 3
        sd = ds.get_sensor_data(0)
        assert sd["lidar"]["points"].shape[1] == 4
        assert len(sd["annotations"]["boxes"]) > 0
        assert "wall" in set(sd["annotations"]["names"])

    def test_trainer_runs_from_ingested_scans(self, scan_root, tmp_path):
        """1-step train from the ingested (non-synthetic-source) layout —
        closes the real-scan -> trainer loop."""
        pytest.importorskip("jax")
        from test_train_runtime import MICRO_CONFIG
        from automatic_as_built_reconstruction_tpu.train import (
            train as train_mod)
        cfg = MICRO_CONFIG.replace(
            'dataset: { dataset_class_name: "BuildingDataset" }',
            'dataset: {\n'
            '      dataset_class_name: "BuildingDataset"\n'
            f'      kitti_root_path: "{scan_root}"\n'
            f'      kitti_info_path: '
            f'"{scan_root / "building_infos_train.pkl"}"\n'
            '    }')
        p = tmp_path / "ingested.config"
        p.write_text(cfg)
        state = train_mod.train(p, tmp_path / "run", max_steps=1,
                                display_step=1)
        assert int(state["step"]) == 1

    def test_annotation_boxes_survive_roundtrip(self, scan_root, tmp_path):
        scene = building.generate_building_scene(100)
        import pickle
        with open(scan_root / "building_infos_train.pkl", "rb") as f:
            infos = pickle.load(f)
        np.testing.assert_allclose(infos[0]["gt_boxes"],
                                   scene["gt_boxes"], atol=1e-5)

    def test_missing_sidecar_means_no_boxes(self, tmp_path):
        scan_dir = tmp_path / "s"
        scan_dir.mkdir()
        scene = building.generate_building_scene(7)
        scan_io.write_ply(scene["points"], scan_dir / "only.ply")
        root = tmp_path / "r"
        create_data.building_data_prep_from_scans(scan_dir, root)
        import pickle
        with open(root / "building_infos_train.pkl", "rb") as f:
            infos = pickle.load(f)
        assert infos[0]["gt_boxes"].shape == (0, 7)
