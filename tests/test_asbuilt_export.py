"""Tests for the as-built model exporter (detections -> wall runs /
columns / door openings -> JSON + SVG)."""
from __future__ import annotations

import json

import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.utils import asbuilt_export as ax


def _wall_chain(p0, p1, n_seg, thickness=0.12, height=2.8, jitter=0.0,
                seed=0):
    """n_seg collinear wall boxes along p0->p1 (generator convention:
    l along the segment, yaw = atan2(seg) + pi/2)."""
    rng = np.random.default_rng(seed)
    p0, p1 = np.asarray(p0, float), np.asarray(p1, float)
    seg = p1 - p0
    yaw = float(np.arctan2(seg[1], seg[0]) + np.pi / 2)
    ln = float(np.hypot(*seg)) / n_seg
    boxes = []
    for i in range(n_seg):
        mid = p0 + (i + 0.5) / n_seg * seg
        mid = mid + rng.normal(0, jitter, 2)
        boxes.append([mid[0], mid[1], height / 2, thickness, ln, height,
                      yaw + rng.normal(0, jitter)])
    return np.asarray(boxes)


class TestMergeWallRuns:
    def test_collinear_chain_merges_to_one_run(self):
        boxes = _wall_chain((0, 0), (8, 0), 4)
        runs = ax.merge_wall_runs(boxes)
        assert len(runs) == 1
        r = runs[0]
        assert r["n_segments"] == 4
        assert r["length"] == pytest.approx(8.0, abs=1e-6)
        got = sorted([r["start"], r["end"]])
        np.testing.assert_allclose(got, [[0, 0], [8, 0]], atol=1e-6)
        assert r["thickness"] == pytest.approx(0.12)
        assert r["height"] == pytest.approx(2.8)
        assert r["z0"] == pytest.approx(0.0, abs=1e-6)

    def test_noisy_chain_merges(self):
        boxes = _wall_chain((2, 1), (2, 9), 5, jitter=0.02, seed=3)
        runs = ax.merge_wall_runs(boxes)
        assert len(runs) == 1
        assert runs[0]["length"] == pytest.approx(8.0, abs=0.2)

    def test_perpendicular_walls_stay_separate(self):
        boxes = np.concatenate([_wall_chain((0, 0), (6, 0), 3),
                                _wall_chain((0, 0.3), (0, 6), 3)])
        runs = ax.merge_wall_runs(boxes)
        assert len(runs) == 2

    def test_parallel_offset_walls_stay_separate(self):
        # same axis, 1 m apart laterally (two sides of a corridor)
        boxes = np.concatenate([_wall_chain((0, 0), (6, 0), 2),
                                _wall_chain((0, 1.0), (6, 1.0), 2)])
        runs = ax.merge_wall_runs(boxes)
        assert len(runs) == 2

    def test_big_gap_splits_runs(self):
        boxes = np.concatenate([_wall_chain((0, 0), (3, 0), 2),
                                _wall_chain((6, 0), (9, 0), 2)])
        runs = ax.merge_wall_runs(boxes)
        assert len(runs) == 2

    def test_opening_gap_bridged(self):
        # 0.4 m door gap between two collinear pieces -> one run
        boxes = np.concatenate([_wall_chain((0, 0), (3, 0), 2),
                                _wall_chain((3.4, 0), (6, 0), 2)])
        runs = ax.merge_wall_runs(boxes)
        assert len(runs) == 1

    def test_pi_symmetric_yaws_merge(self):
        a = _wall_chain((0, 0), (4, 0), 2)
        b = _wall_chain((8, 0), (4, 0), 2)   # opposite direction
        runs = ax.merge_wall_runs(np.concatenate([a, b]))
        assert len(runs) == 1
        assert runs[0]["length"] == pytest.approx(8.0, abs=1e-6)

    def test_empty(self):
        assert ax.merge_wall_runs(np.zeros((0, 7))) == []


class TestModel:
    def _dets(self):
        walls = _wall_chain((0, 0), (6, 0), 3)
        col = np.array([[8.0, 2.0, 1.4, 0.4, 0.4, 2.8, 0.1]])
        door = np.array([[3.0, 0.05, 1.0, 0.08, 0.9, 2.0,
                          np.pi / 2 + 0.3]])
        boxes = np.concatenate([walls, col, door])
        labels = np.array([0, 0, 0, 1, 2])
        scores = np.array([0.9, 0.8, 0.85, 0.95, 0.7])
        return {"box3d_lidar": boxes, "scores": scores,
                "label_preds": labels}

    def test_build_model(self):
        m = ax.build_asbuilt_model(self._dets(),
                                   ("wall", "column", "door"))
        assert m["stats"]["num_wall_runs"] == 1
        assert m["stats"]["num_columns"] == 1
        assert m["stats"]["num_doors"] == 1
        d = m["doors"][0]
        assert d["wall_index"] == 0
        assert d["along_wall_m"] == pytest.approx(3.0, abs=0.1)
        assert m["columns"][0]["center"] == [8.0, 2.0]

    def test_score_threshold_drops(self):
        dets = self._dets()
        dets["scores"] = np.array([0.9, 0.8, 0.85, 0.1, 0.7])
        m = ax.build_asbuilt_model(dets, ("wall", "column", "door"),
                                   score_threshold=0.3)
        assert m["stats"]["num_columns"] == 0

    def test_far_door_unattached(self):
        dets = self._dets()
        dets["box3d_lidar"][-1, :2] = [20.0, 20.0]
        m = ax.build_asbuilt_model(dets, ("wall", "column", "door"))
        assert m["doors"][0]["wall_index"] is None

    def test_json_svg_roundtrip(self, tmp_path):
        jp, sp = tmp_path / "m.json", tmp_path / "m.svg"
        m = ax.export_asbuilt(self._dets(), ("wall", "column", "door"),
                              json_path=str(jp), svg_path=str(sp))
        loaded = json.loads(jp.read_text())
        assert loaded["stats"] == m["stats"]
        svg = sp.read_text()
        assert svg.count("<line") == 1       # one wall run
        assert svg.count("<rect") == 2       # background + column
        assert svg.count("<circle") == 1     # door


class TestOnGeneratedScene:
    def test_gt_boxes_reconstruct(self):
        from automatic_as_built_reconstruction_tpu.data import building
        scene = building.generate_building_scene(7)
        names = np.asarray(scene["gt_names"])
        boxes = np.asarray(scene["gt_boxes"])
        class_names = ("wall", "column", "door")
        labels = np.array([class_names.index(n) for n in names])
        m = ax.build_asbuilt_model(
            {"box3d_lidar": boxes, "scores": np.ones(len(boxes)),
             "label_preds": labels}, class_names)
        n_wall_segs = int((names == "wall").sum())
        # merging must actually merge (walls come chopped ~1 m) but not
        # collapse everything into one blob
        assert 0 < m["stats"]["num_wall_runs"] < n_wall_segs
        assert m["stats"]["num_doors"] == int((names == "door").sum())
        svg = ax.render_svg(m)
        assert svg.count("<line") == m["stats"]["num_wall_runs"]
