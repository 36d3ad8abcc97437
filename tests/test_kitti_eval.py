"""Exact KITTI devkit evaluation: hand-traced scenarios + C++/Python twin
cross-checks.

Every expected number below is hand-traced through the devkit algorithm
(getThresholds -> per-threshold computeStatistics -> right-max precision ->
11/40-point interpolation), not through our implementation — so these are
genuine oracle tests of devkit exactness.
"""
import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu import native
from automatic_as_built_reconstruction_tpu.utils import eval as ev


def make_gt(names, heights=None, occ=None, trunc=None, locs=None, dims=None,
            rys=None):
    n = len(names)
    heights = np.asarray(heights if heights is not None else [50.0] * n)
    bbox = np.stack([np.full(n, 100.0), np.full(n, 100.0),
                     100.0 + np.arange(n) * 200.0 % 900 + 60,
                     100.0 + heights], 1)
    # non-overlapping 2D boxes: offset x by index
    bbox[:, 0] = 100.0 + np.arange(n) * 200.0
    bbox[:, 2] = bbox[:, 0] + 60.0
    return {
        "name": np.asarray(names),
        "bbox": bbox,
        "occluded": np.asarray(occ if occ is not None else [0] * n),
        "truncated": np.asarray(trunc if trunc is not None
                                else [0.0] * n),
        "location": np.asarray(locs if locs is not None
                               else np.zeros((n, 3))),
        "dimensions": np.asarray(dims if dims is not None
                                 else np.ones((n, 3))),
        "rotation_y": np.asarray(rys if rys is not None else np.zeros(n)),
        "alpha": np.zeros(n),
    }


def make_dt(names, scores, gt_like=None, idx=None, heights=None):
    """Detections; when gt_like+idx given, det i copies gt box idx[i]
    (a perfect match); otherwise far-away boxes (guaranteed no overlap)."""
    n = len(names)
    heights = np.asarray(heights if heights is not None else [50.0] * n)
    bbox = np.zeros((n, 4))
    for i in range(n):
        if gt_like is not None and idx is not None and idx[i] >= 0:
            bbox[i] = gt_like["bbox"][idx[i]]
        else:
            bbox[i] = [5000 + i * 200, 100, 5060 + i * 200,
                       100 + heights[i]]
    return {
        "name": np.asarray(names),
        "bbox": bbox,
        "location": np.zeros((n, 3)),
        "dimensions": np.ones((n, 3)),
        "rotation_y": np.zeros(n),
        "score": np.asarray(scores, np.float64),
        "alpha": np.zeros(n),
    }


class TestGetThresholds:
    def test_single_detection_single_gt(self):
        # trace: i=0 is last -> r_recall=l_recall -> always appended
        t = ev.get_thresholds(np.array([0.7]), 1)
        np.testing.assert_array_equal(t, [np.float32(0.7)])

    def test_four_perfect(self):
        # num_gt=4: every det crosses a 0.25 recall step -> all appended
        t = ev.get_thresholds(np.array([4.0, 3.0, 2.0, 1.0]), 4)
        np.testing.assert_array_equal(t, [4.0, 3.0, 2.0, 1.0])

    def test_dense_scores_cap_41(self):
        t = ev.get_thresholds(np.linspace(1, 0, 200), 200)
        assert 39 <= len(t) <= 41
        assert (np.diff(t) <= 0).all()


class TestScenarios:
    def test_two_perfect_detections(self):
        """2 gts, 2 perfect dets -> thresholds [0.9, 0.8], precision
        [1, 1, 0, ...]; AP11 = prec[0]/11 = 9.0909, AP40 = prec[1]/40."""
        gt = make_gt(["Car", "Car"])
        dt = make_dt(["Car", "Car"], [0.9, 0.8], gt, [0, 1])
        r = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7)
        assert r["num_valid_gt"] == 2
        assert r["ap"] == pytest.approx(100.0 / 11, abs=1e-9)
        assert r["ap_R40"] == pytest.approx(100.0 / 40, abs=1e-9)

    def test_dense_perfect_detections_ap_100(self):
        """50 perfect dets on 50 gts -> all 41 recall slots filled at
        precision 1 -> AP = 100 exactly (both interpolations)."""
        gt = make_gt(["Car"] * 50)
        dt = make_dt(["Car"] * 50, np.linspace(1.0, 0.5, 50), gt,
                     np.arange(50))
        r = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7)
        assert len(r["thresholds"]) == 41
        assert r["ap"] == pytest.approx(100.0, abs=1e-9)
        assert r["ap_R40"] == pytest.approx(100.0, abs=1e-9)

    def test_unmatched_det_is_fp(self):
        """1 gt + its perfect det (score .9) + 1 far det (score .8):
        thresholds=[0.9]; at t=0.9 the far det is below cutoff -> fp=0,
        precision[0]=1 -> same AP as without the FP...
        ...but with FP score .95 ABOVE the TP: at t=0.9 fp=1 ->
        precision[0]=0.5 -> AP11 = 50/11."""
        gt = make_gt(["Car"])
        dt = make_dt(["Car", "Car"], [0.9, 0.95], gt, [0, -1])
        r = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7)
        assert r["ap"] == pytest.approx(50.0 / 11, abs=1e-9)

    def test_similar_class_absorbs_match(self):
        """A det matching a Van gt (similar to Car) is assigned-ignored:
        neither TP nor FP.  AP11 = 100/11 (one threshold at the real TP,
        fp=0).  Without the Van gt the same det is a FP -> 50/11."""
        gt_with_van = make_gt(["Car", "Van"])
        dt = make_dt(["Car", "Car"], [0.9, 0.95], gt_with_van, [0, 1])
        r = ev.eval_class([gt_with_van], [dt], "Car", 0, 0, 0.7)
        assert r["num_valid_gt"] == 1
        assert r["ap"] == pytest.approx(100.0 / 11, abs=1e-9)

        gt_without = make_gt(["Car"])
        dt2 = make_dt(["Car", "Car"], [0.9, 0.95], gt_without, [0, -1])
        r2 = ev.eval_class([gt_without], [dt2], "Car", 0, 0, 0.7)
        assert r2["ap"] == pytest.approx(50.0 / 11, abs=1e-9)

    def test_dontcare_absorbs_fp(self):
        """An unmatched det inside a DontCare region is removed from FP
        (2D criterion-0 overlap > min_overlap)."""
        gt = make_gt(["Car", "DontCare"])
        # det 1 sits exactly on the DontCare bbox -> inter/det_area = 1
        dt = make_dt(["Car", "Car"], [0.9, 0.95], gt, [0, 1])
        r = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7)
        assert r["num_valid_gt"] == 1
        assert r["ap"] == pytest.approx(100.0 / 11, abs=1e-9)

    def test_occluded_gt_ignored_for_easy(self):
        """occlusion=2 gt: ignored at easy (diff 0), counted at hard.
        The det matching it: assigned-ignored at easy (no fp), TP at
        hard."""
        gt = make_gt(["Car", "Car"], occ=[0, 2])
        dt = make_dt(["Car", "Car"], [0.9, 0.8], gt, [0, 1])
        r_easy = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7)
        assert r_easy["num_valid_gt"] == 1
        assert r_easy["ap"] == pytest.approx(100.0 / 11, abs=1e-9)
        r_hard = ev.eval_class([gt], [dt], "Car", 2, 0, 0.7)
        assert r_hard["num_valid_gt"] == 2
        assert r_hard["ap"] == pytest.approx(100.0 / 11, abs=1e-9)

    def test_gt_height_gate_uses_lte(self):
        """Devkit gt gate: height <= MIN_HEIGHT ignores; det gate uses <.
        A gt of exactly 40px is ignored at easy; at moderate (25px) it
        counts."""
        gt = make_gt(["Car"], heights=[40.0])
        dt = make_dt(["Car"], [0.9], gt, [0])
        r = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7)
        assert r["num_valid_gt"] == 0 and r["ap"] == 0.0
        r_mod = ev.eval_class([gt], [dt], "Car", 1, 0, 0.7)
        assert r_mod["num_valid_gt"] == 1
        assert r_mod["ap"] == pytest.approx(100.0 / 11, abs=1e-9)

    def test_small_det_ignored_not_fp(self):
        """An unmatched det below MIN_HEIGHT is ignored, not FP."""
        gt = make_gt(["Car"])
        dt = make_dt(["Car", "Car"], [0.9, 0.95], gt, [0, -1],
                     heights=[50.0, 30.0])  # 30 < 40 (easy)
        r = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7)
        assert r["ap"] == pytest.approx(100.0 / 11, abs=1e-9)

    def test_bev_and_3d_metrics(self):
        """Perfect camera-frame boxes give AP equal to the bbox metric."""
        locs = np.array([[0.0, 1.5, 10.0], [5.0, 1.5, 20.0]])
        dims = np.array([[3.9, 1.5, 1.6]] * 2)   # (l, h, w)
        rys = np.array([0.3, -1.1])
        gt = make_gt(["Car", "Car"], locs=locs, dims=dims, rys=rys)
        dt = make_dt(["Car", "Car"], [0.9, 0.8], gt, [0, 1])
        dt["location"], dt["dimensions"], dt["rotation_y"] = locs, dims, rys
        for metric in (1, 2):
            r = ev.eval_class([gt], [dt], "Car", 0, metric, 0.7)
            assert r["ap"] == pytest.approx(100.0 / 11, abs=1e-6), metric

    def test_aos(self):
        """AOS: perfect alpha -> aos == precision; opposite alpha -> 0."""
        gt = make_gt(["Car"] * 50)
        dt = make_dt(["Car"] * 50, np.linspace(1.0, 0.5, 50), gt,
                     np.arange(50))
        r = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7, compute_aos=True)
        assert r["aos_ap"] == pytest.approx(r["ap"], abs=1e-9)
        dt["alpha"] = np.full(50, np.pi)
        r2 = ev.eval_class([gt], [dt], "Car", 0, 0, 0.7, compute_aos=True)
        assert r2["aos_ap"] == pytest.approx(0.0, abs=1e-6)


class TestNativePythonTwin:
    @pytest.mark.skipif(not native.AVAILABLE, reason="no native lib")
    def test_fuzz_native_matches_python(self, monkeypatch):
        rng = np.random.default_rng(0)
        classes = ["Car", "Van", "Pedestrian", "DontCare", "Cyclist"]
        gt_annos, dt_annos = [], []
        for _ in range(12):
            G, D = rng.integers(0, 8), rng.integers(0, 12)
            gt = make_gt(rng.choice(classes, G),
                         heights=rng.uniform(10, 80, G),
                         occ=rng.integers(0, 4, G),
                         trunc=rng.uniform(0, 0.8, G))
            idx = rng.integers(-1, max(G, 1), D)
            if G == 0:
                idx = np.full(D, -1)
            dt = make_dt(rng.choice(["Car", "Pedestrian"], D),
                         rng.random(D), gt, idx,
                         heights=rng.uniform(10, 80, D))
            gt_annos.append(gt)
            dt_annos.append(dt)

        results_native = [
            ev.eval_class(gt_annos, dt_annos, cls, d, 0, 0.5,
                          compute_aos=True)
            for cls in ("Car", "Pedestrian") for d in range(3)]
        monkeypatch.setattr(native, "AVAILABLE", False)
        results_py = [
            ev.eval_class(gt_annos, dt_annos, cls, d, 0, 0.5,
                          compute_aos=True)
            for cls in ("Car", "Pedestrian") for d in range(3)]
        for rn, rp in zip(results_native, results_py):
            np.testing.assert_allclose(rn["precision"], rp["precision"],
                                       atol=1e-6)
            np.testing.assert_allclose(rn["aos"], rp["aos"], atol=1e-6)
            assert rn["num_valid_gt"] == rp["num_valid_gt"]
            np.testing.assert_allclose(rn["thresholds"], rp["thresholds"])


class TestOfficialResult:
    def test_table_and_keys(self):
        gt = make_gt(["Car"] * 50)
        dt = make_dt(["Car"] * 50, np.linspace(1.0, 0.5, 50), gt,
                     np.arange(50))
        res = ev.get_official_eval_result([gt], [dt], ["Car"])
        assert res["Car.bbox.easy"] == pytest.approx(100.0, abs=1e-6)
        assert res["Car.bbox.easy.R40"] == pytest.approx(100.0, abs=1e-6)
        assert "Car AP@0.70, 0.70, 0.70" in res["result_str"]
        assert "aos" in res["result_str"]
