"""Metrics, config tooling, BEV rasterization."""
import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.core import bev_ops
from automatic_as_built_reconstruction_tpu.train.metrics import (
    PrecisionRecall, Scalar, precision_recall_counts)
from automatic_as_built_reconstruction_tpu.utils import config_tool


class TestMetrics:
    def test_precision_recall_perfect(self):
        import jax.numpy as jnp
        labels = jnp.asarray(np.array([[1, 0, 0, 1, -1]]))
        logits = jnp.asarray(
            np.array([[[9.0], [-9.0], [-9.0], [9.0], [9.0]]]))
        pr = PrecisionRecall(thresholds=(0.5,))
        pr.update(precision_recall_counts(logits, labels, (0.5,)))
        v = pr.value
        assert v["precision"][0] == 1.0 and v["recall"][0] == 1.0
        assert "P=1.000" in pr.summary()

    def test_precision_recall_fp(self):
        import jax.numpy as jnp
        labels = jnp.asarray(np.array([[1, 0, 0, 0]]))
        logits = jnp.asarray(np.array([[[9.0], [9.0], [-9.0], [-9.0]]]))
        pr = PrecisionRecall(thresholds=(0.5,))
        pr.update(precision_recall_counts(logits, labels, (0.5,)))
        v = pr.value
        assert v["precision"][0] == 0.5 and v["recall"][0] == 1.0

    def test_scalar(self):
        s = Scalar()
        for v in (1.0, 2.0, 3.0):
            s.update(v)
        assert s.value == 2.0
        s.clear()
        assert s.value == 0.0


class TestConfigTool:
    def test_change_detection_range(self, tmp_path):
        import pathlib
        cfg_dir = (pathlib.Path(__file__).parent.parent
                   / "automatic_as_built_reconstruction_tpu" / "configs")
        cfg = config_tool.read_config(
            cfg_dir / "pointpillars" / "car" / "xyres_16.config")
        m = cfg.model.second
        config_tool.change_detection_range(m, [-10, -20, 10, 20])
        assert list(m.voxel_generator.point_cloud_range)[:2] == [-10, -20]
        ar = m.target_assigner.class_settings[0].anchor_generator_stride
        assert ar.offsets[0] == pytest.approx(-10 + 0.16)
        config_tool.save_config(cfg, tmp_path / "x.config")
        cfg2 = config_tool.read_config(tmp_path / "x.config")
        assert cfg2 == cfg
        assert config_tool.get_downsample_factor(m) == 2


class TestBevOps:
    def test_points_to_bev(self):
        pts = np.array([
            [0.5, 0.5, 0.25, 0.8],
            [0.5, 0.5, 0.75, 0.3],   # same cell, upper slab
            [2.5, 1.5, 0.25, 0.1],
        ], np.float32)
        bev = bev_ops.points_to_bev(pts, (1, 1, 0.5), (0, 0, 0, 4, 2, 1))
        assert bev.shape == (4, 2, 4)  # 2 slabs + density + intensity
        assert bev[0, 0, 0] > 0       # slab 0 height at (y=0, x=0)
        assert bev[1, 0, 0] > 0       # slab 1
        assert bev[2, 0, 0] > bev[2, 1, 2]  # density 2 vs 1
        assert bev[3, 0, 0] == pytest.approx(0.8)


class TestProgress:
    def test_progress_bar_passthrough(self):
        import io
        from automatic_as_built_reconstruction_tpu.utils.progress import (
            progress_bar)
        buf = io.StringIO()
        out = list(progress_bar(range(5), desc="t ", file=buf))
        assert out == [0, 1, 2, 3, 4]
        assert "5/5" in buf.getvalue()

    def test_stage_timers(self):
        import time as _t
        from automatic_as_built_reconstruction_tpu.utils.progress import (
            StageTimers)
        st = StageTimers()
        for _ in range(3):
            with st.time("stage_a"):
                _t.sleep(0.002)
        with st.time("stage_b"):
            _t.sleep(0.001)
        ms = st.means_ms()
        assert ms["stage_a"] >= 1.5 and ms["stage_b"] >= 0.5
        assert "stage_a" in st.report()
        st.clear()
        assert st.means_ms() == {}
