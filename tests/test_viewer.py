"""Viewer backend endpoint tests (in-process http server, no model)."""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.data import building
from automatic_as_built_reconstruction_tpu.viewer import server as viewer_srv


@pytest.fixture(scope="module")
def viewer():
    viewer_srv._STATE.clear()
    viewer_srv._STATE["dataset"] = building.BuildingDataset(num_synthetic=3)
    viewer_srv._STATE["classes"] = list(building.CLASSES)
    viewer_srv._STATE["predict"] = None
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), viewer_srv.Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


class TestViewerEndpoints:
    def test_index(self, viewer):
        status, body = _get(viewer + "/")
        assert status == 200
        assert b"<canvas" in body or b"canvas" in body

    def test_index_is_3d(self, viewer):
        """The frontend ships the 3D scene browser: perspective orbit
        camera, 8-corner/12-edge box wireframes, BEV toggle."""
        _, body = _get(viewer + "/")
        for marker in (b"boxCorners3d", b"EDGES", b"orbit", b"makeProject",
                       b"mode3d"):
            assert marker in body, marker

    def test_info(self, viewer):
        status, body = _get(viewer + "/api/info")
        info = json.loads(body)
        assert info["num_scenes"] == 3
        assert info["classes"] == list(building.CLASSES)
        assert info["has_model"] is False

    def test_scene(self, viewer):
        status, body = _get(viewer + "/api/scene?idx=1")
        scene = json.loads(body)
        assert len(scene["points"]) > 1000
        assert len(scene["points"][0]) == 3
        assert len(scene["gt_boxes"]) == len(scene["gt_names"])
        assert all(len(b) == 7 for b in scene["gt_boxes"])

    def test_detect_without_model(self, viewer):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(viewer + "/api/detect?idx=0")
        assert e.value.code == 400

    def test_bad_index(self, viewer):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(viewer + "/api/scene?idx=99")
        assert e.value.code == 500
        assert b"error" in e.value.read()
