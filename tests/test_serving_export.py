"""AOT serving artifacts (utils/serving_export.py): export the full
serving program, reload from bytes, and match the live PodInference
output exactly; cross-platform (tpu+cpu) artifacts must serialize."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from automatic_as_built_reconstruction_tpu.models import voxelnet as vm
from automatic_as_built_reconstruction_tpu.parallel.inference import (
    PodInference)
from automatic_as_built_reconstruction_tpu.utils import serving_export as se


@pytest.fixture(scope="module")
def tiny_pod():
    from automatic_as_built_reconstruction_tpu.core import anchors as am

    cfg = vm.VoxelNetConfig(
        num_input_features=4, vfe_name="PillarFeatureNet",
        vfe_num_filters=(8,), middle_name="PointPillarsScatter",
        grid_size=(16, 16, 1), voxel_size=(0.5, 0.5, 4.0),
        pc_range=(0.0, -4.0, -3.0, 8.0, 4.0, 1.0),
        rpn_layer_nums=(1,), rpn_layer_strides=(1,),
        rpn_num_filters=(8,), rpn_upsample_strides=(1,),
        rpn_num_upsample_filters=(8,),
        num_class=1, num_anchor_per_loc=2, nms_pre_max_size=64,
        nms_post_max_size=8, nms_score_threshold=0.0)
    model = vm.VoxelNet(cfg=cfg)
    vox = jnp.zeros((1, 32, 4, 4))
    npts = jnp.ones((1, 32), jnp.int32)
    crd = jnp.zeros((1, 32, 3), jnp.int32)
    variables = model.init(jax.random.key(0), vox, npts, crd)
    gen = am.AnchorGeneratorRange(
        anchor_ranges=(0.0, -4.0, -1.0, 8.0, 4.0, -1.0),
        sizes=((0.5, 1.0, 1.5),), rotations=(0.0, np.pi / 2))
    anchors = gen.generate((1, 16, 16)).reshape(-1, 7).astype(np.float32)
    return PodInference(model, cfg, variables, anchors,
                        max_voxels=64, max_points_per_voxel=4)


def _scan(seed, b=2, n=300):
    r = np.random.default_rng(seed)
    pts = np.concatenate([
        r.uniform([0, -4, -2.5], [8, 4, 0.5], (b, n, 3)),
        r.random((b, n, 1))], -1).astype(np.float32)
    return pts, np.full((b,), n, np.int32)


def test_export_reload_exact(tiny_pod):
    pts, nv = _scan(0)
    blob = se.export_serving(tiny_pod, batch=2, max_points=300,
                             platforms=("cpu",))
    art = se.load_serving(blob)
    assert art.meta["batch"] == 2 and art.meta["voxelization"] == "hard"

    live = tiny_pod(pts, nv)
    out = art(pts, nv)
    # the artifact recompiles the same program, so float outputs can
    # differ at fusion-reassociation level — exact structure, tight tol
    for k in ("label_preds", "valid"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(live[k]), err_msg=k)
    for k in ("box3d_lidar", "scores"):
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(live[k]), atol=1e-5,
                                   rtol=1e-5, err_msg=k)


def test_cross_platform_artifact_serializes(tiny_pod):
    """tpu+cpu lowering from a CPU box: must serialize, reload, and run
    on the cpu leg."""
    blob = se.export_serving(tiny_pod, batch=2, max_points=300,
                             platforms=("tpu", "cpu"))
    art = se.load_serving(blob)
    assert art.meta["platforms"] == ["tpu", "cpu"]
    pts, nv = _scan(1)
    out = art(pts, nv)
    assert out["scores"].shape == (2, 8)


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        se.load_serving(b"NOTANARTIFACT")


def test_mesh_pod_rejected(tiny_pod):
    class FakeMeshPod:
        _mesh = object()
    with pytest.raises(ValueError):
        se.export_serving(FakeMeshPod(), 1, 10)


@pytest.fixture(scope="module")
def sparse_km_pod():
    """Tiny SECOND-style sparse middle in the r5 serving mode (key-match
    + grouped taps + dense tail) — the export surface users deploy."""
    from automatic_as_built_reconstruction_tpu.core import anchors as am

    cfg = vm.VoxelNetConfig(
        num_input_features=4, vfe_name="SimpleVoxel",
        vfe_num_filters=(4,), middle_name="SpMiddleFHDLite",
        grid_size=(16, 16, 8), voxel_size=(0.5, 0.5, 0.5),
        pc_range=(0.0, -4.0, -3.0, 8.0, 4.0, 1.0),
        middle_num_filters=(8, 8), middle_xy_strides=(2, 2),
        rpn_layer_nums=(1,), rpn_layer_strides=(1,),
        rpn_num_filters=(8,), rpn_upsample_strides=(1,),
        rpn_num_upsample_filters=(8,),
        sparse_use_pallas_gemm=True, sparse_keymatch=True,
        sparse_keymatch_group=True, sparse_dense_tail_blocks=1,
        sparse_pallas_window=128, sparse_out_caps=(128, 128),
        num_class=1, num_anchor_per_loc=2, nms_pre_max_size=64,
        nms_post_max_size=8, nms_score_threshold=0.0)
    model = vm.VoxelNet(cfg=cfg)
    vox = jnp.zeros((1, 32, 4, 4))
    npts = jnp.ones((1, 32), jnp.int32)
    crd = jnp.zeros((1, 32, 3), jnp.int32)
    variables = model.init(jax.random.key(0), vox, npts, crd)
    gen = am.AnchorGeneratorRange(
        anchor_ranges=(0.0, -4.0, -1.0, 8.0, 4.0, -1.0),
        sizes=((0.5, 1.0, 1.5),), rotations=(0.0, np.pi / 2))
    anchors = gen.generate((1, 8, 8)).reshape(-1, 7).astype(np.float32)
    return PodInference(model, cfg, variables, anchors,
                        max_voxels=64, max_points_per_voxel=4)


def test_export_reload_sparse_keymatch_group(sparse_km_pod):
    """The r5 headline serving mode exports and reloads exactly."""
    pts, nv = _scan(7)
    want = sparse_km_pod(pts, nv)
    blob = se.export_serving(sparse_km_pod, batch=2, max_points=300,
                             platforms=("cpu",))
    loaded = se.load_serving(blob)
    got = loaded(pts, nv)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)
