"""Multi-device (8 virtual CPU) sharding tests: DP train step parity,
batched pod inference."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from automatic_as_built_reconstruction_tpu.parallel import (  # noqa: E402
    PodInference, data_parallel_mesh, replicate, shard_batch)
from automatic_as_built_reconstruction_tpu.models.voxelnet import (  # noqa: E402
    VoxelNet, VoxelNetConfig, compute_loss)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def tiny_cfg():
    return VoxelNetConfig(
        num_class=1, vfe_name="PillarFeatureNet", vfe_num_filters=(8,),
        voxel_size=(1.0, 1.0, 4.0), pc_range=(0, -8, -3, 16, 8, 1),
        grid_size=(16, 16, 1),
        rpn_layer_nums=(1,), rpn_layer_strides=(2,),
        rpn_num_filters=(8,), rpn_upsample_strides=(1,),
        rpn_num_upsample_filters=(8,), num_anchor_per_loc=2,
        nms_pre_max_size=32, nms_post_max_size=4, nms_score_threshold=0.0)


def make_batch(rng, cfg, B, V=64, T=4):
    gx, gy, _ = cfg.grid_size
    voxels = np.zeros((B, V, T, 4), np.float32)
    coords = np.full((B, V, 3), -1, np.int32)
    nump = np.zeros((B, V), np.int32)
    for b in range(B):
        n = V // 2
        coords[b, :n, 1] = rng.integers(0, gy, n)
        coords[b, :n, 2] = rng.integers(0, gx, n)
        coords[b, :n, 0] = 0
        nump[b, :n] = rng.integers(1, T + 1, n)
        voxels[b, :n] = rng.normal(size=(n, T, 4))
    A = 8 * 8 * 2
    return {
        "voxels": voxels, "num_points": nump, "coordinates": coords,
        "anchors": np.broadcast_to(
            rng.normal(size=(A, 7)).astype(np.float32) + 2.0,
            (B, A, 7)).copy(),
        "labels": rng.integers(0, 2, (B, A)).astype(np.int32),
        "reg_targets": (rng.normal(size=(B, A, 7)) * 0.1).astype(np.float32),
    }


class TestShardedTrainStep:
    def test_dp_matches_single_device(self):
        """Grads/updated params on an 8-way DP mesh == single-device."""
        rng = np.random.default_rng(0)
        cfg = tiny_cfg()
        model = VoxelNet(cfg=cfg)
        batch = make_batch(rng, cfg, B=8)
        variables = model.init(
            jax.random.key(0), jnp.asarray(batch["voxels"][:1]),
            jnp.asarray(batch["num_points"][:1]),
            jnp.asarray(batch["coordinates"][:1]), train=True)
        tx = optax.adam(1e-3)

        def train_step(params, batch_stats, opt_state, example):
            def loss_fn(p):
                preds, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    example["voxels"], example["num_points"],
                    example["coordinates"], train=True,
                    mutable=["batch_stats"])
                loss, _ = compute_loss(preds, example, cfg)
                return loss, mut["batch_stats"]

            (loss, bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), loss

        opt_state = tx.init(variables["params"])

        # single device
        ex1 = {k: jnp.asarray(v) for k, v in batch.items()}
        p1, l1 = jax.jit(train_step)(variables["params"],
                                     variables["batch_stats"], opt_state, ex1)

        # 8-way DP
        mesh = data_parallel_mesh(8)
        ex8 = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
        params_r = replicate(variables["params"], mesh)
        bs_r = replicate(variables["batch_stats"], mesh)
        opt_r = replicate(opt_state, mesh)
        p8, l8 = jax.jit(train_step)(params_r, bs_r, opt_r, ex8)

        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
        flat1 = jax.tree.leaves(p1)
        flat8 = jax.tree.leaves(p8)
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


class TestPodInference:
    def test_sharded_matches_unsharded(self):
        rng = np.random.default_rng(1)
        cfg = tiny_cfg()
        model = VoxelNet(cfg=cfg)
        B, Pn = 8, 2000
        pts = np.concatenate([
            rng.uniform(0, 16, (B, Pn, 1)), rng.uniform(-8, 8, (B, Pn, 1)),
            rng.uniform(-2, 0, (B, Pn, 1)), rng.random((B, Pn, 1))],
            axis=-1).astype(np.float32)
        nv = np.full((B,), Pn, np.int32)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 8, 4, 4)),
                               jnp.zeros((1, 8), jnp.int32),
                               jnp.full((1, 8, 3), -1, jnp.int32))
        anchors = (rng.normal(size=(8 * 8 * 2, 7)) + 2).astype(np.float32)

        single = PodInference(model, cfg, variables, anchors, mesh=None,
                              max_voxels=256, max_points_per_voxel=8)
        out1 = single(pts, nv)
        mesh = data_parallel_mesh(8)
        pod = PodInference(model, cfg, variables, anchors, mesh=mesh,
                           max_voxels=256, max_points_per_voxel=8)
        out8 = pod(pts, nv)
        np.testing.assert_allclose(out1["scores"], out8["scores"],
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(out1["valid"], out8["valid"])
        dets = pod.detections_list(out8)
        assert len(dets) == B


class TestShardedVoxelize:
    def test_matches_single_device(self):
        from automatic_as_built_reconstruction_tpu.parallel import (
            sharded_voxelize as sv)
        rng = np.random.default_rng(3)
        D, Pl = 8, 4000
        pts = np.concatenate([
            rng.uniform(0, 16, (D * Pl, 1)), rng.uniform(0, 16, (D * Pl, 1)),
            rng.uniform(0, 3, (D * Pl, 1)), rng.random((D * Pl, 1))],
            axis=1).astype(np.float32)
        nv = np.full((D,), Pl, np.int32)
        nv[3] = 1000  # one shard partially padded
        mesh = data_parallel_mesh(8)
        fn = sv.make_sharded_mean_canvas(
            mesh, voxel_size=(0.25, 0.25, 4.0), pc_range=(0, 0, 0, 16, 16, 4),
            grid_hw=(64, 64))
        mean8, cnt8 = fn(jnp.asarray(pts), jnp.asarray(nv))
        # oracle: mask each shard's tail, single device
        mask = np.zeros(D * Pl, bool)
        for d in range(D):
            mask[d * Pl : d * Pl + nv[d]] = True
        mean1, cnt1 = sv.single_device_mean_canvas(
            jnp.asarray(pts[mask]), jnp.int32(mask.sum()),
            voxel_size=(0.25, 0.25, 4.0), pc_range=(0, 0, 0, 16, 16, 4),
            grid_hw=(64, 64))
        np.testing.assert_array_equal(np.asarray(cnt8), np.asarray(cnt1))
        np.testing.assert_allclose(np.asarray(mean8), np.asarray(mean1),
                                   rtol=1e-5, atol=1e-6)
        assert float(cnt8.sum()) > 0


class TestDynamicPodInference:
    def test_dynamic_voxelization_mode(self):
        rng = np.random.default_rng(5)
        cfg = VoxelNetConfig(
            num_class=1, vfe_name="SimpleVoxel",
            voxel_size=(1.0, 1.0, 4.0), pc_range=(0, -8, -3, 16, 8, 1),
            grid_size=(16, 16, 1),
            rpn_layer_nums=(1,), rpn_layer_strides=(2,),
            rpn_num_filters=(8,), rpn_upsample_strides=(1,),
            rpn_num_upsample_filters=(8,), num_anchor_per_loc=2,
            nms_pre_max_size=32, nms_post_max_size=4,
            nms_score_threshold=0.0)
        model = VoxelNet(cfg=cfg)
        B, Pn = 8, 3000
        pts = np.concatenate([
            rng.uniform(0, 16, (B, Pn, 1)), rng.uniform(-8, 8, (B, Pn, 1)),
            rng.uniform(-2, 0, (B, Pn, 1)), rng.random((B, Pn, 1))],
            axis=-1).astype(np.float32)
        nv = np.full((B,), Pn, np.int32)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 8, 1, 4)),
                               jnp.zeros((1, 8), jnp.int32),
                               jnp.full((1, 8, 3), -1, jnp.int32))
        anchors = (rng.normal(size=(8 * 8 * 2, 7)) + 2).astype(np.float32)
        mesh = data_parallel_mesh(8)
        pod = PodInference(model, cfg, variables, anchors, mesh=mesh,
                           max_voxels=256, voxelization="dynamic")
        out = pod(pts, nv)
        assert out["box3d_lidar"].shape[0] == B
        assert np.isfinite(out["scores"]).all()
        # dynamic mode uses every in-range point (no per-voxel cap):
        # denser scan than 256 voxels x 8 points could hold
        assert out["valid"].any()


class TestDistributedHelpers:
    def test_single_host_noop(self, monkeypatch):
        from automatic_as_built_reconstruction_tpu.parallel import (
            distributed)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert distributed.multi_host_env() is None
        assert distributed.ensure_initialized() is False

    def test_env_detection(self, monkeypatch):
        from automatic_as_built_reconstruction_tpu.parallel import (
            distributed)
        monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
        monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
        monkeypatch.setenv("JAX_PROCESS_ID", "2")
        env = distributed.multi_host_env()
        assert env == {"coordinator_address": "10.0.0.1:1234",
                       "num_processes": 4, "process_id": 2}

    def test_local_batch_slice(self):
        from automatic_as_built_reconstruction_tpu.parallel import (
            distributed)
        s = distributed.local_batch_slice(8)   # single process -> all
        assert (s.start, s.stop) == (0, 8)


class TestPodInferenceSparse:
    def test_sparse_middle_device_only(self):
        """SECOND-style sparse model served fully on device: on-device
        voxelization + LUT rulebook construction + sparse middle + NMS,
        batch-sharded over the mesh — no host prep stage at all."""
        rng = np.random.default_rng(11)
        cfg = VoxelNetConfig(
            num_class=1, vfe_name="SimpleVoxel",
            voxel_size=(1.0, 1.0, 0.5), pc_range=(0, -8, -2, 16, 8, 2),
            grid_size=(16, 16, 8),
            middle_name="SpMiddleFHD",
            middle_num_filters=(8, 16), middle_layers_per_block=(1, 1),
            middle_z_strides=(2, 2), middle_xy_strides=(2, 2),
            rpn_layer_nums=(1,), rpn_layer_strides=(1,),
            rpn_num_filters=(16,), rpn_upsample_strides=(1,),
            rpn_num_upsample_filters=(16,), num_anchor_per_loc=2,
            nms_pre_max_size=32, nms_post_max_size=4,
            nms_score_threshold=0.0)
        model = VoxelNet(cfg=cfg)
        B, Pn = 8, 2000
        pts = np.concatenate([
            rng.uniform(0, 16, (B, Pn, 1)), rng.uniform(-8, 8, (B, Pn, 1)),
            rng.uniform(-2, 2, (B, Pn, 1)), rng.random((B, Pn, 1))],
            axis=-1).astype(np.float32)
        nv = np.full((B,), Pn, np.int32)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, 16, 4, 4)),
                               jnp.zeros((1, 16), jnp.int32),
                               jnp.full((1, 16, 3), -1, jnp.int32))
        anchors = (rng.normal(size=(4 * 4 * 2, 7)) + 2).astype(np.float32)
        mesh = data_parallel_mesh(8)
        pod = PodInference(model, cfg, variables, anchors, mesh=mesh,
                           max_voxels=512, max_points_per_voxel=4)
        out = pod(pts, nv)
        assert out["box3d_lidar"].shape[0] == B
        assert np.isfinite(out["scores"]).all()
