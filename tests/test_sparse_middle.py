"""SparseMiddle (SpMiddleFHD-equivalent) integration tests."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from automatic_as_built_reconstruction_tpu.models.middle import (  # noqa: E402
    MaskedBatchNorm, SparseMiddle)
from automatic_as_built_reconstruction_tpu.models.voxelnet import (  # noqa: E402
    VoxelNet, VoxelNetConfig, compute_loss)


def sparse_batch(rng, B=2, V=128, T=5, grid=(8, 16, 16)):
    D, H, W = grid
    voxels = np.zeros((B, V, T, 4), np.float32)
    coords = np.full((B, V, 3), -1, np.int32)
    nump = np.zeros((B, V), np.int32)
    for b in range(B):
        n = V // 2
        lin = rng.choice(D * H * W, n, replace=False)
        coords[b, :n] = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
        nump[b, :n] = rng.integers(1, T + 1, n)
        voxels[b, :n] = rng.normal(size=(n, T, 4))
    return jnp.asarray(voxels), jnp.asarray(nump), jnp.asarray(coords)


class TestSparseMiddleModule:
    def test_forward_shape(self):
        rng = np.random.default_rng(0)
        _, _, coords = sparse_batch(rng)
        feats = jnp.asarray(rng.normal(size=(2, 128, 4)).astype(np.float32))
        m = SparseMiddle(grid_dhw=(8, 16, 16), num_input_features=4,
                         num_filters=(8, 16), layers_per_block=(1, 1),
                         z_strides=(2, 2), xy_strides=(2, 2))
        variables = m.init(jax.random.key(0), feats, coords)
        out = m.apply(variables, feats, coords)
        # grid (8,16,16) -> /2 -> (4,8,8) -> /2 -> (2,4,4); BEV [B,4,4,2*16]
        assert out.shape == (2, 4, 4, 32)

    def test_masked_bn_ignores_padding(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
        mask = jnp.asarray(np.array([[True] * 5 + [False] * 5] * 2))
        # poison the padding rows: stats must not move
        x_poison = x.at[:, 5:].set(1e6)
        bn = MaskedBatchNorm()
        v = bn.init(jax.random.key(0), x, mask, train=True)
        y1, m1 = bn.apply(v, x, mask, train=True, mutable=["batch_stats"])
        y2, m2 = bn.apply(v, x_poison, mask, train=True,
                          mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1)[:, :5],
                                   np.asarray(y2)[:, :5], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(m1["batch_stats"]["mean"]),
            np.asarray(m2["batch_stats"]["mean"]), atol=1e-5)
        # padding rows output zero
        np.testing.assert_array_equal(np.asarray(y2)[:, 5:], 0)


class TestVoxelNetWithSparseMiddle:
    def test_forward_and_grad_step(self):
        rng = np.random.default_rng(2)
        cfg = VoxelNetConfig(
            num_class=1,
            vfe_name="SimpleVoxel",
            voxel_size=(1.0, 1.0, 0.5),
            pc_range=(0, -8, -2, 16, 8, 2),
            grid_size=(16, 16, 8),
            middle_name="SpMiddleFHD",
            middle_num_filters=(8, 16),
            middle_layers_per_block=(1, 1),
            middle_z_strides=(2, 2),
            middle_xy_strides=(2, 2),
            rpn_layer_nums=(1,), rpn_layer_strides=(1,),
            rpn_num_filters=(16,), rpn_upsample_strides=(1,),
            rpn_num_upsample_filters=(16,),
            num_anchor_per_loc=2,
            nms_pre_max_size=32, nms_post_max_size=8)
        voxels, nump, coords = sparse_batch(rng, grid=(8, 16, 16))
        model = VoxelNet(cfg=cfg)
        variables = model.init(jax.random.key(0), voxels, nump, coords,
                               train=True)
        preds = model.apply(variables, voxels, nump, coords, train=False)
        # grid 16x16 /4 = 4x4 BEV, rpn stride 1
        assert preds["box_preds"].shape == (2, 4, 4, 14)

        A = 4 * 4 * 2
        example = {
            "voxels": voxels, "num_points": nump, "coordinates": coords,
            "anchors": jnp.asarray(
                rng.normal(size=(2, A, 7)).astype(np.float32) + 2.0),
            "labels": jnp.asarray(rng.integers(0, 2, (2, A)), jnp.int32),
            "reg_targets": jnp.asarray(
                rng.normal(size=(2, A, 7)).astype(np.float32) * 0.1),
        }

        def loss_fn(params):
            p, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                voxels, nump, coords, train=True, mutable=["batch_stats"])
            loss, _ = compute_loss(p, example, cfg)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        gnorm = float(optax.global_norm(grads))
        assert np.isfinite(gnorm) and gnorm > 0


class TestDenseTail:
    """Hybrid dense-tail parity: running the last N blocks as masked
    dense convs must reproduce the fully-sparse outputs exactly (same
    params; capacities ample so the sparse path does not truncate)."""

    def _mods(self, n_tail, grid=(8, 16, 16), dtype=jnp.float32):
        # out_caps = full cell counts: the sparse path must not truncate
        # (the dense path has no capacity truncation to mirror)
        kw = dict(grid_dhw=grid, num_input_features=4,
                  num_filters=(8, 16), layers_per_block=(1, 2),
                  z_strides=(2, 2), xy_strides=(1, 2),
                  out_caps=(1024, 128))
        return (SparseMiddle(dtype=dtype, **kw),
                SparseMiddle(dense_tail_blocks=n_tail, dtype=dtype, **kw))

    @pytest.mark.parametrize("n_tail", [1, 2])
    def test_eval_parity(self, n_tail):
        rng = np.random.default_rng(7)
        _, _, coords = sparse_batch(rng)
        feats = jnp.asarray(rng.normal(size=(2, 128, 4)).astype(np.float32))
        sparse, hybrid = self._mods(n_tail)
        variables = sparse.init(jax.random.key(0), feats, coords)
        # identical param pytrees: the dense path must create the same
        # conv weights and BN variables as the sparse path
        vh = hybrid.init(jax.random.key(0), feats, coords)
        assert (jax.tree.structure(variables) == jax.tree.structure(vh))
        out_s = sparse.apply(variables, feats, coords)
        out_h = hybrid.apply(variables, feats, coords)
        assert out_s.shape == out_h.shape
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_h),
                                   atol=2e-4, rtol=1e-4)

    def test_train_stats_parity(self):
        rng = np.random.default_rng(8)
        _, _, coords = sparse_batch(rng)
        feats = jnp.asarray(rng.normal(size=(2, 128, 4)).astype(np.float32))
        sparse, hybrid = self._mods(1)
        variables = sparse.init(jax.random.key(0), feats, coords)
        out_s, ms = sparse.apply(variables, feats, coords, train=True,
                                 mutable=["batch_stats"])
        out_h, mh = hybrid.apply(variables, feats, coords, train=True,
                                 mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_h),
                                   atol=2e-4, rtol=1e-4)
        key = lambda kv: str(kv[0])
        for (ks, vs), (kh, vh) in zip(
                sorted(jax.tree_util.tree_leaves_with_path(ms), key=key),
                sorted(jax.tree_util.tree_leaves_with_path(mh), key=key)):
            np.testing.assert_allclose(np.asarray(vs), np.asarray(vh),
                                       atol=1e-4, err_msg=str(ks))

    def test_bf16_runs(self):
        # the serving path runs bf16: exercise dtype handling (the
        # reduce_window mask dilation once mixed f32/bf16)
        rng = np.random.default_rng(11)
        _, _, coords = sparse_batch(rng)
        feats = jnp.asarray(rng.normal(size=(2, 128, 4)).astype(np.float32))
        sparse, hybrid = self._mods(2, dtype=jnp.bfloat16)
        variables = sparse.init(jax.random.key(0), feats, coords)
        out_s = sparse.apply(variables, feats, coords)
        out_h = hybrid.apply(variables, feats, coords)
        np.testing.assert_allclose(np.asarray(out_s, np.float32),
                                   np.asarray(out_h, np.float32),
                                   atol=0.05, rtol=0.05)

    def test_grad_flows(self):
        rng = np.random.default_rng(9)
        _, _, coords = sparse_batch(rng)
        feats = jnp.asarray(rng.normal(size=(2, 128, 4)).astype(np.float32))
        _, hybrid = self._mods(2)
        variables = hybrid.init(jax.random.key(0), feats, coords)

        def loss_fn(params):
            out, _ = hybrid.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                feats, coords, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        gnorm = float(optax.global_norm(g))
        assert np.isfinite(gnorm) and gnorm > 0
