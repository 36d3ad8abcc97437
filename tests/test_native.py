"""Native C++ host library vs NumPy oracles."""
import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu import native
from automatic_as_built_reconstruction_tpu.core import (
    box_ops, geometry, nms as nms_np, voxelize)

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="libabr_host.so not built")


class TestNativeVoxelize:
    @pytest.mark.parametrize("max_points,max_voxels", [(35, 20000), (3, 50)])
    def test_bit_identical(self, max_points, max_voxels):
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.uniform(-1, 71, (3000, 1)), rng.uniform(-41, 41, (3000, 1)),
            rng.uniform(-3.5, 1.5, (3000, 1)), rng.random((3000, 1))],
            axis=1).astype(np.float32)
        vs, pr = (0.2, 0.2, 0.4), (0, -40, -3, 70.4, 40, 1)
        v1, c1, n1 = voxelize.points_to_voxel(pts, vs, pr, max_points,
                                              max_voxels)
        v2, c2, n2 = native.points_to_voxel(pts, vs, pr, max_points,
                                            max_voxels)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(v1, v2)


class TestNativeGeometry:
    def test_points_in_rbbox(self):
        rng = np.random.default_rng(1)
        boxes = np.stack([
            rng.uniform(-5, 5, 8), rng.uniform(-5, 5, 8),
            rng.uniform(-2, 0, 8), rng.uniform(1, 3, 8),
            rng.uniform(1, 3, 8), rng.uniform(1, 2, 8),
            rng.uniform(-np.pi, np.pi, 8)], axis=1).astype(np.float32)
        pts = rng.uniform(-6, 6, (500, 4)).astype(np.float32)
        ref = box_ops.points_in_rbbox(pts, boxes)
        got = native.points_in_rbbox(pts, boxes)
        assert (got == ref).mean() > 0.999  # fp32-vs-fp64 boundary ties

    def test_collision(self):
        rng = np.random.default_rng(2)
        a = np.stack([rng.uniform(-4, 4, 12), rng.uniform(-4, 4, 12),
                      rng.uniform(0.5, 3, 12), rng.uniform(0.5, 3, 12),
                      rng.uniform(-np.pi, np.pi, 12)], 1).astype(np.float32)
        ref = geometry.box_collision_test(a.astype(np.float64),
                                          a.astype(np.float64))
        got = native.box_collision_test(a, a)
        assert (got == ref).mean() > 0.99

    def test_rotate_iou(self):
        rng = np.random.default_rng(3)
        a = np.stack([rng.uniform(-5, 5, 10), rng.uniform(-5, 5, 10),
                      rng.uniform(0.5, 4, 10), rng.uniform(0.5, 4, 10),
                      rng.uniform(-np.pi, np.pi, 10)], 1).astype(np.float32)
        b = np.stack([rng.uniform(-5, 5, 7), rng.uniform(-5, 5, 7),
                      rng.uniform(0.5, 4, 7), rng.uniform(0.5, 4, 7),
                      rng.uniform(-np.pi, np.pi, 7)], 1).astype(np.float32)
        ref = geometry.rotate_iou_matrix(a.astype(np.float64),
                                         b.astype(np.float64))
        got = native.rotate_iou(a, b)
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_rotate_nms(self):
        rng = np.random.default_rng(4)
        n = 50
        base = np.array([0.0, 0.0, 2.0, 4.0, 0.4])
        boxes = (base[None] + np.concatenate([
            rng.normal(0, 1.5, (n, 2)), rng.normal(0, 0.2, (n, 2)),
            rng.normal(0, 0.2, (n, 1))], 1)).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ref = nms_np.rotate_nms(boxes, scores, 0.3)
        got = native.rotate_nms(boxes, scores, 0.3)
        np.testing.assert_array_equal(got, ref)


class TestVoxelizeSortedMean:
    def test_matches_unfused_reference(self):
        from automatic_as_built_reconstruction_tpu import native
        from automatic_as_built_reconstruction_tpu.core import voxelize
        if not native.AVAILABLE:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.uniform(0, 16, (3000, 2)), rng.uniform(0, 4, (3000, 1)),
            rng.random((3000, 1))], axis=1).astype(np.float32)
        # V large enough that nothing overflows: FCFS and smallest-key
        # selection agree exactly on fitting scans (overflow selection is
        # covered by test_overflow_keeps_smallest_keys)
        vs, cr, T, V = (0.5, 0.5, 0.5), (0, 0, 0, 16, 16, 4), 5, 4096
        means, coords, counts, nv = native.voxelize_sorted_mean(
            pts, vs, cr, T, V)
        # reference: FCFS hard voxelize then capped mean, re-sorted by key
        voxels_r, coords_r, npts_r = voxelize.points_to_voxel(
            pts, vs, cr, max_points=T, max_voxels=V)
        # depth-minor (y, x, z) key — the canonical sparse order
        gz = 8
        keys = ((coords_r[:, 1].astype(np.int64) * 32 + coords_r[:, 2])
                * gz + coords_r[:, 0])
        order = np.argsort(keys, kind="stable")
        ref_means = (voxels_r.sum(1)
                     / np.maximum(npts_r, 1)[:, None])[order]
        assert nv == len(coords_r)
        np.testing.assert_array_equal(coords[:nv], coords_r[order])
        np.testing.assert_array_equal(counts[:nv], npts_r[order])
        np.testing.assert_allclose(means[:nv], ref_means, rtol=1e-5,
                                   atol=1e-5)
        # keys ascending, padding clean
        k2 = ((coords[:nv, 1].astype(np.int64) * 32 + coords[:nv, 2])
              * gz + coords[:nv, 0])
        assert (np.diff(k2) > 0).all()
        assert (coords[nv:] == -1).all() and (counts[nv:] == 0).all()

    def test_overflow_keeps_smallest_keys(self):
        """On voxel-count overflow the kernel keeps the SMALLEST-key
        voxels — the same subset the device twin
        (ops/voxelize_jax.voxelize first_appearance=False) selects, so
        host/device parity holds on overflow scans too (round-2 advisor
        finding)."""
        from automatic_as_built_reconstruction_tpu import native
        if not native.AVAILABLE:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(5)
        pts = np.concatenate([
            rng.uniform(0, 16, (4000, 2)), rng.uniform(0, 4, (4000, 1)),
            rng.random((4000, 1))], axis=1).astype(np.float32)
        vs, cr, T = (0.5, 0.5, 0.5), (0, 0, 0, 16, 16, 4), 5
        # full run to learn the true voxel count, then overflow it
        _, coords_full, counts_full, nv_full = native.voxelize_sorted_mean(
            pts, vs, cr, T, 4096)
        V = nv_full // 2
        means, coords, counts, nv = native.voxelize_sorted_mean(
            pts, vs, cr, T, V)
        assert nv == V
        # the kept voxels are exactly the V smallest keys of the full run
        np.testing.assert_array_equal(coords[:V], coords_full[:V])
        np.testing.assert_array_equal(counts[:V], counts_full[:V])
        # and the device twin picks the same subset
        jax = pytest.importorskip("jax")
        import jax.numpy as jnp
        from automatic_as_built_reconstruction_tpu.ops import voxelize_jax
        r = voxelize_jax.voxelize(
            jnp.asarray(pts), jnp.int32(len(pts)), voxel_size=vs,
            pc_range=cr, grid_size=(32, 32, 8), max_points=T,
            max_voxels=V, first_appearance=False)
        np.testing.assert_array_equal(np.asarray(r.coords), coords[:V])
