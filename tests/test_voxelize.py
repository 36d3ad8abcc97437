import numpy as np
import pytest

from automatic_as_built_reconstruction_tpu.core import voxelize


def make_points(rng, n=2000, c=4):
    pts = np.concatenate([
        rng.uniform(-1, 71, size=(n, 1)),
        rng.uniform(-41, 41, size=(n, 1)),
        rng.uniform(-3.5, 1.5, size=(n, 1)),
        rng.uniform(0, 1, size=(n, c - 3)),
    ], axis=1).astype(np.float32)
    return pts


VOXEL_SIZE = (0.2, 0.2, 0.4)
RANGE = (0, -40, -3, 70.4, 40, 1)


class TestFastMatchesLoop:
    @pytest.mark.parametrize("max_points,max_voxels", [
        (35, 20000), (5, 20000), (35, 100), (3, 50), (1, 10),
    ])
    def test_parity(self, max_points, max_voxels):
        rng = np.random.default_rng(42)
        pts = make_points(rng)
        v1, c1, n1 = voxelize.points_to_voxel(
            pts, VOXEL_SIZE, RANGE, max_points, max_voxels)
        v2, c2, n2 = voxelize.points_to_voxel_fast(
            pts, VOXEL_SIZE, RANGE, max_points, max_voxels)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(n1, n2)
        np.testing.assert_array_equal(v1, v2)

    def test_duplicate_points(self):
        pts = np.zeros((50, 4), np.float32)
        pts[:, 0] = 1.0; pts[:, 1] = 0.0; pts[:, 2] = 0.0
        pts[:, 3] = np.arange(50)
        v1, c1, n1 = voxelize.points_to_voxel(pts, VOXEL_SIZE, RANGE, 10, 10)
        v2, c2, n2 = voxelize.points_to_voxel_fast(pts, VOXEL_SIZE, RANGE, 10, 10)
        assert n1[0] == 10
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(n1, n2)
        # FCFS: the first 10 intensities kept, in arrival order
        np.testing.assert_allclose(v1[0, :, 3], np.arange(10))

    def test_out_of_range_dropped(self):
        pts = np.array([[100.0, 0, 0, 1], [1.0, 0, 0, 2], [-5, 0, 0, 3]],
                       np.float32)
        v, c, n = voxelize.points_to_voxel_fast(pts, VOXEL_SIZE, RANGE, 5, 5)
        assert len(v) == 1 and n[0] == 1
        np.testing.assert_allclose(v[0, 0], [1.0, 0, 0, 2])

    def test_empty(self):
        pts = np.zeros((0, 4), np.float32)
        v, c, n = voxelize.points_to_voxel_fast(pts, VOXEL_SIZE, RANGE, 5, 5)
        assert v.shape == (0, 5, 4)

    def test_coords_are_zyx_in_bounds(self):
        rng = np.random.default_rng(7)
        pts = make_points(rng, 500)
        _, c, _ = voxelize.points_to_voxel_fast(pts, VOXEL_SIZE, RANGE, 5, 1000)
        gen = voxelize.VoxelGenerator(VOXEL_SIZE, RANGE, 5, 1000)
        gx, gy, gz = gen.grid_size
        assert (c[:, 0] < gz).all() and (c[:, 1] < gy).all() and (c[:, 2] < gx).all()
        assert (c >= 0).all()

    def test_voxel_order_is_first_appearance(self):
        # craft points hitting cells B, A, B, C in that order
        pts = np.array([
            [10.0, 0.0, 0.0, 0],   # cell B
            [20.0, 0.0, 0.0, 1],   # cell A
            [10.05, 0.0, 0.0, 2],  # cell B again
            [30.0, 0.0, 0.0, 3],   # cell C
        ], np.float32)
        v, c, n = voxelize.points_to_voxel_fast(pts, VOXEL_SIZE, RANGE, 5, 10)
        assert len(v) == 3
        np.testing.assert_allclose(v[0, 0, 0], 10.0)
        np.testing.assert_allclose(v[0, 1, 0], 10.05)
        np.testing.assert_allclose(v[1, 0, 0], 20.0)
        np.testing.assert_allclose(v[2, 0, 0], 30.0)
        assert n.tolist() == [2, 1, 1]
