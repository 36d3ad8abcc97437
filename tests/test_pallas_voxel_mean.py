"""Parity tests (interpret mode) for the fused Pallas voxelize+mean
kernel (north-star N3) against voxelize_jax + SimpleVoxel-style mean."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.ops import voxelize_jax  # noqa: E402
from automatic_as_built_reconstruction_tpu.ops.pallas import (  # noqa: E402
    voxel_mean)

KW = dict(voxel_size=(0.5, 0.5, 0.5), pc_range=(0, -4, -2, 8, 4, 2),
          grid_size=(16, 16, 8))


def scan(rng, n=600, p=800):
    pts = np.concatenate([
        rng.uniform(-1, 9, (p, 1)), rng.uniform(-5, 5, (p, 1)),
        rng.uniform(-3, 3, (p, 1)), rng.random((p, 1))],
        axis=1).astype(np.float32)
    return jnp.asarray(pts), jnp.int32(n)


class TestFusedVoxelMean:
    @pytest.mark.parametrize("first_appearance", [True, False])
    @pytest.mark.parametrize("T,V", [(5, 64), (8, 128), (1, 32)])
    def test_matches_unfused(self, first_appearance, T, V):
        rng = np.random.default_rng(T * 100 + V)
        pts, nv = scan(rng)
        ref = voxelize_jax.voxelize(
            pts, nv, max_points=T, max_voxels=V,
            first_appearance=first_appearance, **KW)
        ref_mean = (ref.voxels.sum(1)
                    / jnp.maximum(ref.num_points, 1)[:, None])
        out = voxel_mean.fused_voxelize_mean(
            pts, nv, max_points=T, max_voxels=V,
            first_appearance=first_appearance, interpret=True, **KW)
        np.testing.assert_array_equal(np.asarray(ref.coords),
                                      np.asarray(out.coords))
        np.testing.assert_array_equal(np.asarray(ref.num_points),
                                      np.asarray(out.num_points))
        assert int(ref.num_voxels) == int(out.num_voxels)
        np.testing.assert_allclose(np.asarray(ref_mean),
                                   np.asarray(out.features),
                                   rtol=1e-6, atol=1e-6)

    def test_empty_input(self):
        pts = jnp.zeros((32, 4), jnp.float32)
        out = voxel_mean.fused_voxelize_mean(
            pts, jnp.int32(0), max_points=4, max_voxels=16,
            interpret=True, **KW)
        assert int(out.num_voxels) == 1 or int(out.num_voxels) == 0
        # all-zero padded input collapses to at most the origin cell
        assert (np.asarray(out.num_points)[1:] == 0).all()


class TestPallasPathSelected:
    def test_key_order_monotone_starts(self):
        """Key-order slot numbering gives monotone slot starts (the
        Pallas windowed path's eligibility predicate)."""
        rng = np.random.default_rng(42)
        pts, nv = scan(rng)
        out = voxel_mean.fused_voxelize_mean(
            pts, nv, max_points=5, max_voxels=64,
            first_appearance=False, interpret=True, tile=8, window=128,
            **KW)
        ref = voxelize_jax.voxelize(
            pts, nv, max_points=5, max_voxels=64,
            first_appearance=False, **KW)
        ref_mean = (ref.voxels.sum(1)
                    / jnp.maximum(ref.num_points, 1)[:, None])
        np.testing.assert_allclose(np.asarray(ref_mean),
                                   np.asarray(out.features), rtol=1e-6,
                                   atol=1e-6)
