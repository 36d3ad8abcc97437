"""Interpret-mode parity for the Pallas pairwise rotated-IoU kernel
against the XLA SoA clip (which is itself oracle-tested)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.ops import rotated_iou  # noqa: E402
from automatic_as_built_reconstruction_tpu.ops.pallas import (  # noqa: E402
    rotated_iou_pallas as rip)


def boxes_rng(rng, n):
    return np.stack([rng.uniform(0, 40, n), rng.uniform(-20, 20, n),
                     rng.uniform(0.5, 5, n), rng.uniform(0.5, 5, n),
                     rng.uniform(-np.pi, np.pi, n)], 1).astype(np.float32)


class TestPallasRotatedIoU:
    def test_matches_xla_clip(self):
        rng = np.random.default_rng(0)
        a, b = boxes_rng(rng, 150), boxes_rng(rng, 90)
        ref = np.asarray(rotated_iou.rotate_iou_matrix(
            jnp.asarray(a), jnp.asarray(b)))
        got = np.asarray(rip.rotate_iou_matrix_pallas(
            jnp.asarray(a), jnp.asarray(b), tile_n=32, tile_k=64,
            interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("criterion", [-1, 0, 1])
    def test_criteria(self, criterion):
        rng = np.random.default_rng(1)
        a, b = boxes_rng(rng, 40), boxes_rng(rng, 40)
        ref = np.asarray(rotated_iou.rotate_iou_matrix(
            jnp.asarray(a), jnp.asarray(b), criterion))
        got = np.asarray(rip.rotate_iou_matrix_pallas(
            jnp.asarray(a), jnp.asarray(b), criterion, tile_n=32,
            tile_k=64, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_identical_and_disjoint(self):
        b = jnp.asarray(np.array([[0, 0, 2, 4, 0.3],
                                  [100, 100, 2, 4, 1.0]], np.float32))
        got = np.asarray(rip.rotate_iou_matrix_pallas(
            b, b, tile_n=8, tile_k=8, interpret=True))
        np.testing.assert_allclose(np.diag(got), [1.0, 1.0], atol=1e-5)
        assert got[0, 1] == 0.0

    def test_nonmultiple_padding(self):
        rng = np.random.default_rng(2)
        a, b = boxes_rng(rng, 37), boxes_rng(rng, 53)
        ref = np.asarray(rotated_iou.rotate_iou_matrix(
            jnp.asarray(a), jnp.asarray(b)))
        got = np.asarray(rip.rotate_iou_matrix_pallas(
            jnp.asarray(a), jnp.asarray(b), tile_n=16, tile_k=32,
            interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
