"""Pallas kernels in interpret mode (CPU) vs XLA reference."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.ops.pallas import (  # noqa: E402
    pillar_scatter as ps)


class TestPillarScatterInterpret:
    def test_matches_xla(self):
        rng = np.random.default_rng(0)
        hw = 4096
        V, C = 640, 64
        lin = np.sort(rng.choice(hw, V - 40, replace=False)).astype(np.int32)
        lin = np.concatenate([lin, np.full(40, hw, np.int32)])
        feats = rng.normal(size=(V, C)).astype(np.float32)
        feats[-40:] = 0
        out = ps.scatter_sorted_to_canvas(
            jnp.asarray(feats), jnp.asarray(lin), hw=hw, interpret=True)
        ref = ps.scatter_to_canvas_xla(jnp.asarray(feats), jnp.asarray(lin),
                                       hw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_tiny_input_padding(self):
        rng = np.random.default_rng(1)
        hw = 2048
        V, C = 100, 32  # smaller than one window -> padding path
        lin = np.sort(rng.choice(hw, V, replace=False)).astype(np.int32)
        feats = rng.normal(size=(V, C)).astype(np.float32)
        out = ps.scatter_sorted_to_canvas(
            jnp.asarray(feats), jnp.asarray(lin), hw=hw, interpret=True)
        ref = ps.scatter_to_canvas_xla(jnp.asarray(feats), jnp.asarray(lin),
                                       hw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_empty(self):
        hw = 2048
        lin = np.full(128, hw, np.int32)
        feats = np.zeros((128, 16), np.float32)
        out = ps.scatter_sorted_to_canvas(
            jnp.asarray(feats), jnp.asarray(lin), hw=hw, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), 0)
