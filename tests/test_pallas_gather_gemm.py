"""Interpret-mode parity tests for the Pallas windowed gather-GEMM
sparse-conv kernel (north-star N1) against the XLA reference in
ops.sparse_conv.  Key-sorted rulebooks run the Pallas path; unsorted or
over-span rulebooks exercise the exact XLA fallback inside the wrapper."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc  # noqa: E402
from automatic_as_built_reconstruction_tpu.ops.pallas import (  # noqa: E402
    sparse_gather_gemm as sgg)

GRID = (8, 12, 10)


def random_sparse(rng, n_active=60, n_pad=20, cin=8, sort_keys=True):
    D, H, W = GRID
    lin = rng.choice(D * H * W, n_active, replace=False)
    if sort_keys:
        lin = np.sort(lin)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
    coords = np.concatenate(
        [coords, np.full((n_pad, 3), -1)]).astype(np.int32)
    valid = np.concatenate(
        [np.ones(n_active, bool), np.zeros(n_pad, bool)])
    feats = rng.normal(size=(n_active + n_pad, cin)).astype(np.float32)
    feats[~valid] = 0
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


class TestGatherGemm:
    @pytest.mark.parametrize("sort_keys", [True, False])
    def test_matches_submanifold_conv(self, sort_keys):
        """sorted -> Pallas windowed path; unsorted -> XLA fallback."""
        rng = np.random.default_rng(0)
        feats, coords, valid = random_sparse(rng, sort_keys=sort_keys)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.submanifold_conv(feats, rb, w, valid=valid)
        out = sgg.gather_gemm(feats, rb.gather_idx, rb.found, w,
                              True, 8, 48)
        out = jnp.where(valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_pallas_path_actually_selected(self):
        """The monotonicity predicate holds for a sorted rulebook
        (guards against silently always falling back to XLA)."""
        rng = np.random.default_rng(5)
        feats, coords, valid = random_sparse(rng, sort_keys=True)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        idx = jnp.asarray(rb.gather_idx)
        mask = jnp.asarray(rb.found)
        cm = jax.lax.cummax(jnp.where(mask, idx, -1), axis=1)
        assert bool(jnp.all(jnp.where(mask, idx == cm, True)))

    def test_matches_strided_conv(self):
        rng = np.random.default_rng(1)
        feats, coords, valid = random_sparse(rng, sort_keys=True)
        layout = sc.build_strided_layout(coords, valid, GRID, (3, 3, 3),
                                         (2, 2, 2), (1, 1, 1), 48)
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.strided_sparse_conv(feats, layout, w)
        out = sgg.gather_gemm(feats, layout.gather_idx, layout.found, w,
                              True, 8, 48)
        out = jnp.where(layout.out_valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_more_rulebook_rows_than_features(self):
        """R > N path (capacity round-up): padded feature table."""
        rng = np.random.default_rng(2)
        feats, coords, valid = random_sparse(rng, sort_keys=True)
        layout = sc.build_strided_layout(coords, valid, GRID, (3, 3, 3),
                                         (2, 2, 2), (1, 1, 1), 128)
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.strided_sparse_conv(feats, layout, w)
        out = sgg.gather_gemm(feats, layout.gather_idx, layout.found, w,
                              True, 8, 48)
        out = jnp.where(layout.out_valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)


class TestSparseMiddlePallasPath:
    def test_matches_xla_path(self):
        """SparseMiddle(use_pallas_gemm=True) == default path (interpret
        mode on CPU)."""
        from automatic_as_built_reconstruction_tpu.models.middle import (
            SparseMiddle)
        rng = np.random.default_rng(3)
        B, V = 2, 96
        D, H, W = 8, 16, 16
        coords = np.full((B, V, 3), -1, np.int32)
        feats = np.zeros((B, V, 4), np.float32)
        for b in range(B):
            n = 48
            lin = np.sort(rng.choice(D * H * W, n, replace=False))
            coords[b, :n] = np.stack(
                [lin // (H * W), (lin // W) % H, lin % W], 1)
            feats[b, :n] = rng.normal(size=(n, 4))
        kw = dict(grid_dhw=(D, H, W), num_input_features=4,
                  num_filters=(8, 16), layers_per_block=(1, 1),
                  z_strides=(2, 2), xy_strides=(2, 2))
        m_ref = SparseMiddle(**kw)
        m_pl = SparseMiddle(use_pallas_gemm=True, **kw)
        fj, cj = jnp.asarray(feats), jnp.asarray(coords)
        variables = m_ref.init(jax.random.key(0), fj, cj)
        ref = m_ref.apply(variables, fj, cj)
        out = m_pl.apply(variables, fj, cj)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-4)


class TestGradients:
    def test_grads_match_xla_path(self):
        rng = np.random.default_rng(4)
        feats, coords, valid = random_sparse(rng, sort_keys=True)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        cot = jnp.asarray(
            rng.normal(size=(feats.shape[0], 16)).astype(np.float32))

        def loss_ref(f, ww):
            out = sc.submanifold_conv(f, rb, ww, valid=valid)
            return jnp.sum(out * cot)

        def loss_pl(f, ww):
            out = sgg.gather_gemm(f, rb.gather_idx, rb.found, ww,
                                  True, 8, 48)
            out = jnp.where(valid[:, None], out, 0.0)
            return jnp.sum(out * cot)

        gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
        gp_f, gp_w = jax.grad(loss_pl, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gp_f),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gr_w), np.asarray(gp_w),
                                   rtol=1e-4, atol=1e-4)


class TestTelemetry:
    """pallas_fits / tile_spans / choose_window — the routing-decision
    telemetry (VERDICT r2 weak item 5)."""

    def test_unsorted_never_fits(self):
        rng = np.random.default_rng(7)
        feats, coords, valid = random_sparse(rng, sort_keys=False)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        for w in (48, 128, 256):
            assert not bool(sgg.pallas_fits(rb.gather_idx, rb.found,
                                            feats.shape[0], tile=8,
                                            window=w))

    def test_chosen_window_fits_sorted(self):
        rng = np.random.default_rng(8)
        feats, coords, valid = random_sparse(rng, n_active=200, n_pad=56,
                                             sort_keys=True)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        N = feats.shape[0]
        spans = sgg.tile_spans(np.asarray(rb.gather_idx),
                               np.asarray(rb.found), N, tile=8)
        assert spans.max() > 0
        w = sgg.choose_window([(np.asarray(rb.gather_idx),
                                np.asarray(rb.found))], N, tile=8)
        assert w % 128 == 0
        if w <= N:   # feasible window found within the table
            assert bool(sgg.pallas_fits(rb.gather_idx, rb.found, N,
                                        tile=8, window=w))
