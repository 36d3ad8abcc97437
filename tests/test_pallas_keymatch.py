"""Parity tests for the key-match gather-GEMM (the rulebook join fused
into the kernel) against the rulebook-based reference paths in
ops.sparse_conv.  With ``window == padded table size`` every tile's span
fits, so the Pallas interpret path actually executes on CPU; small
windows and unsorted keys exercise the exact XLA merge-join fallback."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc  # noqa: E402
from automatic_as_built_reconstruction_tpu.ops.pallas import (  # noqa: E402
    sparse_gather_gemm as sgg)

GRID = (8, 12, 10)
INT32_MAX = np.iinfo(np.int32).max


def random_sparse(rng, n_active=60, n_pad=20, cin=8, sort_keys=True):
    D, H, W = GRID
    lin = rng.choice(D * H * W, n_active, replace=False)
    if sort_keys:
        # depth-minor ascending — the canonical voxelizer order
        zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
        key = (zyx[:, 1] * W + zyx[:, 2]) * D + zyx[:, 0]
        zyx = zyx[np.argsort(key)]
    else:
        zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
    coords = np.concatenate(
        [zyx, np.full((n_pad, 3), -1)]).astype(np.int32)
    valid = np.concatenate(
        [np.ones(n_active, bool), np.zeros(n_pad, bool)])
    feats = rng.normal(size=(n_active + n_pad, cin)).astype(np.float32)
    feats[~valid] = 0
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


class TestKeymatchGemm:
    @pytest.mark.parametrize("shared", [True, False])
    @pytest.mark.parametrize("window", [80, 48])
    def test_matches_submanifold_conv(self, window, shared):
        """window=80 (== padded table) -> Pallas interpret path;
        window=48 -> some tiles over-span -> XLA merge-join fallback.
        Both must be exact, in both shared-window and per-tap-window
        kernel modes."""
        rng = np.random.default_rng(0)
        feats, coords, valid = random_sparse(rng)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        keys = sc.linearize(coords, GRID)
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.submanifold_conv(feats, rb, w, valid=valid)
        out = sgg.keymatch_gemm(feats, keys, qk, w, True, 8, window,
                                shared)
        out = jnp.where(valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_pallas_path_actually_selected(self):
        """keymatch_fits is True at the full-table window (guards against
        silently always falling back to XLA in the parity test above)."""
        rng = np.random.default_rng(5)
        feats, coords, valid = random_sparse(rng)
        keys = sc.linearize(coords, GRID)
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))
        assert bool(sgg.keymatch_fits(keys, qk, tile=8, window=80))

    def test_unsorted_keys_fall_back_exactly(self):
        rng = np.random.default_rng(2)
        feats, coords, valid = random_sparse(rng, sort_keys=False)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        keys = sc.linearize(coords, GRID)
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))
        assert not bool(sgg.keymatch_fits(keys, qk, tile=8, window=80))
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.submanifold_conv(feats, rb, w, valid=valid)
        out = sgg.keymatch_gemm(feats, keys, qk, w, True, 8, 80)
        out = jnp.where(valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shared", [True, False])
    @pytest.mark.parametrize("stride", [(2, 2, 2), (2, 1, 1)])
    def test_matches_strided_conv(self, stride, shared):
        rng = np.random.default_rng(1)
        feats, coords, valid = random_sparse(rng)
        kernel, pad, max_out = (3, 3, 3), (1, 1, 1), 48
        layout = sc.build_strided_layout(coords, valid, GRID, kernel,
                                         stride, pad, max_out)
        sites = sc.build_strided_sites(coords, valid, GRID, kernel,
                                       stride, pad, max_out)
        np.testing.assert_array_equal(np.asarray(layout.out_coords),
                                      np.asarray(sites.out_coords))
        keys = sc.linearize(coords, GRID)
        qk = sc.strided_tap_keys(sites, GRID, kernel, stride, pad)
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.strided_sparse_conv(feats, layout, w)
        out = sgg.keymatch_gemm(feats, keys, qk, w, True, 8, 80, shared)
        out = jnp.where(sites.out_valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("subwindow", [80, 32])
    def test_subwindow_matches_submanifold_conv(self, subwindow):
        """subwindow == window -> degenerate (offsets all 0, same rows
        as the shared kernel); subwindow=32 -> some taps over-span ->
        exact XLA fallback.  Both must match the rulebook path."""
        rng = np.random.default_rng(6)
        feats, coords, valid = random_sparse(rng)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        keys = sc.linearize(coords, GRID)
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.submanifold_conv(feats, rb, w, valid=valid)
        out = sgg.keymatch_gemm(feats, keys, qk, w, True, 8, 80, True,
                                subwindow)
        out = jnp.where(valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_subwindow_nonzero_offsets(self):
        """A table big enough that per-tap subwindow offsets are real
        multiples of 128 (the offset alignment unit), with the Pallas
        path actually selected."""
        rng = np.random.default_rng(7)
        D, H, W = 8, 40, 40
        n = 600
        lin = rng.choice(D * H * W, n, replace=False)
        zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
        key = (zyx[:, 1] * W + zyx[:, 2]) * D + zyx[:, 0]
        zyx = zyx[np.argsort(key)]
        coords = jnp.asarray(np.concatenate(
            [zyx, np.full((40, 3), -1)]).astype(np.int32))
        valid = jnp.asarray(np.concatenate(
            [np.ones(n, bool), np.zeros(40, bool)]))
        feats = np.zeros((n + 40, 8), np.float32)
        feats[:n] = rng.normal(size=(n, 8))
        feats = jnp.asarray(feats)
        grid = (D, H, W)
        rb = sc.build_submanifold_rulebook(coords, valid, grid, (3, 3, 3))
        keys = sc.linearize(coords, grid)
        qk = sc.subm_tap_keys(coords, valid, grid, (3, 3, 3))
        tile, window, sub = 128, 640, 256
        assert bool(sgg.keymatch_fits(keys, qk, tile=tile, window=window,
                                      subwindow=sub))
        # the decision actually produces nonzero offsets
        L = 640
        kp = jnp.pad(keys, (0, L - keys.shape[0]),
                     constant_values=INT32_MAX)
        qp = jnp.pad(qk, ((0, 0), (0, L - qk.shape[1])),
                     constant_values=INT32_MAX)
        _, off, fits = sgg._keymatch_subwin_decision(kp, qp, L, tile,
                                                     window, sub)
        assert bool(fits) and int(np.asarray(off).max()) >= 128
        assert int(np.asarray(off).max()) % 128 == 0
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.submanifold_conv(feats, rb, w, valid=valid)
        out = sgg.keymatch_gemm(feats, keys, qk, w, True, tile, window,
                                True, sub)
        out = jnp.where(valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("stride", [(2, 2, 2), (2, 1, 1)])
    def test_subwindow_matches_strided_conv(self, stride):
        rng = np.random.default_rng(8)
        feats, coords, valid = random_sparse(rng)
        kernel, pad, max_out = (3, 3, 3), (1, 1, 1), 48
        layout = sc.build_strided_layout(coords, valid, GRID, kernel,
                                         stride, pad, max_out)
        sites = sc.build_strided_sites(coords, valid, GRID, kernel,
                                       stride, pad, max_out)
        keys = sc.linearize(coords, GRID)
        qk = sc.strided_tap_keys(sites, GRID, kernel, stride, pad)
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.strided_sparse_conv(feats, layout, w)
        out = sgg.keymatch_gemm(feats, keys, qk, w, True, 8, 80, True,
                                80)
        out = jnp.where(sites.out_valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_subwindow_grads_match(self):
        rng = np.random.default_rng(9)
        feats, coords, valid = random_sparse(rng)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        keys = sc.linearize(coords, GRID)
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        cot = jnp.asarray(
            rng.normal(size=(feats.shape[0], 16)).astype(np.float32))

        def loss_ref(f, ww):
            out = sc.submanifold_conv(f, rb, ww, valid=valid)
            return jnp.sum(out * cot)

        def loss_km(f, ww):
            out = sgg.keymatch_gemm(f, keys, qk, ww, True, 8, 80, True,
                                    80)
            out = jnp.where(valid[:, None], out, 0.0)
            return jnp.sum(out * cot)

        gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
        gk_f, gk_w = jax.grad(loss_km, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gk_f),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gr_w), np.asarray(gk_w),
                                   rtol=1e-4, atol=1e-4)

    def test_tap_spans_bound_subwindow(self):
        """choose_keymatch_subwindow's spans actually cover: a kernel
        run at exactly the chosen subwindow selects the Pallas path."""
        rng = np.random.default_rng(10)
        feats, coords, valid = random_sparse(rng)
        keys = sc.linearize(coords, GRID)
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))
        ws = sgg.choose_keymatch_subwindow(
            [(np.asarray(keys), np.asarray(qk))], tile=8)
        assert ws % 128 == 0
        assert bool(sgg.keymatch_fits(keys, qk, tile=8, window=80,
                                      subwindow=min(ws, 80)))

    def test_grads_match_rulebook_path(self):
        rng = np.random.default_rng(4)
        feats, coords, valid = random_sparse(rng)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        keys = sc.linearize(coords, GRID)
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        cot = jnp.asarray(
            rng.normal(size=(feats.shape[0], 16)).astype(np.float32))

        def loss_ref(f, ww):
            out = sc.submanifold_conv(f, rb, ww, valid=valid)
            return jnp.sum(out * cot)

        def loss_km(f, ww):
            out = sgg.keymatch_gemm(f, keys, qk, ww, True, 8, 80)
            out = jnp.where(valid[:, None], out, 0.0)
            return jnp.sum(out * cot)

        gr_f, gr_w = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
        gk_f, gk_w = jax.grad(loss_km, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gk_f),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gr_w), np.asarray(gk_w),
                                   rtol=1e-4, atol=1e-4)


class TestSparseMiddleKeymatch:
    def test_matches_default_path(self):
        """SparseMiddle(use_keymatch=True) == default rulebook path with
        identical parameters (interpret mode on CPU)."""
        from automatic_as_built_reconstruction_tpu.models.middle import (
            SparseMiddle)
        rng = np.random.default_rng(3)
        B, V = 2, 96
        D, H, W = 8, 16, 16
        coords = np.full((B, V, 3), -1, np.int32)
        feats = np.zeros((B, V, 4), np.float32)
        for b in range(B):
            n = 48
            lin = rng.choice(D * H * W, n, replace=False)
            zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
            key = (zyx[:, 1] * W + zyx[:, 2]) * D + zyx[:, 0]
            coords[b, :n] = zyx[np.argsort(key)]
            feats[b, :n] = rng.normal(size=(n, 4))
        kw = dict(grid_dhw=(D, H, W), num_input_features=4,
                  num_filters=(8, 16), layers_per_block=(1, 1),
                  z_strides=(2, 2), xy_strides=(2, 2))
        m_ref = SparseMiddle(**kw)
        m_km = SparseMiddle(use_pallas_gemm=True, use_keymatch=True,
                            pallas_tile=8, pallas_window=96, **kw)
        fj, cj = jnp.asarray(feats), jnp.asarray(coords)
        variables = m_ref.init(jax.random.key(0), fj, cj)
        ref = m_ref.apply(variables, fj, cj)
        out = m_km.apply(variables, fj, cj)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-4)

    def test_per_block_windows_match_global(self):
        """A per-block window tuple is numerically identical to the
        global window (window only affects routing/DMA coverage), even
        when one block's window forces the XLA fallback."""
        from automatic_as_built_reconstruction_tpu.models.middle import (
            SparseMiddle)
        from automatic_as_built_reconstruction_tpu.ops.pallas import (
            sparse_gather_gemm as sgg)
        rng = np.random.default_rng(4)
        B, V = 2, 96
        D, H, W = 8, 16, 16
        coords = np.full((B, V, 3), -1, np.int32)
        feats = np.zeros((B, V, 4), np.float32)
        for b in range(B):
            n = 48
            lin = rng.choice(D * H * W, n, replace=False)
            zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
            key = (zyx[:, 1] * W + zyx[:, 2]) * D + zyx[:, 0]
            coords[b, :n] = zyx[np.argsort(key)]
            feats[b, :n] = rng.normal(size=(n, 4))
        kw = dict(grid_dhw=(D, H, W), num_input_features=4,
                  num_filters=(8, 16), layers_per_block=(1, 1),
                  z_strides=(2, 2), xy_strides=(2, 2),
                  use_pallas_gemm=True, use_keymatch=True, pallas_tile=8)
        m_glob = SparseMiddle(pallas_window=96, **kw)
        m_tup = SparseMiddle(pallas_window=(96, 32), **kw)
        fj, cj = jnp.asarray(feats), jnp.asarray(coords)
        variables = m_glob.init(jax.random.key(0), fj, cj)
        ref = m_glob.apply(variables, fj, cj)
        out = m_tup.apply(variables, fj, cj)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-4)
        # choose_windows: per-block helper returns one window per block
        gi = np.zeros((3, 16), np.int64)
        fo = np.ones((3, 16), bool)
        wins = sgg.choose_windows([[(gi, fo)], [(gi, fo, 32)]], 96,
                                  tile=8)
        assert len(wins) == 2 and all(w % 128 == 0 or w >= 32
                                      for w in wins)

    def test_per_join_pairs_and_subwindow_match_global(self):
        """(subm, strided) window pairs and keymatch_subwindow settings
        are numerically identical to the global-window default (they
        only change routing / compare width), including entries that
        force the XLA fallback."""
        from automatic_as_built_reconstruction_tpu.models.middle import (
            SparseMiddle)
        rng = np.random.default_rng(11)
        B, V = 2, 96
        D, H, W = 8, 16, 16
        coords = np.full((B, V, 3), -1, np.int32)
        feats = np.zeros((B, V, 4), np.float32)
        for b in range(B):
            n = 48
            lin = rng.choice(D * H * W, n, replace=False)
            zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
            key = (zyx[:, 1] * W + zyx[:, 2]) * D + zyx[:, 0]
            coords[b, :n] = zyx[np.argsort(key)]
            feats[b, :n] = rng.normal(size=(n, 4))
        kw = dict(grid_dhw=(D, H, W), num_input_features=4,
                  num_filters=(8, 16), layers_per_block=(1, 1),
                  z_strides=(2, 2), xy_strides=(2, 2),
                  use_pallas_gemm=True, use_keymatch=True, pallas_tile=8)
        m_glob = SparseMiddle(pallas_window=96, **kw)
        m_pair = SparseMiddle(pallas_window=((96, 96), (96, 32)),
                              keymatch_subwindow=((96, 96), (32, 96)),
                              **kw)
        fj, cj = jnp.asarray(feats), jnp.asarray(coords)
        variables = m_glob.init(jax.random.key(0), fj, cj)
        ref = m_glob.apply(variables, fj, cj)
        out = m_pair.apply(variables, fj, cj)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-4)


class TestKeymatchGrouped:
    """Grouped-tap kernel: taps permuted (dy, dx)-major / dz-minor so
    each contiguous kz-tap run shares one per-(group, tile) subwindow
    and stacks into one gather + one accumulate matmul."""

    def test_group_perm_roundtrip(self):
        perm = sgg.group_perm((3, 3, 3))
        assert sorted(perm.tolist()) == list(range(27))
        offs = sc._offsets((3, 3, 3))[perm]
        # consecutive runs of 3 share (dy, dx) and enumerate dz
        for g in range(9):
            run = offs[3 * g:3 * g + 3]
            assert (run[:, 1] == run[0, 1]).all()
            assert (run[:, 2] == run[0, 2]).all()
            assert run[:, 0].tolist() == [-1, 0, 1]

    @pytest.mark.parametrize("subwindow", [80, 32])
    def test_grouped_matches_submanifold_conv(self, subwindow):
        """subwindow=80 (== padded table) -> grouped Pallas interpret
        path; subwindow=32 -> some groups over-span -> exact XLA
        fallback.  Both must match the rulebook path."""
        rng = np.random.default_rng(12)
        feats, coords, valid = random_sparse(rng)
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        keys = sc.linearize(coords, GRID)
        perm = sgg.group_perm((3, 3, 3))
        qk = sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3))[perm]
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.submanifold_conv(feats, rb, w, valid=valid)
        out = sgg.keymatch_gemm(feats, keys, qk, w[jnp.asarray(perm)],
                                True, 8, 80, True, subwindow, 3)
        out = jnp.where(valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_grouped_matches_strided_conv(self):
        rng = np.random.default_rng(13)
        feats, coords, valid = random_sparse(rng)
        kernel, stride, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)
        layout = sc.build_strided_layout(coords, valid, GRID, kernel,
                                         stride, pad, max_out=64)
        keys = sc.linearize(coords, GRID)
        sites = sc.build_strided_sites(coords, valid, GRID, kernel,
                                       stride, pad, 64)
        perm = sgg.group_perm(kernel)
        qk = sc.strided_tap_keys(sites, GRID, kernel, stride, pad)[perm]
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.strided_sparse_conv(feats, layout, w)
        ref = jnp.where(layout.out_valid[:, None], ref, 0.0)
        out = sgg.keymatch_gemm(feats, keys, qk, w[jnp.asarray(perm)],
                                True, 8, 80, True, 80, 3)
        out = jnp.where(sites.out_valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_grouped_nonzero_offsets(self):
        """Real per-(group, tile) offsets (multiples of 128) with the
        grouped Pallas path actually selected; parity vs rulebook."""
        rng = np.random.default_rng(14)
        D, H, W = 8, 40, 40
        n = 600
        lin = rng.choice(D * H * W, n, replace=False)
        zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
        key = (zyx[:, 1] * W + zyx[:, 2]) * D + zyx[:, 0]
        zyx = zyx[np.argsort(key)]
        coords = jnp.asarray(np.concatenate(
            [zyx, np.full((40, 3), -1)]).astype(np.int32))
        valid = jnp.asarray(np.concatenate(
            [np.ones(n, bool), np.zeros(40, bool)]))
        feats = np.zeros((n + 40, 8), np.float32)
        feats[:n] = rng.normal(size=(n, 8))
        feats = jnp.asarray(feats)
        grid = (D, H, W)
        rb = sc.build_submanifold_rulebook(coords, valid, grid, (3, 3, 3))
        keys = sc.linearize(coords, grid)
        perm = sgg.group_perm((3, 3, 3))
        qk = sc.subm_tap_keys(coords, valid, grid, (3, 3, 3))[perm]
        tile, window, sub = 128, 640, 256
        assert bool(sgg.keymatch_fits(keys, qk, tile=tile, window=window,
                                      subwindow=sub, group=3))
        L = 640
        kp = jnp.pad(keys, (0, L - keys.shape[0]),
                     constant_values=INT32_MAX)
        qp = jnp.pad(qk, ((0, 0), (0, L - qk.shape[1])),
                     constant_values=INT32_MAX)
        _, off, fits = sgg._keymatch_group_decision(kp, qp, L, tile,
                                                    window, sub, 3)
        assert bool(fits) and int(np.asarray(off).max()) >= 128
        w = jnp.asarray(rng.normal(size=(27, 8, 16)).astype(np.float32))
        ref = sc.submanifold_conv(feats, rb, w, valid=valid)
        out = sgg.keymatch_gemm(feats, keys, qk, w[jnp.asarray(perm)],
                                True, tile, window, True, sub, 3)
        out = jnp.where(valid[:, None], out, 0.0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)

    def test_group_spans_close_to_tap_spans(self):
        """Depth-minor order: a dz-group's span is barely wider than a
        single tap's (the structural fact the grouping exploits)."""
        rng = np.random.default_rng(15)
        feats, coords, valid = random_sparse(rng, n_active=70)
        keys = sc.linearize(coords, GRID)
        perm = sgg.group_perm((3, 3, 3))
        qk = np.asarray(sc.subm_tap_keys(coords, valid, GRID, (3, 3, 3)))
        tap = sgg.keymatch_tap_spans(np.asarray(keys), qk, tile=8)
        grp = sgg.keymatch_group_spans(np.asarray(keys), qk[perm],
                                       tile=8, group=3)
        assert grp.max() <= tap.max() + 8

    def test_grouped_middle_matches_ungrouped(self):
        """SparseMiddle keymatch_group=True is numerically identical to
        the per-tap subwindow path through a 2-block stack."""
        from automatic_as_built_reconstruction_tpu.models.middle import (
            SparseMiddle)
        rng = np.random.default_rng(16)
        B, V = 2, 96
        D, H, W = 8, 16, 16
        coords = np.full((B, V, 3), -1, np.int32)
        feats = np.zeros((B, V, 4), np.float32)
        for b in range(B):
            n = 48
            lin = rng.choice(D * H * W, n, replace=False)
            zyx = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
            key = (zyx[:, 1] * W + zyx[:, 2]) * D + zyx[:, 0]
            coords[b, :n] = zyx[np.argsort(key)]
            feats[b, :n] = rng.normal(size=(n, 4))
        kw = dict(grid_dhw=(D, H, W), num_input_features=4,
                  num_filters=(8, 16), layers_per_block=(1, 1),
                  z_strides=(2, 2), xy_strides=(2, 2),
                  use_pallas_gemm=True, use_keymatch=True, pallas_tile=8,
                  pallas_window=96, keymatch_subwindow=96)
        m_flat = SparseMiddle(**kw)
        m_grp = SparseMiddle(keymatch_group=True, **kw)
        fj, cj = jnp.asarray(feats), jnp.asarray(coords)
        variables = m_flat.init(jax.random.key(0), fj, cj)
        ref = m_flat.apply(variables, fj, cj)
        out = m_grp.apply(variables, fj, cj)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   rtol=1e-4, atol=1e-4)
