"""Sparse conv vs dense lax.conv oracle (the spconv test pattern)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc  # noqa: E402

GRID = (8, 12, 10)  # D, H, W


def random_sparse(rng, n_active=60, n_pad=20, cin=5, grid=GRID):
    D, H, W = grid
    lin = rng.choice(D * H * W, n_active, replace=False)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
    coords = np.concatenate(
        [coords, np.full((n_pad, 3), -1)]).astype(np.int32)
    valid = np.concatenate(
        [np.ones(n_active, bool), np.zeros(n_pad, bool)])
    feats = rng.normal(size=(n_active + n_pad, cin)).astype(np.float32)
    feats[~valid] = 0
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


class TestSubmanifold:
    @pytest.mark.parametrize("kernel", [(3, 3, 3), (1, 3, 3), (3, 1, 1)])
    def test_matches_dense_at_active_sites(self, kernel):
        rng = np.random.default_rng(0)
        feats, coords, valid = random_sparse(rng)
        cin, cout = 5, 7
        K = int(np.prod(kernel))
        w = jnp.asarray(rng.normal(size=(K, cin, cout)).astype(np.float32))
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, kernel)
        out = sc.submanifold_conv(feats, rb, w, valid=valid)

        dense = sc.densify(feats, coords, valid, GRID)
        ref = sc.dense_conv3d(dense, w, kernel)
        cz, cy, cx = np.asarray(coords).T
        v = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(out)[v],
            np.asarray(ref)[cz[v], cy[v], cx[v]], rtol=1e-4, atol=1e-4)
        # padding rows emit zeros
        np.testing.assert_array_equal(np.asarray(out)[~v], 0)

    def test_rulebook_reuse_across_layers(self):
        rng = np.random.default_rng(1)
        feats, coords, valid = random_sparse(rng, cin=4)
        w1 = jnp.asarray(rng.normal(size=(27, 4, 6)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(size=(27, 6, 6)).astype(np.float32))
        rb = sc.build_submanifold_rulebook(coords, valid, GRID, (3, 3, 3))
        h = sc.submanifold_conv(feats, rb, w1, valid=valid)
        out = sc.submanifold_conv(h, rb, w2, valid=valid)  # same rulebook
        dense = sc.densify(feats, coords, valid, GRID)
        ref1 = sc.dense_conv3d(dense, w1, (3, 3, 3))
        # submanifold: only active sites carry features into layer 2
        mask = np.zeros(GRID + (1,), np.float32)
        cz, cy, cx = np.asarray(coords).T
        v = np.asarray(valid)
        mask[cz[v], cy[v], cx[v]] = 1
        ref2 = sc.dense_conv3d(jnp.asarray(np.asarray(ref1) * mask), w2,
                               (3, 3, 3))
        np.testing.assert_allclose(
            np.asarray(out)[v],
            np.asarray(ref2)[cz[v], cy[v], cx[v]], rtol=1e-3, atol=1e-3)


class TestStrided:
    @pytest.mark.parametrize("kernel,stride", [
        ((3, 3, 3), (2, 2, 2)),
        ((3, 3, 3), (2, 1, 1)),
        ((3, 1, 1), (2, 1, 1)),
    ])
    def test_matches_dense(self, kernel, stride):
        rng = np.random.default_rng(2)
        feats, coords, valid = random_sparse(rng)
        cin, cout = 5, 6
        K = int(np.prod(kernel))
        pad = tuple(k // 2 for k in kernel)
        w = jnp.asarray(rng.normal(size=(K, cin, cout)).astype(np.float32))
        layout = sc.build_strided_layout(coords, valid, GRID, kernel,
                                         stride, pad, max_out=256)
        out = sc.strided_sparse_conv(feats, layout, w)

        dense = sc.densify(feats, coords, valid, GRID)
        ref = sc.dense_conv3d(dense, w, kernel, stride=stride, padding=pad)
        oc = np.asarray(layout.out_coords)
        ov = np.asarray(layout.out_valid)
        np.testing.assert_allclose(
            np.asarray(out)[ov],
            np.asarray(ref)[oc[ov, 0], oc[ov, 1], oc[ov, 2]],
            rtol=1e-4, atol=1e-4)

    def test_output_sites_exactly_spconv(self):
        """Active outputs == positions whose receptive field hits an input."""
        rng = np.random.default_rng(3)
        feats, coords, valid = random_sparse(rng, n_active=25)
        kernel, stride = (3, 3, 3), (2, 2, 2)
        pad = (1, 1, 1)
        layout = sc.build_strided_layout(coords, valid, GRID, kernel,
                                         stride, pad, max_out=512)
        occ = sc.densify(jnp.ones_like(feats[:, :1]), coords, valid, GRID)
        w1 = jnp.ones((27, 1, 1), jnp.float32)
        touched = np.asarray(sc.dense_conv3d(occ, w1, kernel, stride=stride,
                                             padding=pad))[..., 0] > 0
        expect = set(map(tuple, np.argwhere(touched)))
        got = set(map(tuple, np.asarray(
            layout.out_coords)[np.asarray(layout.out_valid)]))
        assert got == expect

    def test_out_capacity_clamps(self):
        rng = np.random.default_rng(4)
        feats, coords, valid = random_sparse(rng, n_active=60)
        layout = sc.build_strided_layout(coords, valid, GRID, (3, 3, 3),
                                         (2, 2, 2), (1, 1, 1), max_out=10)
        assert int(layout.num_out) == 10
        assert int(layout.out_valid.sum()) == 10


class TestScatterToBev:
    def test_depth_folding(self):
        rng = np.random.default_rng(5)
        feats, coords, valid = random_sparse(rng, n_active=30, cin=4)
        bev = sc.scatter_to_bev(feats, coords, valid, GRID)
        D, H, W = GRID
        assert bev.shape == (H, W, D * 4)
        c = np.asarray(coords)
        v = np.asarray(valid)
        f = np.asarray(feats)
        b = np.asarray(bev).reshape(H, W, D, 4)
        for i in np.flatnonzero(v)[:10]:
            np.testing.assert_allclose(b[c[i, 1], c[i, 2], c[i, 0]], f[i])


class TestLutBuilders:
    """Dense-LUT rulebook/layout builders == sort-based builders."""

    @pytest.mark.parametrize("kernel", [(3, 3, 3), (1, 3, 3)])
    def test_subm_lut_matches_sort(self, kernel):
        rng = np.random.default_rng(7)
        _, coords, valid = random_sparse(rng)
        a = sc.build_submanifold_rulebook(coords, valid, GRID, kernel)
        b = sc.build_submanifold_rulebook_lut(coords, valid, GRID, kernel)
        np.testing.assert_array_equal(np.asarray(a.found),
                                      np.asarray(b.found))
        fa = np.asarray(a.found)
        np.testing.assert_array_equal(np.asarray(a.gather_idx)[fa],
                                      np.asarray(b.gather_idx)[fa])

    @pytest.mark.parametrize("stride", [(2, 2, 2), (2, 1, 1), (1, 2, 2)])
    def test_strided_lut_matches_sort(self, stride):
        rng = np.random.default_rng(8)
        _, coords, valid = random_sparse(rng)
        kernel, pad, max_out = (3, 3, 3), (1, 1, 1), 128
        a = sc.build_strided_layout(coords, valid, GRID, kernel, stride,
                                    pad, max_out)
        b = sc.build_strided_layout_lut(coords, valid, GRID, kernel, stride,
                                        pad, max_out)
        assert int(a.num_out) == int(b.num_out)
        np.testing.assert_array_equal(np.asarray(a.out_coords),
                                      np.asarray(b.out_coords))
        np.testing.assert_array_equal(np.asarray(a.out_valid),
                                      np.asarray(b.out_valid))
        np.testing.assert_array_equal(np.asarray(a.found),
                                      np.asarray(b.found))
        fa = np.asarray(a.found)
        np.testing.assert_array_equal(np.asarray(a.gather_idx)[fa],
                                      np.asarray(b.gather_idx)[fa])

    def test_strided_lut_out_capacity_clamps(self):
        rng = np.random.default_rng(9)
        _, coords, valid = random_sparse(rng)
        small = sc.build_strided_layout_lut(
            coords, valid, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), 8)
        full = sc.build_strided_layout_lut(
            coords, valid, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), 256)
        assert int(small.num_out) == 8
        np.testing.assert_array_equal(np.asarray(small.out_coords),
                                      np.asarray(full.out_coords)[:8])

    def test_lut_matches_host_precompute(self):
        """LUT builders == the host C++/numpy precompute (same tables the
        trainer ships)."""
        from automatic_as_built_reconstruction_tpu.ops import rulebook_host
        rng = np.random.default_rng(10)
        _, coords, valid = random_sparse(rng)
        coords_np = np.asarray(coords)
        gi, fo = rulebook_host.subm_rulebook(coords_np, GRID, (3, 3, 3))
        b = sc.build_submanifold_rulebook_lut(coords, valid, GRID, (3, 3, 3))
        np.testing.assert_array_equal(fo, np.asarray(b.found))
        np.testing.assert_array_equal(gi[fo], np.asarray(b.gather_idx)[fo])


class TestMergeBuilders:
    """Merge-join rulebook/layout builders == sort-based builders."""

    @pytest.mark.parametrize("kernel", [(3, 3, 3), (1, 3, 3)])
    def test_subm_merge_matches_sort(self, kernel):
        rng = np.random.default_rng(17)
        _, coords, valid = random_sparse(rng)
        a = sc.build_submanifold_rulebook(coords, valid, GRID, kernel)
        b = sc.build_submanifold_rulebook_merge(coords, valid, GRID, kernel)
        np.testing.assert_array_equal(np.asarray(a.found),
                                      np.asarray(b.found))
        fa = np.asarray(a.found)
        np.testing.assert_array_equal(np.asarray(a.gather_idx)[fa],
                                      np.asarray(b.gather_idx)[fa])

    @pytest.mark.parametrize("stride", [(2, 2, 2), (2, 1, 1), (1, 2, 2)])
    def test_strided_merge_matches_sort(self, stride):
        rng = np.random.default_rng(18)
        _, coords, valid = random_sparse(rng)
        kernel, pad, max_out = (3, 3, 3), (1, 1, 1), 128
        a = sc.build_strided_layout(coords, valid, GRID, kernel, stride,
                                    pad, max_out)
        b = sc.build_strided_layout_merge(coords, valid, GRID, kernel,
                                          stride, pad, max_out)
        assert int(a.num_out) == int(b.num_out)
        np.testing.assert_array_equal(np.asarray(a.out_coords),
                                      np.asarray(b.out_coords))
        np.testing.assert_array_equal(np.asarray(a.out_valid),
                                      np.asarray(b.out_valid))
        np.testing.assert_array_equal(np.asarray(a.found),
                                      np.asarray(b.found))
        fa = np.asarray(a.found)
        np.testing.assert_array_equal(np.asarray(a.gather_idx)[fa],
                                      np.asarray(b.gather_idx)[fa])

    def test_strided_merge_out_capacity_clamps(self):
        rng = np.random.default_rng(19)
        _, coords, valid = random_sparse(rng)
        small = sc.build_strided_layout_merge(
            coords, valid, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), 8)
        full = sc.build_strided_layout_merge(
            coords, valid, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), 256)
        assert int(small.num_out) == 8
        np.testing.assert_array_equal(np.asarray(small.out_coords),
                                      np.asarray(full.out_coords)[:8])

    def test_merge_all_invalid(self):
        coords = jnp.zeros((16, 3), jnp.int32)
        valid = jnp.zeros((16,), bool)
        rb = sc.build_submanifold_rulebook_merge(coords, valid, GRID)
        assert not bool(np.asarray(rb.found).any())
        lay = sc.build_strided_layout_merge(
            coords, valid, GRID, (3, 3, 3), (2, 2, 2), (1, 1, 1), 8)
        assert int(lay.num_out) == 0
        assert not bool(np.asarray(lay.found).any())


class TestMaxPoolAndInverse:
    @pytest.mark.parametrize("kernel,stride", [
        ((3, 3, 3), (2, 2, 2)),
        ((2, 2, 2), (2, 2, 2)),
    ])
    def test_max_pool_matches_dense(self, kernel, stride):
        rng = np.random.default_rng(4)
        feats, coords, valid = random_sparse(rng)
        pad = tuple(k // 2 for k in kernel)
        layout = sc.build_strided_layout(coords, valid, GRID, kernel,
                                         stride, pad, max_out=256)
        out = sc.sparse_max_pool(feats, layout)

        # dense oracle: -inf at empty cells (spconv maxes over ACTIVE
        # inputs only — empty cells contribute nothing, not zero)
        dense = np.full(GRID + (feats.shape[-1],), -np.inf, np.float32)
        cz, cy, cx = np.asarray(coords).T
        v = np.asarray(valid)
        dense[cz[v], cy[v], cx[v]] = np.asarray(feats)[v]
        dp = [(p, p) for p in pad]
        ref = np.asarray(jax.lax.reduce_window(
            jnp.asarray(dense), -jnp.inf, jax.lax.max,
            kernel + (1,), stride + (1,), dp + [(0, 0)]))
        oc = np.asarray(layout.out_coords)
        ov = np.asarray(layout.out_valid)
        np.testing.assert_allclose(
            np.asarray(out)[ov], ref[oc[ov, 0], oc[ov, 1], oc[ov, 2]],
            rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out)[~ov], 0)

    def test_inverse_conv_matches_dense_transpose(self):
        rng = np.random.default_rng(5)
        feats, coords, valid = random_sparse(rng, cin=4)
        kernel, stride, pad = (3, 3, 3), (2, 2, 2), (1, 1, 1)
        layout = sc.build_strided_layout(coords, valid, GRID, kernel,
                                         stride, pad, max_out=256)
        cd, cu = 6, 4
        wd = jnp.asarray(rng.normal(size=(27, 4, cd)).astype(np.float32))
        down = sc.strided_sparse_conv(feats, layout, wd)     # [M, cd]
        wu = jnp.asarray(rng.normal(size=(27, cd, cu)).astype(np.float32))
        up = sc.inverse_sparse_conv(down, layout, wu,
                                    num_in=feats.shape[0])

        # dense transpose-conv oracle: out[i] = sum over (o, t) with
        # o*s + t - p == i of down[o] @ wu[t]
        D, H, W = GRID
        og = tuple((g + 2 * p - k) // s + 1
                   for g, p, k, s in zip(GRID, pad, kernel, stride))
        dense_down = np.zeros(og + (cd,), np.float32)
        oc = np.asarray(layout.out_coords)
        ov = np.asarray(layout.out_valid)
        dense_down[oc[ov, 0], oc[ov, 1], oc[ov, 2]] = np.asarray(down)[ov]
        ref = np.zeros((D, H, W, cu), np.float32)
        wun = np.asarray(wu).reshape(3, 3, 3, cd, cu)
        for o in np.argwhere(dense_down.any(-1)):
            for tz in range(3):
                for ty in range(3):
                    for tx in range(3):
                        i = (o[0] * 2 + tz - 1, o[1] * 2 + ty - 1,
                             o[2] * 2 + tx - 1)
                        if all(0 <= i[d] < GRID[d] for d in range(3)):
                            ref[i] += dense_down[tuple(o)] @ wun[tz, ty, tx]
        cz, cy, cx = np.asarray(coords).T
        v = np.asarray(valid)
        np.testing.assert_allclose(
            np.asarray(up)[v], ref[cz[v], cy[v], cx[v]],
            rtol=1e-4, atol=1e-4)
        # padding rows stay zero
        np.testing.assert_array_equal(np.asarray(up)[~v], 0)
