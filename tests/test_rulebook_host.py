"""Host rulebook precompute (C++ + numpy) vs the on-device builders.

The host path must be bit-identical to ops.sparse_conv's device builders —
same offset enumeration, same sorted-unique output ordering, same max_out
truncation — so a SparseMiddle forward with precomputed rulebooks matches
the self-building forward exactly.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu import native  # noqa: E402
from automatic_as_built_reconstruction_tpu.ops import (  # noqa: E402
    rulebook_host as rh, sparse_conv as sc)

GRID = (8, 12, 10)


def random_coords(rng, n_active=60, n_pad=20, grid=GRID):
    D, H, W = grid
    lin = rng.choice(D * H * W, n_active, replace=False)
    coords = np.stack([lin // (H * W), (lin // W) % H, lin % W], 1)
    coords = np.concatenate(
        [coords, np.full((n_pad, 3), -1)]).astype(np.int32)
    return coords


def device_subm(coords, grid, kernel):
    valid = jnp.asarray(coords[:, 0] >= 0)
    rb = sc.build_submanifold_rulebook(jnp.asarray(coords), valid, grid,
                                       kernel)
    return np.asarray(rb.gather_idx), np.asarray(rb.found)


def device_strided(coords, grid, kernel, stride, pad, max_out):
    valid = jnp.asarray(coords[:, 0] >= 0)
    lay = sc.build_strided_layout(jnp.asarray(coords), valid, grid, kernel,
                                  stride, pad, max_out)
    return (np.asarray(lay.out_coords), np.asarray(lay.out_valid),
            np.asarray(lay.gather_idx), np.asarray(lay.found),
            int(lay.num_out))


def assert_rulebook_equal(a_idx, a_found, b_idx, b_found):
    np.testing.assert_array_equal(a_found, b_found)
    np.testing.assert_array_equal(a_idx[a_found], b_idx[b_found])


@pytest.mark.parametrize("kernel", [(3, 3, 3), (1, 3, 3)])
def test_subm_matches_device(kernel):
    rng = np.random.default_rng(0)
    coords = random_coords(rng)
    d_idx, d_found = device_subm(coords, GRID, kernel)
    n_idx, n_found = rh.subm_rulebook_np(coords, GRID, kernel)
    assert_rulebook_equal(n_idx, n_found, d_idx, d_found)
    if native.AVAILABLE:
        c_idx, c_found = rh.subm_rulebook(coords, GRID, kernel)
        assert_rulebook_equal(c_idx, c_found, d_idx, d_found)


@pytest.mark.parametrize("stride,max_out", [
    ((2, 2, 2), 128), ((2, 1, 1), 256),
    ((2, 2, 2), 16),   # truncation: fewer slots than touched outputs
])
def test_strided_matches_device(stride, max_out):
    rng = np.random.default_rng(1)
    coords = random_coords(rng)
    kernel, pad = (3, 3, 3), (1, 1, 1)
    d = device_strided(coords, GRID, kernel, stride, pad, max_out)
    n = rh.strided_layout_np(coords, GRID, kernel, stride, pad, max_out)
    for got, want in [(n[0], d[0]), (n[1], d[1]), (n[4], d[4])]:
        np.testing.assert_array_equal(got, want)
    assert_rulebook_equal(n[2], n[3], d[2], d[3])
    if native.AVAILABLE:
        c = rh.strided_layout(coords, GRID, kernel, stride, pad, max_out)
        for got, want in [(c[0], d[0]), (c[1], d[1]), (c[4], d[4])]:
            np.testing.assert_array_equal(got, want)
        assert_rulebook_equal(c[2], c[3], d[2], d[3])


def test_native_available():
    assert native.AVAILABLE, "native lib should build in this image"


def test_sparse_middle_with_precomputed_rulebooks_matches_self_built():
    from automatic_as_built_reconstruction_tpu.models.middle import (
        SparseMiddle)

    rng = np.random.default_rng(2)
    B, V, F = 2, 96, 4
    grid = (8, 16, 16)
    coords = np.stack([random_coords(rng, 70, V - 70, grid)
                       for _ in range(B)])
    feats = rng.normal(size=(B, V, F)).astype(np.float32)
    feats[coords[..., 0] < 0] = 0

    # the module and the host precompute must share ONE capacity policy
    # (production wires cfg.sparse_capacity_shrink/out_caps into both —
    # builder/input_reader_builder.py); mismatched policies produce
    # different rulebook shapes by design
    mid = SparseMiddle(grid_dhw=grid, num_input_features=F,
                       num_filters=(8, 16), layers_per_block=(1, 1),
                       z_strides=(2, 2), xy_strides=(1, 2),
                       capacity_shrink=0.6, min_capacity=64)
    variables = mid.init(jax.random.key(0), jnp.asarray(feats),
                         jnp.asarray(coords))
    ref = mid.apply(variables, jnp.asarray(feats), jnp.asarray(coords))

    plan = sc.make_plan(grid, V, (8, 16), (1, 1), (2, 2), (1, 2),
                        capacity_shrink=0.6, min_capacity=64)
    flat = [rh.build_middle_rulebooks(coords[b], plan) for b in range(B)]
    stacked = {k: np.stack([f[k] for f in flat]) for k in flat[0]}
    books = rh.unflatten({k: jnp.asarray(v) for k, v in stacked.items()},
                         len(plan))
    out = mid.apply(variables, jnp.asarray(feats), jnp.asarray(coords),
                    rulebooks=books)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
