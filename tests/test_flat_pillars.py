"""Flat (point-major) pillar path parity vs the padded [V, T, C] path.

The flat path (ops.voxelize_jax.voxelize_flat + PillarFeatureNet flat
mode) exists because the padded pillar intermediates are >90% zeros —
a pure HBM-bandwidth tax on TPU.  Its contract is exact eval-mode
equality with the padded path.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from automatic_as_built_reconstruction_tpu.models.voxelnet import (  # noqa: E402,E501
    VoxelNet)
from automatic_as_built_reconstruction_tpu.ops import voxelize_jax  # noqa: E402,E501

from test_model import PC_RANGE, VOXEL_SIZE, GRID, make_scene, tiny_cfg

VKW = dict(voxel_size=VOXEL_SIZE, pc_range=PC_RANGE, grid_size=GRID)


def _scene(seed=0, n=1400):
    rng = np.random.default_rng(seed)
    gt = np.array([[5.0, 2.0, -1.7, 1.6, 3.9, 1.56, 0.3],
                   [11.0, -4.0, -1.7, 1.6, 3.9, 1.56, np.pi / 2]],
                  np.float32)
    pts = make_scene(rng, gt)
    out = np.zeros((n, 4), np.float32)
    out[: len(pts)] = pts[:n]
    return out, min(len(pts), n)


@pytest.mark.parametrize("first_appearance", [False, True])
def test_voxelize_flat_matches_padded(first_appearance):
    pts, nv = _scene(3)
    T, V = 6, 256
    pad = voxelize_jax.voxelize(
        jnp.asarray(pts), jnp.int32(nv), max_points=T, max_voxels=V,
        first_appearance=first_appearance, **VKW)
    flat = voxelize_jax.voxelize_flat(
        jnp.asarray(pts), jnp.int32(nv), max_points=T, max_voxels=V,
        first_appearance=first_appearance, **VKW)

    assert int(flat.num_voxels) == int(pad.num_voxels)
    np.testing.assert_array_equal(np.asarray(flat.coords),
                                  np.asarray(pad.coords))
    np.testing.assert_array_equal(np.asarray(flat.num_points),
                                  np.asarray(pad.num_points))

    # scatter the flat points back into a [V, T, C] grid: must equal the
    # padded voxels as SETS per voxel (both honor the same FCFS T cap;
    # flat keeps sort order within a cell, which is FCFS by stability)
    fp, slot = np.asarray(flat.points), np.asarray(flat.slot)
    rebuilt = np.zeros((V, T, 4), np.float32)
    fill = np.zeros((V,), np.int64)
    for p in range(fp.shape[0]):
        s = slot[p]
        if s < V:
            rebuilt[s, fill[s]] = fp[p]
            fill[s] += 1
    np.testing.assert_allclose(rebuilt, np.asarray(pad.voxels), atol=0)
    np.testing.assert_array_equal(fill, np.asarray(pad.num_points))


def test_flat_pillar_forward_parity():
    cfg = tiny_cfg(pillar_scatter_sorted=False)
    model = VoxelNet(cfg=cfg)
    T, V, B = 6, 256, 2

    pads, flats = [], []
    for b in range(B):
        pts, nv = _scene(seed=10 + b)
        pads.append(voxelize_jax.voxelize(
            jnp.asarray(pts), jnp.int32(nv), max_points=T, max_voxels=V,
            first_appearance=False, **VKW))
        flats.append(voxelize_jax.voxelize_flat(
            jnp.asarray(pts), jnp.int32(nv), max_points=T, max_voxels=V,
            first_appearance=False, **VKW))
    stack = lambda xs: jnp.stack(xs)  # noqa: E731
    voxels = stack([p.voxels for p in pads])
    num_points = stack([p.num_points for p in pads])
    coords = stack([p.coords for p in pads])
    fpts = stack([f.points for f in flats])
    fslot = stack([f.slot for f in flats])

    variables = model.init(jax.random.key(0), voxels[:1, :32],
                           num_points[:1, :32], coords[:1, :32])
    out_pad = model.apply(variables, voxels, num_points, coords,
                          train=False)
    out_flat = model.apply(variables, None, num_points, coords,
                           train=False, flat_points=fpts, flat_slot=fslot,
                           flat_slots_sorted=True)
    assert set(out_pad) == set(out_flat)
    for k in out_pad:
        np.testing.assert_allclose(np.asarray(out_flat[k]),
                                   np.asarray(out_pad[k]),
                                   rtol=1e-5, atol=1e-5)


def test_flat_mode_rejects_multilayer_pfn():
    cfg = tiny_cfg(vfe_num_filters=(8, 16))
    model = VoxelNet(cfg=cfg)
    pts, nv = _scene(2)
    pad = voxelize_jax.voxelize(
        jnp.asarray(pts), jnp.int32(nv), max_points=4, max_voxels=64,
        first_appearance=False, **VKW)
    flat = voxelize_jax.voxelize_flat(
        jnp.asarray(pts), jnp.int32(nv), max_points=4, max_voxels=64,
        first_appearance=False, **VKW)
    variables = model.init(jax.random.key(0), pad.voxels[None, :16],
                           pad.num_points[None, :16], pad.coords[None, :16])
    with pytest.raises(NotImplementedError):
        model.apply(variables, None, pad.num_points[None],
                    pad.coords[None], train=False,
                    flat_points=flat.points[None],
                    flat_slot=flat.slot[None], flat_slots_sorted=True)


def test_segment_scan_matches_segment_ops():
    """PillarFeatureNet.segment_scan (boundary cumsum + segmented-scan
    max, scatter-free) is numerically equivalent to the jax.ops.segment_*
    path on sorted flat slots."""
    import dataclasses

    import jax
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from automatic_as_built_reconstruction_tpu.models.voxelnet import (
        VoxelNet)
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    cfg = _flagship_cfg(tiny=True)
    rng = np.random.default_rng(0)
    B, P = 2, 600
    pts = np.concatenate([
        rng.uniform([0, -8, -3], [16, 8, 1], (B, P, 3)),
        rng.random((B, P, 1))], axis=-1).astype(np.float32)
    num_valid = np.full((B,), P, np.int32)
    r = jax.vmap(lambda p, n: voxelize_jax.voxelize_flat(
        p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
        grid_size=cfg.grid_size, max_points=8, max_voxels=256,
        first_appearance=False))(pts, num_valid)

    outs = {}
    for scan in (False, True):
        c = dataclasses.replace(cfg, flat_segment_scan=scan)
        model = VoxelNet(cfg=c)
        variables = model.init(
            jax.random.key(0),
            np.zeros((1, 16, 8, pts.shape[-1]), np.float32),
            np.asarray(r.num_points[:1, :16]),
            np.asarray(r.coords[:1, :16]))
        preds = model.apply(variables, None, r.num_points, r.coords,
                            train=False, flat_points=r.points,
                            flat_slot=r.slot, flat_slots_sorted=True)
        outs[scan] = preds
    for k in outs[False]:
        np.testing.assert_allclose(
            np.asarray(outs[False][k], np.float32),
            np.asarray(outs[True][k], np.float32),
            rtol=2e-2, atol=2e-3, err_msg=k)


def test_segment_scan_sum_precision_at_scale():
    """The relative-coordinate cumsum keeps per-pillar means accurate at
    serving scale (raw-coordinate prefix-sum differencing loses ~cm at
    P=60k; code-review r5 finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    P, V = 60000, 12000
    slot = np.sort(rng.integers(0, V, P)).astype(np.int32)
    xyz = np.stack([rng.uniform(0, 70, P), rng.uniform(-40, 40, P),
                    rng.uniform(-3, 1, P)], 1).astype(np.float32)

    sidx = jnp.arange(V)
    starts = jnp.searchsorted(jnp.asarray(slot), sidx, side="left")
    ends = jnp.searchsorted(jnp.asarray(slot), sidx, side="right")
    ref = jnp.asarray(xyz)[jnp.minimum(starts, P - 1)]
    rel = jnp.asarray(xyz) - ref[slot]
    cs = jnp.concatenate([jnp.zeros((1, 3), jnp.float32),
                          jnp.cumsum(rel, axis=0)], 0)
    n = np.maximum(np.bincount(slot, minlength=V), 1)[:, None]
    means = np.asarray(ref + (cs[ends] - cs[starts]) / n)

    # float64 oracle
    want = np.zeros((V, 3))
    np.add.at(want, slot, xyz.astype(np.float64))
    want /= n
    occ = np.bincount(slot, minlength=V) > 0
    err = np.abs(means[occ] - want[occ]).max()
    assert err < 2e-3, f"pillar-mean error {err} m at P={P}"
