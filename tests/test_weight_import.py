"""Torch-interop weight import/export (utils/weight_import.py).

Each layout conversion is checked numerically against torch itself
(torch is CPU-only in this container), and the full-model mapping is
checked by round-trip through a lineage-named state_dict.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from automatic_as_built_reconstruction_tpu.utils import weight_import as wi


def test_conv2d_numerics():
    """torch Conv2d(pad=1) == flax conv with the converted kernel."""
    import flax.linen as nn

    torch.manual_seed(0)
    tconv = torch.nn.Conv2d(4, 6, 3, padding=1, bias=False)
    x = np.random.default_rng(0).normal(size=(2, 5, 7, 4)).astype(np.float32)
    with torch.no_grad():
        ty = tconv(torch.tensor(x.transpose(0, 3, 1, 2)))
    ty = ty.numpy().transpose(0, 2, 3, 1)

    kern = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    m = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)), use_bias=False)
    y = m.apply({"params": {"kernel": jnp.asarray(kern)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)


@pytest.mark.parametrize("k", [1, 2, 4])
def test_deconv2d_numerics(k):
    """torch ConvTranspose2d(k=s) == flax ConvTranspose with the
    flip-transposed kernel (transpose_kernel=False, as models/rpn.py)."""
    import flax.linen as nn

    torch.manual_seed(k)
    tconv = torch.nn.ConvTranspose2d(4, 6, k, stride=k, bias=False)
    x = np.random.default_rng(k).normal(size=(1, 6, 6, 4)).astype(np.float32)
    with torch.no_grad():
        ty = tconv(torch.tensor(x.transpose(0, 3, 1, 2)))
    ty = ty.numpy().transpose(0, 2, 3, 1)

    w = tconv.weight.detach().numpy()                   # (I, O, kh, kw)
    kern = np.flip(w.transpose(2, 3, 0, 1), (0, 1)).copy()
    m = nn.ConvTranspose(6, (k, k), strides=(k, k), use_bias=False)
    y = m.apply({"params": {"kernel": jnp.asarray(kern)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)


def test_batchnorm_numerics():
    """torch BatchNorm2d (eval) == flax BatchNorm with imported stats."""
    import flax.linen as nn

    torch.manual_seed(1)
    tbn = torch.nn.BatchNorm2d(5, eps=1e-3).eval()
    with torch.no_grad():
        tbn.weight.mul_(1.7).add_(0.3)
        tbn.bias.add_(0.1)
        tbn.running_mean.add_(0.5)
        tbn.running_var.mul_(2.0)
    x = np.random.default_rng(1).normal(size=(2, 4, 4, 5)).astype(np.float32)
    with torch.no_grad():
        ty = tbn(torch.tensor(x.transpose(0, 3, 1, 2)))
    ty = ty.numpy().transpose(0, 2, 3, 1)

    m = nn.BatchNorm(use_running_average=True, epsilon=1e-3)
    y = m.apply(
        {"params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                    "bias": jnp.asarray(tbn.bias.detach().numpy())},
         "batch_stats": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                         "var": jnp.asarray(tbn.running_var.numpy())}},
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ty, atol=1e-5)


def _active_grid(rng, n, grid_dhw):
    """n unique active (z, y, x) sites + features on a small grid."""
    D, H, W = grid_dhw
    keys = rng.choice(D * H * W, size=n, replace=False)
    coords = np.stack([keys // (H * W), (keys // W) % H, keys % W],
                      1).astype(np.int32)
    feats = rng.normal(size=(n, 4)).astype(np.float32)
    return coords, feats


def test_spconv_subm_matches_torch_conv3d():
    """Submanifold conv with a lineage-layout (kz,ky,kx,I,O) weight ==
    dense torch conv3d sampled at the active sites (inactive inputs are
    zero, so the sums coincide) — validates the z-major tap order AND
    cross-correlation semantics end-to-end."""
    from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(3)
    grid = (5, 6, 7)
    coords, feats = _active_grid(rng, 40, grid)
    w_lineage = rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32)

    w_ours = wi._import_spconv(w_lineage, (27, 4, 6))
    valid = jnp.ones((40,), bool)
    rb = sc.build_submanifold_rulebook(jnp.asarray(coords), valid, grid)
    y = sc.submanifold_conv(jnp.asarray(feats), rb, jnp.asarray(w_ours),
                            None, valid)

    dense = np.zeros((1, 4) + grid, np.float32)
    dense[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    tw = torch.tensor(w_lineage.transpose(4, 3, 0, 1, 2))  # (O,I,kz,ky,kx)
    with torch.no_grad():
        ty = torch.nn.functional.conv3d(torch.tensor(dense), tw,
                                        padding=1).numpy()
    # NB: the scalar 0 and the coord arrays are separated by the ':'
    # slice, so numpy puts the broadcast advanced dim first -> (n, O)
    ref = ty[0, :, coords[:, 0], coords[:, 1], coords[:, 2]]
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_spconv_v2_layout_import():
    """spconv 2.x (O, kz, ky, kx, I) import == 1.x import."""
    rng = np.random.default_rng(4)
    w1 = rng.normal(size=(3, 3, 3, 4, 6)).astype(np.float32)
    w2 = w1.transpose(4, 0, 1, 2, 3)                    # OKKKI
    np.testing.assert_array_equal(wi._import_spconv(w1, (27, 4, 6)),
                                  wi._import_spconv(w2, (27, 4, 6)))


def _tiny_fhd_variables():
    """A small sparse VoxelNet (FHD-style plan) variables tree."""
    import dataclasses

    from automatic_as_built_reconstruction_tpu.models import voxelnet as vm

    cfg = vm.VoxelNetConfig(
        num_input_features=4, vfe_name="SimpleVoxel",
        middle_name="SpMiddleFHD",
        middle_blocks=(
            (1, 8, 8, (3, 3, 3), (2, 2, 2), (1, 1, 1)),
            (1, 8, 16, (3, 1, 1), (2, 1, 1), (0, 0, 0))),
        middle_zpad=1,
        grid_size=(16, 16, 4), voxel_size=(0.1, 0.1, 0.25),
        pc_range=(0, -0.8, -0.5, 1.6, 0.8, 0.5),
        rpn_layer_nums=(1, 1), rpn_layer_strides=(1, 2),
        rpn_num_filters=(16, 16), rpn_upsample_strides=(1, 2),
        rpn_num_upsample_filters=(16, 16),
        num_class=1, num_anchor_per_loc=2)
    model = vm.VoxelNet(cfg=cfg)
    vox = jnp.ones((1, 32, 5, 4))
    npts = jnp.ones((1, 32), jnp.int32)
    crd = jnp.zeros((1, 32, 3), jnp.int32)
    variables = model.init(jax.random.key(0), vox, npts, crd)
    return model, cfg, variables, (vox, npts, crd)


def test_full_model_roundtrip():
    """export -> lineage-named dict -> import reproduces the tree, and
    the imported model's predictions are bit-identical."""
    model, cfg, variables, args = _tiny_fhd_variables()

    sd = wi.to_torch_state_dict(variables)
    # every key follows the lineage module naming
    assert all(k.startswith(("voxel_feature_extractor.",
                             "middle_feature_extractor.middle_conv.",
                             "rpn.")) for k in sd), sorted(sd)[:5]
    assert any(k.startswith("rpn.blocks.0.1.") for k in sd)
    assert any(k.startswith("rpn.deblocks.1.0.") for k in sd)
    assert "rpn.conv_box.bias" in sd

    # perturb through torch tensors (exercises _to_np) and import back
    sd_t = {k: torch.tensor(v * (1.0 if "running" in k else 1.0))
            for k, v in sd.items()}
    imported = wi.from_torch_state_dict(sd_t, variables)

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(imported)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=jax.tree_util.keystr(pa))

    out_a = model.apply(variables, *args, train=False)
    out_b = model.apply(imported, *args, train=False)
    for k in out_a:
        np.testing.assert_array_equal(np.asarray(out_a[k]),
                                      np.asarray(out_b[k]))


def test_missing_key_strict():
    _, _, variables, _ = _tiny_fhd_variables()
    sd = wi.to_torch_state_dict(variables)
    key = next(k for k in sd if k.startswith("rpn.blocks"))
    del sd[key]
    with pytest.raises(KeyError):
        wi.from_torch_state_dict(sd, variables)
    # non-strict fills what it can
    wi.from_torch_state_dict(sd, variables, strict=False)


def test_import_cli_to_checkpoint(tmp_path):
    """A torch-saved lineage checkpoint -> import_torch_weights ->
    orbax checkpoint that evaluate()/train() restore at step 0."""
    from automatic_as_built_reconstruction_tpu.train import (
        checkpoint as ckpt_mod)
    from automatic_as_built_reconstruction_tpu.train import train as tm
    from tests.test_train_runtime import SPARSE_MICRO_CONFIG

    cfg_path = tmp_path / "micro_sparse.config"
    cfg_path.write_text(SPARSE_MICRO_CONFIG)
    model_dir = tmp_path / "run"

    bundle = tm.Bundle(cfg_path)
    state0, _ = tm.init_state(bundle, rng_seed=7)
    sd = wi.to_torch_state_dict(
        {"params": state0["params"], "batch_stats": state0["batch_stats"]})
    ckpt = tmp_path / "voxelnet-1234.tckpt"
    torch.save({k: torch.tensor(np.array(v)) for k, v in sd.items()}, ckpt)

    tm.import_torch_weights(cfg_path, model_dir, ckpt)

    fresh, _ = tm.init_state(bundle, rng_seed=0)
    restored, step = ckpt_mod.try_restore_latest(model_dir, fresh)
    assert step == 0 and restored is not None
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(state0["params"]),
            jax.tree_util.tree_leaves_with_path(restored["params"])):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=jax.tree_util.keystr(pa))


def test_pillar_model_roundtrip():
    """PillarFeatureNet path: pfn_layers naming + linear transpose."""
    from __graft_entry__ import _flagship_cfg
    from automatic_as_built_reconstruction_tpu.models import voxelnet as vm

    cfg = _flagship_cfg()
    model = vm.VoxelNet(cfg=cfg)
    vox = jnp.ones((1, 64, 8, 4))
    npts = jnp.ones((1, 64), jnp.int32)
    crd = jnp.zeros((1, 64, 3), jnp.int32)
    variables = model.init(jax.random.key(0), vox, npts, crd)

    sd = wi.to_torch_state_dict(variables)
    assert any(k.startswith("voxel_feature_extractor.pfn_layers.0.linear")
               for k in sd)
    imported = wi.from_torch_state_dict(sd, variables)
    out_a = model.apply(variables, vox, npts, crd, train=False)
    out_b = model.apply(imported, vox, npts, crd, train=False)
    for k in out_a:
        np.testing.assert_array_equal(np.asarray(out_a[k]),
                                      np.asarray(out_b[k]))
