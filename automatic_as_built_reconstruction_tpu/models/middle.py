"""Middle feature extractors: voxel features -> dense BEV canvas.

Two families:
- ``PointPillarsScatter`` (in ``pointpillars.py``): zero-depth scatter.
- 3D middle extractors (this file): consume (voxel_features, coords) over a
  [D, H, W] grid, downsample z, emit [B, H', W', C*D'] BEV features.
  ``DenseMiddle`` scatters into a dense 5-D tensor and runs XLA 3D convs —
  exact semantics, fine for small grids and as the parity oracle for the
  sparse path.  ``SpMiddle*`` (ops/sparse_conv) is the TPU sparse
  gather-GEMM-scatter pipeline for full-size grids.

[ref: second/pytorch/models/middle.py (SpMiddleFHD et al.) — UNVERIFIED]
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse_conv as sc
from ..ops.pallas import sparse_gather_gemm as sgg


def scatter_to_dense(voxel_features, coords, grid_dhw):
    """[B,V,F] + [B,V,3] (z,y,x; -1 pad) -> dense [B, D, H, W, F]."""
    B, V, F = voxel_features.shape
    D, H, W = grid_dhw
    valid = coords[..., 0] >= 0
    lin = ((coords[..., 0] * H + coords[..., 1]) * W + coords[..., 2])
    lin = jnp.where(valid, lin, D * H * W)
    dense = jnp.zeros((B, D * H * W + 1, F), voxel_features.dtype)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
    dense = dense.at[bidx, lin].set(
        jnp.where(valid[..., None], voxel_features, 0.0))
    return dense[:, : D * H * W].reshape(B, D, H, W, F)


class DenseMiddle(nn.Module):
    """Dense 3D-conv middle extractor (reference semantics of SpMiddleFHD).

    Conv plan per block: optional submanifold-style stride-1 convs then one
    strided conv (z always downsampled; xy per ``xy_strides``).  Final
    output reshapes depth into channels: [B, H', W', C * D'].
    """

    grid_dhw: Tuple[int, int, int]  # (D, H, W) input grid
    num_input_features: int = 4
    num_filters: Sequence[int] = (16, 32, 64)
    layers_per_block: Sequence[int] = (2, 2, 2)
    z_strides: Sequence[int] = (2, 2, 2)
    xy_strides: Sequence[int] = (1, 1, 2)

    @nn.compact
    def __call__(self, voxel_features, coords, *, train: bool = False):
        x = scatter_to_dense(voxel_features, coords, self.grid_dhw)
        for f, n, zs, xys in zip(self.num_filters, self.layers_per_block,
                                 self.z_strides, self.xy_strides):
            for _ in range(n):
                x = nn.Conv(f, (3, 3, 3), padding=1, use_bias=False)(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3)(x)
                x = nn.relu(x)
            x = nn.Conv(f, (3, 3, 3), strides=(zs, xys, xys), padding=1,
                        use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3)(x)
            x = nn.relu(x)
        B, D, H, W, C = x.shape
        return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over sparse rows [B, N, C] with a validity mask.

    Statistics are computed over valid rows only (padding must not bias
    them); running stats live in the ``batch_stats`` collection like
    ``nn.BatchNorm``.
    """

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, *, train: bool):
        C = x.shape[-1]
        in_dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        x = x.astype(jnp.float32)   # stats + normalization in fp32
        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=(0, 1)) / cnt
            var = (jnp.square(x - mean) * m).sum(axis=(0, 1)) / cnt
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(in_dtype)


def _sparse_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-style init for [K, Cin, Cout] sparse conv kernels."""
    fan_in = shape[0] * shape[1]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.truncated_normal(key, -2, 2, shape, dtype) * std


class SparseMiddle(nn.Module):
    """Sparse 3D middle extractor — SpMiddleFHD-equivalent stack.

    Per block: ``n_subm`` submanifold convs (one shared rulebook) then one
    strided SparseConv; after the last block the remaining active sites are
    scattered to a dense BEV map with depth folded into channels.

    [ref: second/pytorch/models/middle.py::SpMiddleFHD — UNVERIFIED]
    """

    grid_dhw: Tuple[int, int, int]
    num_input_features: int = 4
    num_filters: Sequence[int] = (16, 32, 64)
    layers_per_block: Sequence[int] = (2, 2, 2)
    z_strides: Sequence[int] = (2, 2, 2)
    xy_strides: Sequence[int] = (1, 1, 2)
    # explicit lineage layer plan (tuple of ops.sparse_conv.BlockSpec);
    # overrides the four parameterized fields above when set — this is how
    # SpMiddleFHD et al. get their exact per-variant architectures
    # (models/middle_plans.py)
    blocks: Tuple[sc.BlockSpec, ...] | None = None
    # active-site capacity multiplier applied after each strided conv.
    # None -> expansion-aware heuristic (a strided SparseConv DILATES
    # the active set, ~3x at the first downsample); explicit per-block
    # ``out_caps`` measured from data (ops.sparse_conv.measure_site_caps)
    # are preferred for production — watch the mid_capacity_saturated
    # training metric (see plan_from_specs for the truncation failure
    # mode that pinned the synthetic-KITTI FHD run at prior loss)
    capacity_shrink: float | None = None
    out_caps: Tuple[int, ...] | None = None
    min_capacity: int = 2048
    # compute dtype for gathers + GEMMs (bfloat16 halves the gather
    # bandwidth and runs the GEMMs at MXU rate; BN stats stay fp32)
    dtype: jnp.dtype = jnp.float32
    # route the gather-GEMM through the Pallas windowed-DMA kernel
    # (per-tile HBM->VMEM feature windows + one-hot MXU gathers; see
    # ops/pallas/sparse_gather_gemm.py) instead of the XLA fused gather
    use_pallas_gemm: bool = False
    # Pallas kernel tiling: rows per output tile and DMA window size;
    # size the window from real rulebooks with sgg.choose_window —
    # over-span tiles silently fall back to XLA (check sgg.pallas_fits)
    pallas_tile: int = 256
    # one global window, or a per-BLOCK tuple (len == number of blocks):
    # the one-hot gather does tile*window*Cin work per tap, so blocks
    # with tight key spans should not pay the worst block's window.
    # A per-block entry may itself be a (subm, strided) PAIR giving the
    # strided join its own window — measured strided spans are ~3-5x
    # tighter than the xy-area-scaled default (tools/span_analysis.py)
    pallas_window: int | Tuple = 768
    # per-tap SUBWINDOW for the key-match kernel (0 = off): each tap
    # compares/gathers only this many rows of the shared per-tile DMA
    # window (sgg.keymatch_gemm subwindow arg) — single-tap spans are
    # ~1.5-3x tighter than the K-tap union.  Same structure as
    # pallas_window: int, per-block tuple, or (subm, strided) pairs;
    # size with sgg.choose_keymatch_subwindow
    keymatch_subwindow: int | Tuple = 0
    # grouped-tap key-match kernel (requires keymatch_subwindow): taps
    # differing only in dz share one per-(group, tile) subwindow (a dz
    # shift moves a depth-minor key by +-1), so each (dy, dx) group's
    # kz one-hot matrices stack into ONE gather matmul + ONE accumulate
    # matmul — kz-fold fewer, kz-fold larger MXU ops at identical MACs.
    # The tap permutation (sgg.group_perm) is applied to the query keys
    # and weights here; results are exact either way.
    keymatch_group: bool = False
    # key-match serving mode: skip building rulebooks entirely — the
    # Pallas kernel joins sorted input keys against per-tap query keys
    # with an in-VMEM equality compare (sgg.keymatch_gemm).  The only
    # remaining per-scan construction is the strided blocks' output-SITE
    # sort.  Requires use_pallas_gemm; ignored when host rulebooks are
    # supplied.  ~0 rulebook cost vs ~27 ms/scan for the merge builders
    # at FHD scale.
    use_keymatch: bool = False
    # HBM budget for the on-device LUT rulebook builders: each builder
    # materializes a [D*H*W] int32 table PER EXAMPLE under vmap (~370 MB
    # at the 41x1600x1408 FHD grid), so batch * cells * 4 bytes of
    # transient HBM.  Blocks exceeding the budget use the sort-based
    # builders instead (no table, ~10x slower construction).
    lut_hbm_budget_bytes: int = 2 << 30
    # run the LAST N blocks dense: scatter the remaining active sites
    # into a dense [D, H, W, C] grid once and finish with plain XLA 3D
    # convs + active-site masks (exact submanifold/strided semantics —
    # masking after every conv reproduces the sparse outputs at active
    # sites, see tests).  After 2-3 downsamples the active-site density
    # reaches 4-20% (tools/span_analysis.py) and the one-hot gather's
    # tile*window*Cin MXU cost exceeds a dense conv's cells*K*Cin —
    # e.g. the FHD block-3 subm stack costs ~214 GMACs sparse vs
    # ~59 GMACs dense.  Weights/BN are SHARED with the sparse path
    # (same param names), so any checkpoint runs either way.
    dense_tail_blocks: int = 0

    def _conv_params(self, name, k, cin, cout):
        w = self.param(f"{name}_w", _sparse_kernel_init, (k, cin, cout))
        return w

    def plan(self, v_cap: int):
        if self.blocks is not None:
            specs = tuple(sc.BlockSpec(*b) for b in self.blocks)
            return sc.plan_from_specs(self.grid_dhw, v_cap, specs,
                                      self.capacity_shrink,
                                      self.min_capacity, self.out_caps)
        return sc.make_plan(self.grid_dhw, v_cap, self.num_filters,
                            self.layers_per_block, self.z_strides,
                            self.xy_strides, self.capacity_shrink,
                            self.min_capacity, self.out_caps)

    @nn.compact
    def __call__(self, voxel_features, coords, *, train: bool = False,
                 rulebooks=None):
        """[B, V, F] + [B, V, 3] (z,y,x; -1 pad) -> [B, H', W', C*D'].

        ``rulebooks``: optional precomputed per-block
        ``(SubmanifoldRulebook, StridedSparseLayout)`` pairs (batch-leading;
        built on host by ``ops.rulebook_host`` — the spconv-style
        getIndicePairs precompute).  When absent they are built on device.
        """
        B, V, F = voxel_features.shape
        feats = voxel_features.astype(self.dtype)
        cur_coords = coords
        valid = coords[..., 0] >= 0
        cin = F
        use_km = (self.use_keymatch and self.use_pallas_gemm
                  and rulebooks is None)

        plan = self.plan(V)
        dense_from = (len(plan) - self.dense_tail_blocks
                      if self.dense_tail_blocks > 0 else len(plan))
        x = mask = None   # dense-tail carriers

        for bi, blk in enumerate(plan):
            if bi >= dense_from:
                if x is None:   # transition: scatter sparse -> dense once
                    x = scatter_to_dense(feats, cur_coords, blk.grid)
                    mask = scatter_to_dense(
                        jnp.ones((B, feats.shape[1], 1), self.dtype),
                        cur_coords, blk.grid)
                x, mask, cin = self._dense_block(x, mask, blk, bi, cin,
                                                 train)
                self.sow("intermediates", f"b{bi}_capacity_saturated",
                         jnp.zeros((), jnp.int32))   # dense: no caps
                continue
            # a tile of STRIDED output sites covers stride_y*stride_x
            # times the xy area in input space, so the strided join's
            # default window scales with the xy downsampling factor;
            # explicit (subm, strided) pairs override that with the
            # (much tighter) measured strided spans
            xy_area = int(blk.stride[1] * blk.stride[2])

            def _per_join(val, mult=xy_area):
                v = (val[bi] if isinstance(val, (tuple, list))
                     else val)
                if isinstance(v, (tuple, list)):
                    return int(v[0]), int(v[1])
                return int(v), int(v) * mult

            win_b, win_str = _per_join(self.pallas_window)
            sub_b, sub_str = _per_join(self.keymatch_subwindow)
            # grouped-tap mode: group size = the kernel's z extent
            # (taps of one (dy, dx) column differ only in dz); the tap
            # permutation below is applied to query keys AND weights
            g_subm = (int(blk.subm_kernel[0])
                      if self.keymatch_group and sub_b else 1)
            g_str = (int(blk.kernel[0])
                     if self.keymatch_group and sub_str else 1)
            perm_subm = (sgg.group_perm(blk.subm_kernel)
                         if g_subm > 1 else None)
            perm_str = (sgg.group_perm(blk.kernel)
                        if g_str > 1 else None)
            # submanifold stack (shared rulebook per block)
            rb = layout = sites = None
            qk_subm = qk_str = in_keys = None
            if rulebooks is not None:
                rb, layout = rulebooks[bi]
            elif use_km:
                # no rulebooks at all: the kernel joins keys in-VMEM.
                # linearize maps padding (-1 coords) to INT32_MAX, which
                # both the window decision and the kernel treat as
                # no-query/no-match sentinels.
                in_keys = jax.vmap(
                    functools.partial(sc.linearize,
                                      grid_dhw=blk.grid))(cur_coords)
                if blk.n_subm > 0:
                    qk_subm = jax.vmap(functools.partial(
                        sc.subm_tap_keys, grid_dhw=blk.grid,
                        kernel_size=blk.subm_kernel))(cur_coords, valid)
                    if perm_subm is not None:
                        qk_subm = qk_subm[:, perm_subm]
                sites = jax.vmap(functools.partial(
                    sc.build_strided_sites, grid_dhw=blk.grid,
                    kernel_size=blk.kernel, stride=blk.stride,
                    padding=blk.pad,
                    max_out=blk.out_cap))(cur_coords, valid)
                qk_str = jax.vmap(functools.partial(
                    sc.strided_tap_keys, grid_in=blk.grid,
                    kernel_size=blk.kernel, stride=blk.stride,
                    padding=blk.pad))(sites)
                if perm_str is not None:
                    qk_str = qk_str[:, perm_str]
            else:
                # merge-join on-device construction: one combined sort +
                # cummax per rulebook — grid-size independent (no
                # [D*H*W] tables, no per-query binary search).  Matches
                # the dense-LUT builders' speed at the FHD stack (27 ms
                # for all four blocks on v5e) WITHOUT the ~370 MB/example
                # transient LUT, and beats them on big-grid blocks
                # (strided block0: 4.2 ms vs 10.5 ms)
                subm_builder = sc.build_submanifold_rulebook_merge
                strided_builder = sc.build_strided_layout_merge
                rb = None
                if blk.n_subm > 0:
                    rb = jax.vmap(functools.partial(
                        subm_builder, grid_dhw=blk.grid,
                        kernel_size=blk.subm_kernel))(cur_coords, valid)
                layout = jax.vmap(functools.partial(
                    strided_builder, grid_dhw=blk.grid,
                    kernel_size=blk.kernel, stride=blk.stride,
                    padding=blk.pad,
                    max_out=blk.out_cap))(cur_coords, valid)
            k_subm = int(np.prod(blk.subm_kernel))
            for li in range(blk.n_subm):
                w = self._conv_params(f"b{bi}_subm{li}", k_subm, cin,
                                      blk.subm_channels)
                if use_km:
                    wd = w.astype(self.dtype)
                    if perm_subm is not None:
                        wd = wd[perm_subm]
                    feats = jax.lax.map(
                        lambda a: sgg.keymatch_gemm(
                            a[0], a[1], a[2], wd, None,
                            self.pallas_tile, win_b, True, sub_b,
                            g_subm),
                        (feats, in_keys, qk_subm))
                    feats = jnp.where(valid[..., None], feats, 0.0).astype(
                        self.dtype)
                elif self.use_pallas_gemm:
                    # lax.map, not vmap: the kernel wrapper's lax.cond
                    # (pallas vs XLA fallback) must stay a cond — vmap
                    # would lower it to a both-branches select
                    wd = w.astype(self.dtype)
                    feats = jax.lax.map(
                        lambda a: sgg.gather_gemm(
                            a[0], a[1], a[2], wd, None,
                            self.pallas_tile, win_b),
                        (feats, rb.gather_idx, rb.found))
                    feats = jnp.where(valid[..., None], feats, 0.0).astype(
                        self.dtype)
                else:
                    feats = jax.vmap(sc.submanifold_conv,
                                     in_axes=(0, 0, None, None, 0))(
                        feats, rb, w.astype(self.dtype), None, valid)
                feats = MaskedBatchNorm(name=f"b{bi}_subm{li}_bn")(
                    feats, valid, train=train)
                feats = nn.relu(feats) * valid[..., None]
                cin = blk.subm_channels
            # strided downsample conv
            k_down = int(np.prod(blk.kernel))
            w = self._conv_params(f"b{bi}_down", k_down, cin, blk.cout)
            if use_km:
                wd = w.astype(self.dtype)
                if perm_str is not None:
                    wd = wd[perm_str]
                feats = jax.lax.map(
                    lambda a: sgg.keymatch_gemm(
                        a[0], a[1], a[2], wd, None,
                        self.pallas_tile, win_str, True, sub_str,
                        g_str),
                    (feats, in_keys, qk_str))
                out_valid, out_coords = sites.out_valid, sites.out_coords
                num_out = sites.num_out
                feats = jnp.where(out_valid[..., None], feats,
                                  0.0).astype(self.dtype)
            elif self.use_pallas_gemm:
                wd = w.astype(self.dtype)
                feats = jax.lax.map(
                    lambda a: sgg.gather_gemm(
                        a[0], a[1], a[2], wd, None,
                        self.pallas_tile, win_b),
                    (feats, layout.gather_idx, layout.found))
                out_valid, out_coords = layout.out_valid, layout.out_coords
                num_out = layout.num_out
                feats = jnp.where(out_valid[..., None], feats,
                                  0.0).astype(self.dtype)
            else:
                feats = jax.vmap(sc.strided_sparse_conv,
                                 in_axes=(0, 0, None))(feats, layout,
                                                       w.astype(self.dtype))
                out_valid, out_coords = layout.out_valid, layout.out_coords
                num_out = layout.num_out
            # overflow telemetry: a block whose active-site count hit its
            # static capacity has (almost surely) truncated real sites —
            # surfaced into training metrics (train.py) so capacity_shrink
            # regressions are visible instead of silently eating recall
            self.sow("intermediates", f"b{bi}_capacity_saturated",
                     jnp.sum((num_out >= blk.out_cap).astype(jnp.int32)))
            cur_coords = out_coords
            valid = out_valid
            feats = MaskedBatchNorm(name=f"b{bi}_down_bn")(
                feats, valid, train=train)
            feats = nn.relu(feats) * valid[..., None]
            cin = blk.cout
            final_grid = blk.out_grid

        if x is not None:   # dense tail: the grid IS the BEV source
            Bx, Dx, Hx, Wx, Cx = x.shape
            return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(
                Bx, Hx, Wx, Dx * Cx)
        bev = jax.vmap(functools.partial(
            sc.scatter_to_bev, grid_dhw=final_grid))(feats, cur_coords, valid)
        return bev

    def _dense_block(self, x, mask, blk, bi: int, cin: int, train: bool):
        """One middle block on the dense [B, D, H, W, C] carrier.

        Exact sparse semantics: inactive cells are zero, every conv
        output is re-masked to the active set, and the strided conv's
        output mask is the dilation of the input mask by the kernel
        footprint (= the sparse builders' output sites, minus their
        static capacity truncation).  Weights and MaskedBatchNorm
        variables use the sparse path's names, so checkpoints are
        interchangeable between paths.
        """
        dn = ("NDHWC", "DHWIO", "NDHWC")

        def bn_relu(x, mask, name):
            Bx = x.shape[0]
            C = x.shape[-1]
            flat = MaskedBatchNorm(name=name)(
                x.reshape(Bx, -1, C),
                mask.reshape(Bx, -1) > 0, train=train)
            return nn.relu(flat.reshape(x.shape))

        k_subm = int(np.prod(blk.subm_kernel))
        for li in range(blk.n_subm):
            w = self._conv_params(f"b{bi}_subm{li}", k_subm, cin,
                                  blk.subm_channels)
            x = jax.lax.conv_general_dilated(
                x, w.reshape(tuple(blk.subm_kernel)
                             + (cin, blk.subm_channels)).astype(self.dtype),
                window_strides=(1, 1, 1),
                padding=[(k // 2, k // 2) for k in blk.subm_kernel],
                dimension_numbers=dn,
                preferred_element_type=jnp.float32).astype(self.dtype)
            x = bn_relu(x, mask, f"b{bi}_subm{li}_bn")
            cin = blk.subm_channels

        k_down = int(np.prod(blk.kernel))
        w = self._conv_params(f"b{bi}_down", k_down, cin, blk.cout)
        x = jax.lax.conv_general_dilated(
            x, w.reshape(tuple(blk.kernel)
                         + (cin, blk.cout)).astype(self.dtype),
            window_strides=tuple(blk.stride),
            padding=[(p, p) for p in blk.pad],
            dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(self.dtype)
        # output sites = any active input in the receptive field
        mask = (jax.lax.reduce_window(
            mask, jnp.zeros((), mask.dtype), jax.lax.max,
            (1,) + tuple(blk.kernel) + (1,),
            (1,) + tuple(blk.stride) + (1,),
            ((0, 0),) + tuple((p, p) for p in blk.pad) + ((0, 0),)
        ) > 0).astype(self.dtype)
        x = bn_relu(x, mask, f"b{bi}_down_bn")
        return x, mask, blk.cout
