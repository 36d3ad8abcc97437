"""PointPillars: pillar feature net + scatter-to-canvas middle stage.

[ref: second/pytorch/models/pointpillars.py (Lang et al., CVPR 2019) —
lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .voxel_encoder import points_mask


class PFNLayer(nn.Module):
    """Pillar feature net layer: Dense + BN + ReLU (+ max-pool if last)."""

    units: int
    last_layer: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, inputs, mask, *, train: bool):
        x = nn.Dense(self.units, use_bias=False, dtype=self.dtype)(inputs)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        x = nn.relu(x) * mask
        x_max = jnp.max(x, axis=2, keepdims=True)
        if self.last_layer:
            return x_max[:, :, 0, :]  # [B, V, units]
        x_repeat = jnp.broadcast_to(x_max, x.shape)
        return jnp.concatenate([x, x_repeat], axis=-1)


class PillarFeatureNet(nn.Module):
    """Decorate points (cluster offset + pillar-center offset), run PFN
    layers, max-pool to one feature per pillar.

    Decorations (paper): [x, y, z, r, xc, yc, zc, xp, yp] (+ |p| optional).
    ``radius=True`` is the PillarFeatureNetRadius variant: the absolute
    (x, y) channels are folded into the rotation-invariant BEV radius
    sqrt(x^2 + y^2), everything else unchanged
    [ref: second/pytorch/models/pointpillars.py::PillarFeatureNetRadius —
    lineage-expected, UNVERIFIED].
    """

    num_input_features: int = 4
    num_filters: Sequence[int] = (64,)
    with_distance: bool = False
    voxel_size: Tuple[float, float] = (0.2, 0.2)
    pc_range: Tuple[float, float] = (0.0, -40.0)  # (x0, y0)
    radius: bool = False
    dtype: type = jnp.float32
    # flat mode only: compute the per-pillar mean/max with sorted-run
    # boundary arithmetic (cumsum diff + segmented scan) instead of
    # jax.ops.segment_*.  XLA lowers segment ops to scatters, which
    # serialize row-by-row through HBM on TPU (docs/DESIGN.md sec. 2);
    # with ``flat_slots_sorted`` every pillar's points are one
    # contiguous run, so both reductions are O(P) vector code.
    segment_scan: bool = False

    @nn.compact
    def __call__(self, voxels, num_points, coords, *, train: bool = False,
                 flat_points=None, flat_slot=None,
                 flat_slots_sorted: bool = False):
        """voxels [B,V,T,C], num_points [B,V], coords [B,V,3] (z,y,x).

        Flat mode (``flat_points`` [B,P,C] + ``flat_slot`` [B,P], from
        ``ops.voxelize_jax.voxelize_flat``): identical math on the
        point-major layout — decorate each point against its own
        pillar's mean/center, run the same PFN Dense+BN+ReLU, then
        ``segment_max`` into pillars.  Pillars average ~1-2 points, so
        the padded [B,V,T,*] intermediates are >90% zeros and purely
        HBM-bandwidth; flat mode reads/writes T/occupancy x less (the
        padded pillar path measured ~2 ms of the flagship's 4.8 ms scan
        budget).  Exactly equal to the padded path in eval mode: ReLU
        makes padded zero-rows neutral under the max.  In train mode the
        BatchNorm batch statistics average over [B*P] real points
        instead of [B*V*T] mostly-padded slots — same parameters, same
        checkpoints, slightly different (less zero-diluted) stats.
        ``voxels`` may be None in flat mode; ``num_points``/``coords``
        are still required.  Single-PFN-layer configs only (the lineage
        standard) — the inter-layer max-concat needs the padded layout.
        """
        if flat_points is not None:
            if len(self.num_filters) != 1:
                raise NotImplementedError(
                    "flat PFN mode supports a single PFN layer")
            return self._flat(flat_points, flat_slot, num_points, coords,
                              train=train, sorted_=flat_slots_sorted)
        B, V, T, C = voxels.shape
        mask = points_mask(num_points, T, voxels.dtype)
        denom = jnp.maximum(num_points[..., None, None], 1).astype(voxels.dtype)
        points_mean = (voxels[..., :3] * mask).sum(2, keepdims=True) / denom
        f_cluster = voxels[..., :3] - points_mean

        vx, vy = self.voxel_size
        x0, y0 = self.pc_range
        px = coords[..., 2].astype(voxels.dtype) * vx + (vx / 2 + x0)
        py = coords[..., 1].astype(voxels.dtype) * vy + (vy / 2 + y0)
        f_center = jnp.stack(
            [voxels[..., 0] - px[..., None], voxels[..., 1] - py[..., None]],
            axis=-1)

        raw = voxels[..., : self.num_input_features]
        if self.radius:
            r_bev = jnp.linalg.norm(raw[..., :2], axis=-1, keepdims=True)
            raw = jnp.concatenate([r_bev, raw[..., 2:]], axis=-1)
        features = [raw, f_cluster, f_center]
        if self.with_distance:
            features.append(
                jnp.linalg.norm(voxels[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(features, axis=-1) * mask

        n = len(self.num_filters)
        x = x.astype(self.dtype)
        mask = mask.astype(self.dtype)
        for i, units in enumerate(self.num_filters):
            x = PFNLayer(units, last_layer=(i == n - 1),
                         dtype=self.dtype)(x, mask, train=train)
        return x  # [B, V, F]

    def _flat(self, points, slot, num_points, coords, *, train, sorted_):
        """points [B,P,C], slot [B,P] (V = invalid), -> [B, V, F]."""
        import jax

        B, P, C = points.shape
        V = coords.shape[1]
        dt = points.dtype
        pvalid = slot < V

        use_scan = self.segment_scan and sorted_
        xyz = jnp.where(pvalid[..., None], points[..., :3], 0.0)
        slot_c = jnp.minimum(slot, V - 1)
        denom = jnp.maximum(num_points[..., None], 1).astype(dt)
        # per-pillar mean of the T-capped points, gathered back per point
        if use_scan:
            # slots sorted -> each pillar is one contiguous run; the run
            # sum is a cumsum difference at searchsorted boundaries (no
            # scatter anywhere).  The cumsum runs over COORDINATES MADE
            # RELATIVE to each run's first point: prefix-sum
            # differencing on raw coordinates (magnitudes to ~70 m x
            # 60k points) reaches fp32 ulp ~0.06-0.25 and would corrupt
            # the pillar means by centimetres; relative values are
            # bounded by the pillar size, keeping the running sum small.
            sidx = jnp.arange(V)
            starts = jax.vmap(
                lambda s: jnp.searchsorted(s, sidx, side="left"))(slot)
            ends = jax.vmap(
                lambda s: jnp.searchsorted(s, sidx, side="right"))(slot)
            ref_pillar = jnp.take_along_axis(
                xyz, jnp.minimum(starts, P - 1)[..., None], axis=1)
            ref_point = jnp.take_along_axis(
                ref_pillar, slot_c[..., None], axis=1)         # [B,P,3]
            rel = jnp.where(pvalid[..., None], xyz - ref_point, 0.0)

            def seg_sum(x, st, en):
                cs = jnp.concatenate(
                    [jnp.zeros((1, x.shape[-1]), x.dtype),
                     jnp.cumsum(x, axis=0)], axis=0)
                return cs[en] - cs[st]                         # [V, C]

            sums = jax.vmap(seg_sum)(rel, starts, ends)        # [B,V,3]
            means = ref_pillar + sums / denom
        else:
            def seg_sum(x, s):
                return jax.ops.segment_sum(
                    x, s, num_segments=V + 1,
                    indices_are_sorted=sorted_)[:V]

            means = jax.vmap(seg_sum)(xyz, slot) / denom       # [B,V,3]
        f_cluster = points[..., :3] - jnp.take_along_axis(
            means, slot_c[..., None], axis=1)

        vx, vy = self.voxel_size
        x0, y0 = self.pc_range
        pcoords = jnp.take_along_axis(coords, slot_c[..., None], axis=1)
        px = pcoords[..., 2].astype(dt) * vx + (vx / 2 + x0)
        py = pcoords[..., 1].astype(dt) * vy + (vy / 2 + y0)
        f_center = jnp.stack(
            [points[..., 0] - px, points[..., 1] - py], axis=-1)

        raw = points[..., : self.num_input_features]
        if self.radius:
            r_bev = jnp.linalg.norm(raw[..., :2], axis=-1, keepdims=True)
            raw = jnp.concatenate([r_bev, raw[..., 2:]], axis=-1)
        features = [raw, f_cluster, f_center]
        if self.with_distance:
            features.append(
                jnp.linalg.norm(points[..., :3], axis=-1, keepdims=True))
        mask = pvalid[..., None, None].astype(self.dtype)
        x = (jnp.concatenate(features, axis=-1)
             * pvalid[..., None].astype(dt)).astype(self.dtype)

        # same PFNLayer module (same param names/shapes as the padded
        # path): a [B, P, 1, F] layout makes its axis-2 max a no-op, so
        # it returns the per-point post-activation [B, P, F]
        x = PFNLayer(self.num_filters[0], last_layer=True,
                     dtype=self.dtype)(x[:, :, None, :], mask, train=train)

        if use_scan:
            # segmented running max over the sorted runs: carry resets
            # at each run start, the run max sits at its last element
            def seg_max(xx, ss):
                flag = jnp.concatenate(
                    [jnp.ones((1,), bool), ss[1:] != ss[:-1]])

                def comb(a, b):
                    av, af = a
                    bv, bf = b
                    return (jnp.where(bf, bv, jnp.maximum(av, bv)),
                            af | bf)

                scanned, _ = jax.lax.associative_scan(
                    comb, (xx, flag[:, None]), axis=0)
                ends = jnp.searchsorted(ss, jnp.arange(V), side="right")
                return scanned[jnp.maximum(ends, 1) - 1]       # [V, F]
        else:
            def seg_max(xx, ss):
                return jax.ops.segment_max(
                    xx, ss, num_segments=V + 1,
                    indices_are_sorted=sorted_)[:V]

        pooled = jax.vmap(seg_max)(x, slot)                    # [B,V,F]
        # empty segments give -inf; ReLU'd inputs make 0 the exact
        # padded-path floor
        return jnp.where(num_points[..., None] > 0,
                         jnp.maximum(pooled, 0).astype(self.dtype), 0)


class PointPillarsScatter(nn.Module):
    """Scatter pillar features into a dense BEV canvas [B, H, W, F].

    Two lowerings:
    - XLA scatter on linearized (y*W + x) indices (any pillar order).
    - ``sorted_pallas``: the Pallas one-hot-matmul kernel
      (ops.pallas.pillar_scatter) — ~1.8x faster on TPU, requires pillars
      in ascending key order (the device voxelizer's key-order mode).
    """

    output_shape: Tuple[int, int]  # (H, W) = (ny, nx)
    num_input_features: int = 64
    sorted_pallas: bool = False

    @nn.compact
    def __call__(self, voxel_features, coords, *, train: bool = False):
        """voxel_features [B, V, F], coords [B, V, 3] (z, y, x)."""
        import jax

        B, V, F = voxel_features.shape
        H, W = self.output_shape
        valid = coords[..., 1] >= 0
        lin = coords[..., 1] * W + coords[..., 2]  # [B, V]
        lin = jnp.where(valid, lin, H * W)  # dump slot
        if self.sorted_pallas:
            from ..ops.pallas import pillar_scatter as ps
            canvas = jax.vmap(
                lambda f, l: ps.scatter_sorted_to_canvas(f, l, hw=H * W))(
                jnp.where(valid[..., None], voxel_features, 0.0),
                lin.astype(jnp.int32))
            return canvas.reshape(B, H, W, F)
        canvas = jnp.zeros((B, H * W + 1, F), voxel_features.dtype)
        bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, V))
        canvas = canvas.at[bidx, lin].set(
            jnp.where(valid[..., None], voxel_features, 0.0))
        return canvas[:, : H * W].reshape(B, H, W, F)
