"""Sparse 3D convolution for TPU — gather-GEMM-scatter with an on-device
rulebook.

TPU-first replacement for the spconv C++/CUDA library [ref: external
spconv/src/spconv/indice.cu (getIndicePairs), reordering.cu, SparseConvTensor
— UNVERIFIED; BASELINE.json names this component explicitly]:

- **Rulebook** = for every (output site, kernel offset), the index of the
  contributing input site.  Built on device from sorted linearized voxel
  keys + ``jnp.searchsorted`` — no hash tables, no atomics, fully static
  shapes (capacity + validity masks).
- **Submanifold conv** (SubMConv3d): output sites == input sites.  The
  per-offset gather is a dense take; the GEMM accumulates over kernel
  offsets with ``lax.scan`` so the working set stays [N, C].
- **Strided conv** (SparseConv3d): output sites = unique positions whose
  receptive field touches an input (exact spconv semantics, generated from
  per-input output candidates + sort-unique compaction).

Values are parity-tested against dense ``lax.conv_general_dilated`` on
densified inputs (the spconv test pattern).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INT32_MAX = jnp.iinfo(jnp.int32).max


def _offsets(kernel_size: Tuple[int, int, int]) -> np.ndarray:
    """[K, 3] kernel offsets in (z, y, x), centered (sub-manifold style)."""
    kz, ky, kx = kernel_size
    return np.stack(np.meshgrid(
        np.arange(kz) - kz // 2,
        np.arange(ky) - ky // 2,
        np.arange(kx) - kx // 2, indexing="ij"), -1).reshape(-1, 3)


def linearize(coords: jax.Array, grid_dhw: Tuple[int, int, int]) -> jax.Array:
    """(z,y,x) int coords -> linear keys; invalid (<0 or >=grid) -> INT_MAX.

    DEPTH-MINOR order — key = (y*W + x)*D + z.  Scans are BEV-dense and
    z-sparse, so with (y, x, z)-sorted active sites ALL 27 kernel-tap
    neighbors of a site sit within a few BEV rows of it in index space
    (~tens of rows).  Under the lineage's z-major order a dz=±1 tap
    jumps an entire z-slab (~10k indices on ground-heavy scans), which
    forced the Pallas windowed gather-GEMM into its XLA fallback on 75%
    of real FHD rulebooks (round-3 telemetry)."""
    D, H, W = grid_dhw
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    ok = ((z >= 0) & (z < D) & (y >= 0) & (y < H) & (x >= 0) & (x < W))
    key = (y * W + x) * D + z
    return jnp.where(ok, key, _INT32_MAX)


class BlockSpec(NamedTuple):
    """One lineage middle-stack block: ``n_subm`` 3x3x3 submanifold convs
    (``subm_cout`` channels) followed by one strided SparseConv
    (``down_cout`` channels, arbitrary kernel/stride/pad).  Hashable —
    safe inside a frozen VoxelNetConfig used as a jit static arg.

    Mirrors one BN+ReLU-interleaved run of
    ``SubMConv3d*n + SpConv3d`` in the reference middle extractors
    [ref: second/pytorch/models/middle.py — lineage-expected, UNVERIFIED].
    """

    n_subm: int
    subm_cout: int                  # ignored when n_subm == 0
    down_cout: int
    kernel: Tuple[int, int, int]    # strided-conv kernel (z, y, x)
    stride: Tuple[int, int, int]
    pad: Tuple[int, int, int]


class BlockPlan(NamedTuple):
    """Static per-block geometry of a sparse middle stack.

    Shared between the flax module (device builders) and the host C++/numpy
    rulebook precompute so both produce identically-shaped rulebooks.
    """

    grid: Tuple[int, int, int]       # input grid (D, H, W)
    out_grid: Tuple[int, int, int]   # grid after the strided conv
    kernel: Tuple[int, int, int]     # strided-conv kernel
    stride: Tuple[int, int, int]
    pad: Tuple[int, int, int]
    in_cap: int                      # active-site capacity entering the block
    out_cap: int                     # capacity after the strided conv
    n_subm: int                      # submanifold convs before the downsample
    cout: int                        # strided-conv output channels
    subm_cout: int = -1              # submanifold channels (-1 -> == cout)
    subm_kernel: Tuple[int, int, int] = (3, 3, 3)

    @property
    def subm_channels(self) -> int:
        return self.cout if self.subm_cout < 0 else self.subm_cout


def _out_grid(grid, pad, kernel, stride):
    return tuple((g + 2 * p - k) // s + 1 for g, p, k, s in zip(
        grid, pad, kernel, stride))


def plan_from_specs(grid_dhw: Tuple[int, int, int], v_cap: int,
                    specs: Tuple[BlockSpec, ...],
                    capacity_shrink: Optional[float] = None,
                    min_capacity: int = 2048,
                    out_caps: Optional[Sequence[int]] = None,
                    ) -> Tuple[BlockPlan, ...]:
    """Explicit per-block specs -> capacity-annotated BlockPlans.

    Capacity sizing matters: a non-submanifold SparseConv EXPANDS the
    active-site set (kernel 3 / stride 2: up to 8 output sites per
    input; measured 2.5-4x on lidar scans at the first strided block,
    ~1x at later blocks as the thickened surface saturates the coarser
    grid).  A block whose true output count exceeds its static
    ``out_cap`` truncates in sorted-key order — with the depth-minor
    key ((y*W + x)*D + z) that silently drops the highest-y BEV rows of
    the scene, which pinned the synthetic-KITTI FHD run at prior loss
    (every block saturated at the old 0.6-shrink default).  Three
    sizing modes:

    - ``out_caps``: explicit per-block capacities (preferred — size them
      from data with :func:`measure_site_caps`); rounded up to 128.
    - ``capacity_shrink``: uniform multiplier on the running capacity
      after each >=2-axis strided conv (z-only convs keep ~max(it,.85)).
      Only safe below ~3 with measured headroom.
    - neither (default): expansion-aware heuristic — 3.0x for the first
      downsample whose kernel dilates (is >1 in) any non-strided axis,
      1.25x for later ones, 1.0x only for pure-collapse convs whose
      kernel is 1 in every non-strided axis (e.g. (3,1,1) z-collapse),
      all capped at 4x the stack's input capacity.  Overshoots on
      purpose; use measured ``out_caps`` for production speed.

    Raises ValueError if the grid is too small for the plan (some output
    dim would be empty).
    """
    if out_caps is not None and len(out_caps) != len(specs):
        raise ValueError(
            f"out_site_caps has {len(out_caps)} entries but the middle "
            f"stack has {len(specs)} strided blocks — caps measured for a "
            f"different middle variant? (use measure_site_caps on this "
            f"plan, or clear out_site_caps for the heuristic)")
    blocks = []
    grid = tuple(int(g) for g in grid_dhw)
    cap = int(v_cap)
    seen_ds = False
    for i, s in enumerate(specs):
        og = _out_grid(grid, s.pad, s.kernel, s.stride)
        if any(g < 1 for g in og):
            raise ValueError(
                f"grid {grid} too small for block {s} (out grid {og})")
        n_ds_axes = sum(1 for st in s.stride if st > 1)
        # A strided conv EXPANDS the active set whenever its kernel is >1
        # in any axis it does not stride (the tap dilates that axis) —
        # e.g. a 3x3x3 kernel with z-only stride still dilates y/x ~9x on
        # scattered coords.  Only a pure-collapse kernel (1 in every
        # non-strided axis, like (3,1,1) z-collapse) is non-expanding.
        dilates = any(k > 1 and st == 1
                      for k, st in zip(s.kernel, s.stride))
        if out_caps is not None:
            next_cap = int(out_caps[i])
        elif capacity_shrink is not None:
            shrink = (capacity_shrink if n_ds_axes >= 2
                      else min(1.0, max(capacity_shrink, 0.85)))
            next_cap = int(cap * shrink)
        else:
            if n_ds_axes >= 2 or dilates:
                mult = 1.25 if seen_ds else 3.0
                seen_ds = True
            else:
                mult = 1.0
            next_cap = min(int(cap * mult), 4 * int(v_cap))
        next_cap = max(next_cap, min(min_capacity, cap))
        # never exceed the output grid itself (tiny test grids)
        next_cap = min(next_cap, int(np.prod(og)))
        next_cap = ((next_cap + 127) // 128) * 128
        blocks.append(BlockPlan(
            grid=grid, out_grid=og, kernel=tuple(s.kernel),
            stride=tuple(s.stride), pad=tuple(s.pad), in_cap=cap,
            out_cap=next_cap, n_subm=int(s.n_subm), cout=int(s.down_cout),
            subm_cout=int(s.subm_cout), subm_kernel=(3, 3, 3)))
        grid, cap = og, next_cap
    return tuple(blocks)


def strided_out_sites_np(coords: np.ndarray, grid: Tuple[int, int, int],
                         kernel, stride, pad,
                         out_grid: Tuple[int, int, int]) -> np.ndarray:
    """Exact spconv output-site set of one strided conv, on host.

    ``coords``: [N, 3] int (z, y, x), -1-padded rows allowed.  Returns
    the sorted unique [M, 3] output coordinates — the ground truth the
    device builders' capacity must cover.
    """
    pts = coords[coords[:, 0] >= 0].astype(np.int64)
    if pts.size == 0:
        return np.zeros((0, 3), np.int64)
    keys = []
    for dz in range(kernel[0]):
        for dy in range(kernel[1]):
            for dx in range(kernel[2]):
                o = pts + np.array([pad[0] - dz, pad[1] - dy, pad[2] - dx])
                m = ((o % np.array(stride)) == 0).all(1)
                o = o[m] // np.array(stride)
                m = ((o >= 0) & (o < np.array(out_grid))).all(1)
                o = o[m]
                keys.append((o[:, 0] * out_grid[1] + o[:, 1])
                            * out_grid[2] + o[:, 2])
    uniq = np.unique(np.concatenate(keys))
    z = uniq // (out_grid[1] * out_grid[2])
    y = (uniq // out_grid[2]) % out_grid[1]
    x = uniq % out_grid[2]
    return np.stack([z, y, x], axis=1)


def measure_site_caps(coords_iter, grid_dhw: Tuple[int, int, int],
                      specs: Tuple[BlockSpec, ...], *,
                      safety: float = 1.15,
                      round_to: int = 128) -> Tuple[int, ...]:
    """Exact per-block output-site capacities measured over sample scans.

    ``coords_iter``: iterable of [V, 3] (z, y, x) int voxel coords
    (-1-padded rows ok).  Runs every scan through the plan's strided
    convs on host, takes the per-block max count over scans, applies
    ``safety`` headroom and rounds up to ``round_to``.  Feed the result
    to ``plan_from_specs(out_caps=...)`` / the ``out_site_caps`` config
    field for truncation-free static shapes sized to the data.
    """
    grid0 = tuple(int(g) for g in grid_dhw)
    maxes = [0] * len(specs)
    for coords in coords_iter:
        c = np.asarray(coords)
        grid = grid0
        for i, s in enumerate(specs):
            og = _out_grid(grid, s.pad, s.kernel, s.stride)
            c = strided_out_sites_np(c, grid, s.kernel, s.stride, s.pad, og)
            maxes[i] = max(maxes[i], len(c))
            grid = og
    return tuple(int(-(-int(m * safety) // round_to)) * round_to
                 for m in maxes)


def respec(plan: Tuple[BlockPlan, ...]) -> Tuple[Tuple[int, int, int],
                                                 Tuple[BlockSpec, ...]]:
    """Recover (input grid, BlockSpecs) from a capacity-annotated plan —
    lets callers re-plan the same stack at a different voxel capacity
    (bucketed shapes: ``plan_from_specs(grid, bucket, specs)``)."""
    grid = plan[0].grid
    specs = tuple(
        BlockSpec(n_subm=b.n_subm, subm_cout=b.subm_cout, down_cout=b.cout,
                  kernel=b.kernel, stride=b.stride, pad=b.pad)
        for b in plan)
    return grid, specs


def make_plan(grid_dhw: Tuple[int, int, int], v_cap: int,
              num_filters, layers_per_block, z_strides, xy_strides,
              capacity_shrink: Optional[float] = None,
              min_capacity: int = 2048,
              out_caps: Optional[Sequence[int]] = None,
              ) -> Tuple[BlockPlan, ...]:
    """The legacy-parameterized conv plan for a SparseMiddle stack
    (uniform 3x3x3 kernels; subm channels == strided channels).  Lineage
    names go through explicit ``BlockSpec`` plans instead
    (models/middle_plans.py)."""
    specs = tuple(
        BlockSpec(n_subm=int(n), subm_cout=int(c), down_cout=int(c),
                  kernel=(3, 3, 3), stride=(int(zs), int(xys), int(xys)),
                  pad=(1, 1, 1))
        for c, n, zs, xys in zip(num_filters, layers_per_block,
                                 z_strides, xy_strides))
    return plan_from_specs(grid_dhw, v_cap, specs, capacity_shrink,
                           min_capacity, out_caps)


class SubmanifoldRulebook(NamedTuple):
    gather_idx: jax.Array   # [K, N] input index per (offset, output site)
    found: jax.Array        # [K, N] bool


def build_submanifold_rulebook(coords: jax.Array, valid: jax.Array,
                               grid_dhw: Tuple[int, int, int],
                               kernel_size: Tuple[int, int, int] = (3, 3, 3)
                               ) -> SubmanifoldRulebook:
    """coords [N,3] (z,y,x), valid [N] -> neighbor table over K offsets.

    One sorted key array serves every SubM layer of a block (same active
    set — the spconv rulebook-reuse trick falls out for free).
    """
    N = coords.shape[0]
    keys = jnp.where(valid, linearize(coords, grid_dhw), _INT32_MAX)
    order = jnp.argsort(keys)                    # invalid sorted last
    skeys = keys[order]
    offsets = jnp.asarray(_offsets(kernel_size), jnp.int32)  # [K, 3]

    def one_offset(off):
        qcoords = coords + off[None, :]
        qkeys = jnp.where(valid, linearize(qcoords, grid_dhw), _INT32_MAX)
        pos = jnp.searchsorted(skeys, qkeys)
        pos = jnp.clip(pos, 0, N - 1)
        hit = (skeys[pos] == qkeys) & (qkeys != _INT32_MAX)
        return order[pos].astype(jnp.int32), hit

    gather_idx, found = jax.vmap(one_offset)(offsets)
    return SubmanifoldRulebook(gather_idx, found)


def build_submanifold_rulebook_lut(coords: jax.Array, valid: jax.Array,
                                   grid_dhw: Tuple[int, int, int],
                                   kernel_size: Tuple[int, int, int] = (3, 3, 3)
                                   ) -> SubmanifoldRulebook:
    """Dense lookup-table rulebook — same outputs as
    :func:`build_submanifold_rulebook`, no sort/searchsorted.

    Scatter each active site's row index into a [D*H*W]-cell table, then
    the rulebook is 27 plain gathers of neighbor keys.  Trades HBM for
    speed (the table is 4 bytes/cell); on TPU this is pure scatter/gather
    bandwidth, ~10x faster than the sort-based builder at KITTI-FHD scale.
    """
    N = coords.shape[0]
    D, H, W = grid_dhw
    total = D * H * W
    keys = jnp.where(valid, linearize(coords, grid_dhw), total)
    keys = jnp.minimum(keys, total)              # invalid -> dump slot
    table = jnp.full((total + 1,), -1, jnp.int32)
    table = table.at[keys].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
    table = table.at[total].set(-1)              # dump slot never matches
    offsets = jnp.asarray(_offsets(kernel_size), jnp.int32)

    def one_offset(off):
        qkeys = jnp.where(valid, linearize(coords + off[None, :], grid_dhw),
                          _INT32_MAX)
        idx = table[jnp.minimum(qkeys, total)]
        hit = (idx >= 0) & (qkeys != _INT32_MAX)
        return jnp.maximum(idx, 0), hit

    gather_idx, found = jax.vmap(one_offset)(offsets)
    return SubmanifoldRulebook(gather_idx, found)


def _merge_lookup(in_keys: jax.Array, q_keys: jax.Array):
    """Batch hash-join on TPU terms: for each query key, the row index of
    the matching in-key (keys unique among valid; _INT32_MAX = invalid).

    ONE combined sort + a cummax propagation + ONE unscatter sort —
    O((N+Q) log) fully-vectorized lanes.  This replaces both the
    per-query ``searchsorted`` (binary-search gathers serialize on TPU:
    ~50 ms for 442k queries vs 9.8 ms for this join at FHD block-0
    scale) and the dense [D*H*W] LUT (370 MB of table traffic per
    example at the KITTI-FHD grid).  Packed-key single-payload and
    scatter-unscatter variants were measured SLOWER on v5e (14.6 /
    19.1 ms) — multi-operand sorts are cheap, random scatters are not.

    Returns (idx [Q] int32, hit [Q] bool)."""
    N, Q = in_keys.shape[0], q_keys.shape[0]
    T = N + Q
    pos = jnp.arange(T, dtype=jnp.int32)
    keys = jnp.concatenate([in_keys, q_keys])
    tag = jnp.concatenate([jnp.zeros((N,), jnp.int32),
                           jnp.ones((Q,), jnp.int32)])   # ties: in first
    payload = jnp.concatenate([jnp.arange(N, dtype=jnp.int32),
                               jnp.full((Q,), -1, jnp.int32)])
    qid = jnp.concatenate([jnp.full((N,), T, jnp.int32),
                           jnp.arange(Q, dtype=jnp.int32)])
    sk, _, sp, sq = jax.lax.sort((keys, tag, payload, qid), num_keys=2)
    last_in = jax.lax.cummax(jnp.where(sp >= 0, pos, -1))
    safe = jnp.maximum(last_in, 0)
    hit_sorted = ((last_in >= 0) & (sk[safe] == sk)
                  & (sk != _INT32_MAX)).astype(jnp.int32)
    idx_sorted = sp[safe]
    # back to query order: sort by qid (in-rows carry qid=T -> tail)
    _, idx_q, hit_q = jax.lax.sort((sq, idx_sorted, hit_sorted),
                                   num_keys=1)
    return jnp.maximum(idx_q[:Q], 0), hit_q[:Q].astype(bool)


def build_submanifold_rulebook_merge(
        coords: jax.Array, valid: jax.Array,
        grid_dhw: Tuple[int, int, int],
        kernel_size: Tuple[int, int, int] = (3, 3, 3)
) -> SubmanifoldRulebook:
    """Merge-join rulebook — same outputs as
    :func:`build_submanifold_rulebook`, one combined sort instead of a
    per-tap binary search (~5x faster: TPU random gathers serialize) or
    a grid-sized table (within ~20% of the LUT builder's speed with none
    of its [D*H*W] HBM footprint; grid-size independent)."""
    N = coords.shape[0]
    offsets = jnp.asarray(_offsets(kernel_size), jnp.int32)
    K = offsets.shape[0]
    in_keys = jnp.where(valid, linearize(coords, grid_dhw), _INT32_MAX)
    q = jax.vmap(lambda off: jnp.where(
        valid, linearize(coords + off[None, :], grid_dhw),
        _INT32_MAX))(offsets)                            # [K, N]
    idx, hit = _merge_lookup(in_keys, q.reshape(-1))
    return SubmanifoldRulebook(idx.reshape(K, N), hit.reshape(K, N))


def submanifold_conv(features: jax.Array, rulebook: SubmanifoldRulebook,
                     weights: jax.Array, bias: jax.Array | None = None,
                     valid: jax.Array | None = None,
                     fused_gemm: bool = True) -> jax.Array:
    """features [N, Cin], weights [K, Cin, Cout] -> [N, Cout].

    fused_gemm=True: gather all K neighbors into [N, K*Cin] and run ONE
    MXU-sized GEMM (vs a scan of K small GEMMs) — trades K*N*Cin scratch
    HBM for MXU utilization.  False: scan(gather -> masked GEMM ->
    accumulate), working set stays [N, C].
    """
    N = features.shape[0]
    K, Cin, Cout = weights.shape

    if fused_gemm:
        gathered = jnp.where(rulebook.found[:, :, None],
                             features[rulebook.gather_idx], 0.0)  # [K,N,Cin]
        gathered = jnp.transpose(gathered, (1, 0, 2)).reshape(N, K * Cin)
        out = jnp.dot(gathered, weights.reshape(K * Cin, Cout),
                      preferred_element_type=jnp.float32)
    else:
        def body(acc, inputs):
            g_idx, hit, w = inputs
            g = jnp.where(hit[:, None], features[g_idx], 0.0)
            return acc + jnp.dot(g, w,
                                 preferred_element_type=jnp.float32), None

        acc0 = jnp.zeros((N, Cout), jnp.float32)
        out, _ = jax.lax.scan(body, acc0,
                              (rulebook.gather_idx, rulebook.found, weights))
    if bias is not None:
        out = out + bias
    if valid is not None:
        out = jnp.where(valid[:, None], out, 0.0)
    return out.astype(features.dtype)


class StridedSparseLayout(NamedTuple):
    out_coords: jax.Array   # [M, 3] (z,y,x), -1 padding
    out_valid: jax.Array    # [M]
    gather_idx: jax.Array   # [K, M] input index per (offset, output)
    found: jax.Array        # [K, M]
    num_out: jax.Array      # [] int32


def build_strided_layout(coords: jax.Array, valid: jax.Array,
                         grid_dhw: Tuple[int, int, int],
                         kernel_size: Tuple[int, int, int],
                         stride: Tuple[int, int, int],
                         padding: Tuple[int, int, int],
                         max_out: int) -> StridedSparseLayout:
    """Exact spconv-style strided output generation + rulebook.

    Output site o (per dim) receives input i iff  o*s + k - p == i  for some
    kernel tap k in [0, K).  Candidates per input: all integer o per dim.
    """
    N = coords.shape[0]
    D, H, W = grid_dhw
    s = np.asarray(stride)
    p = np.asarray(padding)
    k = np.asarray(kernel_size)
    out_grid = tuple(int((g + 2 * pp - kk) // ss + 1)
                     for g, pp, kk, ss in zip(grid_dhw, p, k, s))

    sj = jnp.asarray(s, jnp.int32)
    pj = jnp.asarray(p, jnp.int32)

    # candidate outputs per input: per dim, o must satisfy
    # o*s in [i + p - k + 1, i + p]  =>  at most ceil(k/s) integer values
    # starting at floor((i + p) / s) and stepping down.  Enumerating those
    # (e.g. 2 per dim for k=3, s=2 -> 8 combos) instead of all k^3 taps
    # keeps the sort 3.4x smaller.
    n_cand = [int(-(-kk // ss)) for kk, ss in zip(k, s)]
    deltas = np.stack(np.meshgrid(*[np.arange(c) for c in n_cand],
                                  indexing="ij"), -1).reshape(-1, 3)
    deltas = jnp.asarray(deltas, jnp.int32)
    kj = jnp.asarray(k, jnp.int32)

    def candidates(dlt):
        o = (coords + pj[None, :]) // sj[None, :] - dlt[None, :]
        lo = coords + pj[None, :] - kj[None, :] + 1
        ok = valid & ((o * sj[None, :] >= lo)
                      & (o * sj[None, :] <= coords + pj[None, :])).all(-1)
        okey = linearize(o, out_grid)
        return jnp.where(ok, okey, _INT32_MAX)

    cand_keys = jax.vmap(candidates)(deltas).reshape(-1)    # [C*N]
    skeys = jnp.sort(cand_keys)
    first = jnp.concatenate(
        [jnp.array([True]), skeys[1:] != skeys[:-1]]) & (skeys != _INT32_MAX)
    pos_out = jnp.cumsum(first) - 1
    out_keys = jnp.full((max_out + 1,), _INT32_MAX, jnp.int32)
    out_keys = out_keys.at[
        jnp.where(first & (pos_out < max_out), pos_out, max_out)
    ].set(skeys, mode="drop")[:max_out]
    num_out = jnp.minimum(jnp.sum(first), max_out).astype(jnp.int32)
    out_valid = jnp.arange(max_out) < num_out
    # out_keys is sorted ascending (construction order preserves sort)
    oD, oW = out_grid[0], out_grid[2]
    oy = out_keys // (oW * oD)
    ox = (out_keys // oD) % oW
    oz = out_keys % oD
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([oz, oy, ox], axis=-1), -1).astype(jnp.int32)

    # rulebook: input coord for (output, tap) = o*s + tap - p over the
    # full k^3 tap set
    taps = np.stack(np.meshgrid(*[np.arange(kk) for kk in k],
                                indexing="ij"), -1).reshape(-1, 3)
    taps = jnp.asarray(taps, jnp.int32)
    in_keys = jnp.where(valid, linearize(coords, grid_dhw), _INT32_MAX)
    order = jnp.argsort(in_keys)
    sorted_in = in_keys[order]

    def one_tap(off):
        icoords = out_coords * sj[None, :] + off[None, :] - pj[None, :]
        ikeys = jnp.where(out_valid, linearize(icoords, grid_dhw),
                          _INT32_MAX)
        posn = jnp.clip(jnp.searchsorted(sorted_in, ikeys), 0, N - 1)
        hit = (sorted_in[posn] == ikeys) & (ikeys != _INT32_MAX)
        return order[posn].astype(jnp.int32), hit

    gather_idx, found = jax.vmap(one_tap)(taps)
    return StridedSparseLayout(out_coords, out_valid, gather_idx, found,
                               num_out)


def build_strided_layout_lut(coords: jax.Array, valid: jax.Array,
                             grid_dhw: Tuple[int, int, int],
                             kernel_size: Tuple[int, int, int],
                             stride: Tuple[int, int, int],
                             padding: Tuple[int, int, int],
                             max_out: int) -> StridedSparseLayout:
    """Dense lookup-table twin of :func:`build_strided_layout` — output
    sites via scatter-mark + cumsum compaction over the output grid
    (sorted order falls out of the linear scan), rulebook via an input
    LUT.  No sorts; everything is scatter/gather/cumsum bandwidth."""
    N = coords.shape[0]
    D, H, W = grid_dhw
    s = np.asarray(stride)
    p = np.asarray(padding)
    k = np.asarray(kernel_size)
    out_grid = tuple(int((g + 2 * pp - kk) // ss + 1)
                     for g, pp, kk, ss in zip(grid_dhw, p, k, s))
    out_total = int(np.prod(out_grid))
    sj = jnp.asarray(s, jnp.int32)
    pj = jnp.asarray(p, jnp.int32)
    kj = jnp.asarray(k, jnp.int32)

    n_cand = [int(-(-kk // ss)) for kk, ss in zip(k, s)]
    deltas = np.stack(np.meshgrid(*[np.arange(c) for c in n_cand],
                                  indexing="ij"), -1).reshape(-1, 3)
    deltas = jnp.asarray(deltas, jnp.int32)

    def candidates(dlt):
        o = (coords + pj[None, :]) // sj[None, :] - dlt[None, :]
        lo = coords + pj[None, :] - kj[None, :] + 1
        ok = valid & ((o * sj[None, :] >= lo)
                      & (o * sj[None, :] <= coords + pj[None, :])).all(-1)
        okey = linearize(o, out_grid)
        return jnp.where(ok, okey, out_total)    # invalid -> dump slot

    cand_keys = jax.vmap(candidates)(deltas).reshape(-1)
    mark = jnp.zeros((out_total + 1,), bool)
    mark = mark.at[jnp.minimum(cand_keys, out_total)].set(True, mode="drop")
    mark = mark.at[out_total].set(False)
    # compact the marked cells in ascending order WITHOUT a grid-sized
    # scatter: the p-th output key is the first cell whose mark-cumsum
    # reaches p+1 — a [max_out]-query binary search over the cumsum
    csum = jnp.cumsum(mark.astype(jnp.int32))
    num_out = jnp.minimum(csum[-1], max_out).astype(jnp.int32)
    out_valid = jnp.arange(max_out) < num_out
    out_keys = jnp.searchsorted(
        csum, jnp.arange(1, max_out + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)
    out_keys = jnp.where(out_valid, out_keys, _INT32_MAX)
    oD, oW = out_grid[0], out_grid[2]
    oy = out_keys // (oW * oD)
    ox = (out_keys // oD) % oW
    oz = out_keys % oD
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([oz, oy, ox], axis=-1), -1).astype(jnp.int32)

    # input LUT for the tap gathers
    in_total = D * H * W
    in_keys = jnp.where(valid, linearize(coords, grid_dhw), in_total)
    table = jnp.full((in_total + 1,), -1, jnp.int32)
    table = table.at[jnp.minimum(in_keys, in_total)].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    table = table.at[in_total].set(-1)

    taps = np.stack(np.meshgrid(*[np.arange(kk) for kk in k],
                                indexing="ij"), -1).reshape(-1, 3)
    taps = jnp.asarray(taps, jnp.int32)

    def one_tap(off):
        icoords = out_coords * sj[None, :] + off[None, :] - pj[None, :]
        ikeys = jnp.where(out_valid, linearize(icoords, grid_dhw),
                          _INT32_MAX)
        idx = table[jnp.minimum(ikeys, in_total)]
        hit = (idx >= 0) & (ikeys != _INT32_MAX)
        return jnp.maximum(idx, 0), hit

    gather_idx, found = jax.vmap(one_tap)(taps)
    return StridedSparseLayout(out_coords, out_valid, gather_idx, found,
                               num_out)


class StridedSites(NamedTuple):
    """Output-site set of a strided sparse conv, without tap rulebooks —
    all a key-match kernel needs (the join happens inside the kernel)."""
    out_coords: jax.Array   # [M, 3] (z, y, x); -1 pad
    out_valid: jax.Array    # [M] bool
    num_out: jax.Array      # scalar int32


def build_strided_sites(coords: jax.Array, valid: jax.Array,
                        grid_dhw: Tuple[int, int, int],
                        kernel_size: Tuple[int, int, int],
                        stride: Tuple[int, int, int],
                        padding: Tuple[int, int, int],
                        max_out: int) -> StridedSites:
    """Exact spconv output-site construction (any site whose receptive
    field touches an active input), KEY-SORTED: enumerate each input's
    candidate output cells, one sort of the C*N candidate keys, dedup by
    compare-adjacent.  This is the only part of strided-conv rulebook
    construction the key-match kernel still needs on device."""
    s = np.asarray(stride)
    p = np.asarray(padding)
    k = np.asarray(kernel_size)
    out_grid = tuple(int((g + 2 * pp - kk) // ss + 1)
                     for g, pp, kk, ss in zip(grid_dhw, p, k, s))
    sj = jnp.asarray(s, jnp.int32)
    pj = jnp.asarray(p, jnp.int32)
    kj = jnp.asarray(k, jnp.int32)

    n_cand = [int(-(-kk // ss)) for kk, ss in zip(k, s)]
    deltas = np.stack(np.meshgrid(*[np.arange(c) for c in n_cand],
                                  indexing="ij"), -1).reshape(-1, 3)
    deltas = jnp.asarray(deltas, jnp.int32)

    def candidates(dlt):
        o = (coords + pj[None, :]) // sj[None, :] - dlt[None, :]
        lo = coords + pj[None, :] - kj[None, :] + 1
        ok = valid & ((o * sj[None, :] >= lo)
                      & (o * sj[None, :] <= coords + pj[None, :])).all(-1)
        okey = linearize(o, out_grid)
        return jnp.where(ok, okey, _INT32_MAX)

    cand_keys = jax.vmap(candidates)(deltas).reshape(-1)    # [C*N]
    skeys = jnp.sort(cand_keys)
    first = jnp.concatenate(
        [jnp.array([True]), skeys[1:] != skeys[:-1]]) & (skeys != _INT32_MAX)
    pos_out = jnp.cumsum(first) - 1
    out_keys = jnp.full((max_out + 1,), _INT32_MAX, jnp.int32)
    out_keys = out_keys.at[
        jnp.where(first & (pos_out < max_out), pos_out, max_out)
    ].set(skeys, mode="drop")[:max_out]
    num_out = jnp.minimum(jnp.sum(first), max_out).astype(jnp.int32)
    out_valid = jnp.arange(max_out) < num_out
    oD, oW = out_grid[0], out_grid[2]
    oy = out_keys // (oW * oD)
    ox = (out_keys // oD) % oW
    oz = out_keys % oD
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([oz, oy, ox], axis=-1), -1).astype(jnp.int32)
    return StridedSites(out_coords, out_valid, num_out)


def conv_taps(kernel_size: Tuple[int, int, int]) -> np.ndarray:
    """[T, 3] un-centered tap offsets of a strided conv, in the weight
    layout order shared by every strided-conv consumer."""
    k = np.asarray(kernel_size)
    return np.stack(np.meshgrid(*[np.arange(kk) for kk in k],
                                indexing="ij"), -1).reshape(-1, 3)


def subm_tap_keys(coords: jax.Array, valid: jax.Array,
                  grid_dhw: Tuple[int, int, int],
                  kernel_size: Tuple[int, int, int] = (3, 3, 3)
                  ) -> jax.Array:
    """[K, N] per-tap neighbor query keys of a submanifold conv
    (``_INT32_MAX`` where there is no query) — the key-match kernel's
    entire 'rulebook': the join itself happens inside the kernel as a
    windowed equality compare against the sorted input keys."""
    offsets = jnp.asarray(_offsets(kernel_size), jnp.int32)
    return jax.vmap(lambda off: jnp.where(
        valid, linearize(coords + off[None, :], grid_dhw),
        _INT32_MAX))(offsets)


def strided_tap_keys(sites: StridedSites,
                     grid_in: Tuple[int, int, int],
                     kernel_size: Tuple[int, int, int],
                     stride: Tuple[int, int, int],
                     padding: Tuple[int, int, int]) -> jax.Array:
    """[T, M] per-tap input query keys of a strided conv's output sites
    (``_INT32_MAX`` where there is no query) — key-match analog of the
    strided rulebook."""
    sj = jnp.asarray(np.asarray(stride), jnp.int32)
    pj = jnp.asarray(np.asarray(padding), jnp.int32)
    taps = jnp.asarray(conv_taps(kernel_size), jnp.int32)

    def tap_queries(off):
        icoords = (sites.out_coords * sj[None, :] + off[None, :]
                   - pj[None, :])
        return jnp.where(sites.out_valid, linearize(icoords, grid_in),
                         _INT32_MAX)

    return jax.vmap(tap_queries)(taps)


def build_strided_layout_merge(coords: jax.Array, valid: jax.Array,
                               grid_dhw: Tuple[int, int, int],
                               kernel_size: Tuple[int, int, int],
                               stride: Tuple[int, int, int],
                               padding: Tuple[int, int, int],
                               max_out: int) -> StridedSparseLayout:
    """Merge-join twin of :func:`build_strided_layout`: the sort-based
    output-site construction is kept (it is already one small sort of
    the C*N candidate keys), and the per-tap ``searchsorted`` rulebook
    lookup is replaced by ONE :func:`_merge_lookup` over all T*max_out
    queries.  Grid-size independent — no [D*H*W] tables."""
    sites = build_strided_sites(coords, valid, grid_dhw, kernel_size,
                                stride, padding, max_out)
    q = strided_tap_keys(sites, grid_dhw, kernel_size, stride, padding)
    T = q.shape[0]
    in_keys = jnp.where(valid, linearize(coords, grid_dhw), _INT32_MAX)
    idx, hit = _merge_lookup(in_keys, q.reshape(-1))
    return StridedSparseLayout(sites.out_coords, sites.out_valid,
                               idx.reshape(T, max_out),
                               hit.reshape(T, max_out), sites.num_out)


def strided_sparse_conv(features: jax.Array, layout: StridedSparseLayout,
                        weights: jax.Array,
                        bias: jax.Array | None = None,
                        fused_gemm: bool = True) -> jax.Array:
    """features [N, Cin], weights [T, Cin, Cout] -> [M, Cout]."""
    M = layout.out_valid.shape[0]
    T, Cin, Cout = weights.shape

    if fused_gemm:
        gathered = jnp.where(layout.found[:, :, None],
                             features[layout.gather_idx], 0.0)  # [T,M,Cin]
        gathered = jnp.transpose(gathered, (1, 0, 2)).reshape(M, T * Cin)
        out = jnp.dot(gathered, weights.reshape(T * Cin, Cout),
                      preferred_element_type=jnp.float32)
    else:
        def body(acc, inputs):
            g_idx, hit, w = inputs
            g = jnp.where(hit[:, None], features[g_idx], 0.0)
            return acc + jnp.dot(g, w,
                                 preferred_element_type=jnp.float32), None

        acc0 = jnp.zeros((M, Cout), jnp.float32)
        out, _ = jax.lax.scan(body, acc0,
                              (layout.gather_idx, layout.found, weights))
    if bias is not None:
        out = out + bias
    out = jnp.where(layout.out_valid[:, None], out, 0.0)
    return out.astype(features.dtype)


def sparse_max_pool(features: jax.Array,
                    layout: StridedSparseLayout) -> jax.Array:
    """Sparse max-pool over a strided window layout: [N, Cin] -> [M, Cin].

    spconv-maxpool semantics [ref: spconv/src/spconv/maxpool.cu —
    lineage-expected, UNVERIFIED]: each output site (any window with >=1
    active input — the same site set a strided conv produces) takes the
    max over its ACTIVE inputs only; empty cells contribute nothing
    (not zero).  One gather + a tap-axis max — no MXU work."""
    gathered = jnp.where(layout.found[:, :, None],
                         features[layout.gather_idx],
                         -jnp.inf)                       # [T, M, Cin]
    out = jnp.max(gathered, axis=0)
    any_found = jnp.any(layout.found, axis=0) & layout.out_valid
    return jnp.where(any_found[:, None], out, 0.0).astype(features.dtype)


def inverse_sparse_conv(features: jax.Array, layout: StridedSparseLayout,
                        weights: jax.Array, num_in: int,
                        bias: jax.Array | None = None) -> jax.Array:
    """Inverse (transposed) sparse conv through a SAVED strided layout:
    [M, Cd] at the downsampled sites -> [num_in, Cu] at the original
    pre-downsample active sites.

    spconv-SparseInverseConv semantics [ref: spconv/python/spconv —
    lineage-expected, UNVERIFIED]: the adjoint of the strided gather —
    up-site i receives sum over (tap t, down-site m) with
    ``gather_idx[t, m] == i`` of ``features[m] @ weights[t]``.  Exactly
    the transpose of :func:`strided_sparse_conv`'s linear map, expressed
    as per-tap GEMMs (MXU) + one scatter-add.

    weights: [T, Cd, Cu] (tap order matches the layout's rulebook)."""
    T, Cd, Cu = weights.shape
    prod = jnp.einsum("mc,tcu->tmu", features.astype(jnp.float32),
                      weights.astype(jnp.float32))       # [T, M, Cu]
    mask = layout.found & layout.out_valid[None, :]
    idx = jnp.where(mask, layout.gather_idx, num_in)     # dump slot
    out = jnp.zeros((num_in + 1, Cu), jnp.float32).at[
        idx.reshape(-1)].add(
        jnp.where(mask[..., None], prod, 0.0).reshape(-1, Cu))[:num_in]
    if bias is not None:
        out = out + bias
    return out.astype(features.dtype)


def scatter_to_bev(features: jax.Array, coords: jax.Array, valid: jax.Array,
                   grid_dhw: Tuple[int, int, int]) -> jax.Array:
    """[N, C] sparse -> dense BEV [H, W, D*C] (depth folded into channels —
    the `.dense() + reshape` at the end of the reference middle stack)."""
    D, H, W = grid_dhw
    C = features.shape[-1]
    lin = (coords[:, 0] * H + coords[:, 1]) * W + coords[:, 2]
    lin = jnp.where(valid, lin, D * H * W)
    dense = jnp.zeros((D * H * W + 1, C), features.dtype)
    dense = dense.at[lin].set(jnp.where(valid[:, None], features, 0.0))
    dense = dense[: D * H * W].reshape(D, H, W, C)
    return jnp.transpose(dense, (1, 2, 0, 3)).reshape(H, W, D * C)


# ---------------------------------------------------------------------------
# dense reference (parity oracle) helpers
# ---------------------------------------------------------------------------


def densify(features, coords, valid, grid_dhw):
    """[N,C] sparse -> [D,H,W,C] dense (testing only)."""
    D, H, W = grid_dhw
    C = features.shape[-1]
    lin = (coords[:, 0] * H + coords[:, 1]) * W + coords[:, 2]
    lin = jnp.where(valid, lin, D * H * W)
    dense = jnp.zeros((D * H * W + 1, C), features.dtype)
    dense = dense.at[lin].set(jnp.where(valid[:, None], features, 0.0))
    return dense[: D * H * W].reshape(D, H, W, C)


def dense_conv3d(dense, weights, kernel_size, stride=(1, 1, 1),
                 padding=None):
    """lax 3D conv matching the sparse weight layout [T, Cin, Cout]."""
    kz, ky, kx = kernel_size
    if padding is None:
        padding = (kz // 2, ky // 2, kx // 2)
    w = weights.reshape(kz, ky, kx, weights.shape[1], weights.shape[2])
    return jax.lax.conv_general_dilated(
        dense[None], w, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]
