"""Pallas gather-GEMM kernel for sparse 3D convolution (north-star N1).

TPU hardware has no arbitrary cross-row vector gather (Mosaic's
``tpu.dynamic_gather`` shuffles within one vreg only), so this kernel
exploits a structural property instead: when the active sites are stored
in ascending linear-key order — which the device voxelizer
(``first_appearance=False``), the strided-layout builders (sorted-unique
output sites), and a one-off host sort all provide — every kernel tap's
rulebook column is **monotone**: sorted queries hit sorted keys in order.
Hence the matches of one output tile lie in one contiguous input window.

Per (tile, tap) the kernel:
  1. DMAs the window ``feats[start : start+W]`` HBM->VMEM (start is a
     scalar-prefetched per-(tap, tile) offset computed in XLA),
  2. forms the in-window one-hot matrix from relative indices (VPU
     compares), and
  3. gathers + multiplies on the MXU:
     ``acc += (onehot @ window) @ W[tap]``.

[ref: external spconv gather-GEMM-scatter pipeline,
spconv/src/spconv/reordering.cu — lineage-expected, UNVERIFIED;
BASELINE.json names "gather-GEMM-scatter Pallas kernels" explicitly]

Rulebooks whose rows are NOT key-sorted (e.g. FCFS first-appearance
numbering) or whose per-tile spans exceed the window make the wrapper
fall back to the XLA path via ``lax.cond`` — semantics are always exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(win_ref, idx_ref, mask_ref, featsT_hbm, w_ref, out_ref,
            scratch, sems, *, K: int, TN: int, W: int, n_tiles: int):
    """featsT_hbm: [Cin, L] (transposed so the windowed DMA slices the
    128-aligned minor axis); scratch: [2, Cin, W] double buffer."""
    t = pl.program_id(0)

    def get_dma(slot, k):
        ws = pl.multiple_of(win_ref[k * n_tiles + t], 128)
        return pltpu.make_async_copy(
            featsT_hbm.at[:, pl.ds(ws, W)],
            scratch.at[slot], sems.at[slot])

    get_dma(0, 0).start()
    sl = pl.ds(pl.multiple_of(t * TN, TN), TN)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):                       # static unroll over taps
        if k + 1 < K:                        # double-buffered windows
            get_dma((k + 1) % 2, k + 1).start()
        get_dma(k % 2, k).wait()
        ws = win_ref[k * n_tiles + t]
        rel = idx_ref[k, sl] - ws                           # [TN]
        cols = jax.lax.broadcasted_iota(jnp.int32, (TN, W), 1)
        onehot = (cols == rel[:, None]) & (mask_ref[k, sl][:, None] > 0)
        # [TN, W] x [Cin, W] -> [TN, Cin] (contract the window axis)
        gathered = jax.lax.dot_general(
            onehot.astype(scratch.dtype), scratch[k % 2],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot(
            gathered.astype(w_ref.dtype), w_ref[k],
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _pallas_gather_gemm(featsT, idx, mask, win_start, weights, *,
                        TN: int, W: int, interpret: bool):
    Cin, L = featsT.shape
    K = weights.shape[0]
    Cout = weights.shape[-1]
    n_tiles = L // TN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),               # idx
            pl.BlockSpec(memory_space=pltpu.VMEM),               # mask
            pl.BlockSpec(memory_space=pl.ANY),                   # featsT HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),               # weights
        ],
        out_specs=pl.BlockSpec((TN, Cout), lambda t, ws: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), featsT.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, K=K, TN=TN, W=W, n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Cout), jnp.float32),
        interpret=interpret,
    )(win_start, idx, mask, featsT, weights)


def _kernel_shared(win_ref, idx_ref, mask_ref, featsT_hbm, w_ref,
                   out_ref, scratch, sems, *, K: int, TN: int, W: int,
                   n_tiles: int):
    """Shared-window variant of :func:`_kernel`: one per-tile feature
    window serves all K taps (win_ref is [n_tiles]; the window covers
    the union of every tap's index range for the tile), cutting HBM
    traffic ~K-fold.  Double-buffered across grid tiles."""
    t = pl.program_id(0)

    def get_dma(slot, tt):
        ws = pl.multiple_of(win_ref[tt], 128)
        return pltpu.make_async_copy(
            featsT_hbm.at[:, pl.ds(ws, W)],
            scratch.at[slot], sems.at[slot])

    @pl.when(t == 0)
    def _start_first():
        get_dma(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _start_next():
        get_dma((t + 1) % 2, t + 1).start()

    get_dma(t % 2, t).wait()

    sl = pl.ds(pl.multiple_of(t * TN, TN), TN)
    ws = win_ref[t]
    cols = jax.lax.broadcasted_iota(jnp.int32, (TN, W), 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):                       # static unroll over taps
        rel = idx_ref[k, sl] - ws                           # [TN]
        onehot = (cols == rel[:, None]) & (mask_ref[k, sl][:, None] > 0)
        gathered = jax.lax.dot_general(
            onehot.astype(scratch.dtype), scratch[t % 2],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot(
            gathered.astype(w_ref.dtype), w_ref[k],
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _pallas_gather_gemm_shared(featsT, idx, mask, win_start, weights, *,
                               TN: int, W: int, interpret: bool):
    Cin, L = featsT.shape
    K = weights.shape[0]
    Cout = weights.shape[-1]
    n_tiles = L // TN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),               # idx
            pl.BlockSpec(memory_space=pltpu.VMEM),               # mask
            pl.BlockSpec(memory_space=pl.ANY),                   # featsT HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),               # weights
        ],
        out_specs=pl.BlockSpec((TN, Cout), lambda t, ws: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), featsT.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_shared, K=K, TN=TN, W=W,
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Cout), jnp.float32),
        interpret=interpret,
    )(win_start, idx, mask, featsT, weights)


def _shared_window_decision(idx, mask, L: int, TN: int, W: int):
    """Per-TILE window starts + routing test for the shared-window
    index kernel: the window must cover the union of all K taps'
    gathered rows for that tile.  No monotonicity requirement — the
    span check alone guarantees every matched row is in-window."""
    K = idx.shape[0]
    n_tiles = L // TN
    idx_t = idx.reshape(K, n_tiles, TN)
    mask_t = mask.reshape(K, n_tiles, TN).astype(bool)
    big = jnp.int32(L)
    mins = jnp.min(jnp.where(mask_t, idx_t, big), axis=(0, 2))   # [nt]
    maxs = jnp.max(jnp.where(mask_t, idx_t, -1), axis=(0, 2))
    win_start = jnp.clip(jnp.where(mins == big, 0, mins), 0,
                         max(L - W, 0)) // 128 * 128
    return win_start, jnp.all(maxs - win_start < W) & (L >= W)


def _window_decision(idx, mask, L: int, TN: int, W: int):
    """Per-(tap, tile) window starts + the pallas-vs-XLA routing test.

    idx/mask are tile-padded [K, L] arrays.  Returns (win_start [K, L//TN],
    fits bool): ``fits`` iff every tap's found indices are monotone AND
    every tile's index span fits inside one W-wide window."""
    K = idx.shape[0]
    n_tiles = L // TN
    idx_t = idx.reshape(K, n_tiles, TN)
    mask_t = mask.reshape(K, n_tiles, TN).astype(bool)
    big = jnp.int32(L)
    mins = jnp.min(jnp.where(mask_t, idx_t, big), axis=-1)      # [K, nt]
    maxs = jnp.max(jnp.where(mask_t, idx_t, -1), axis=-1)
    # round starts down to 128 (DMA offset alignment on the minor axis)
    win_start = jnp.clip(jnp.where(mins == big, 0, mins), 0,
                         max(L - W, 0)) // 128 * 128
    # monotone per tap over the found entries: every found index equals
    # the running max of found indices so far
    cm = lax.cummax(jnp.where(mask.astype(bool), idx, -1), axis=1)
    monotone = jnp.all(jnp.where(mask.astype(bool), idx == cm, True))
    fits = jnp.all(maxs - win_start < W) & (L >= W) & monotone
    return win_start, fits


def _pad_rulebook(gather_idx, found, N: int, TN: int):
    K, R = gather_idx.shape
    L = -(-max(N, R) // TN) * TN
    idx = jnp.pad(jnp.clip(gather_idx.astype(jnp.int32), 0, L - 1),
                  ((0, 0), (0, L - R)))
    mask = jnp.pad(found, ((0, 0), (0, L - R))).astype(jnp.int32)
    return idx, mask, L


def pallas_fits(gather_idx: jax.Array, found: jax.Array, n_rows: int,
                tile: int = 256, window: int = 768,
                shared: bool = True) -> jax.Array:
    """Telemetry twin of the routing decision inside the kernel wrapper:
    True iff ``gather_gemm`` with these args would take the Pallas path.
    jit-able; use it to measure the fallback rate on real rulebooks
    (bench.py reports ``pallas_fallback_rate``).  ``shared`` must match
    the kernel mode."""
    idx, mask, L = _pad_rulebook(gather_idx, found, int(n_rows), int(tile))
    if int(window) > L:
        return jnp.asarray(False)   # small-table XLA shortcut, not a miss
    decide = _shared_window_decision if shared else _window_decision
    _, fits = decide(idx, mask, L, int(tile), int(window))
    return fits


def _tile_min_max(gather_idx: np.ndarray, found: np.ndarray, n_rows: int,
                  tile: int):
    """Host twin of the per-(tap, tile) min/max reduction; returns
    (mins, maxs, L) with empty tiles as (INT64_MAX, -1)."""
    idx = np.asarray(gather_idx, np.int64)
    m = np.asarray(found, bool)
    K, R = idx.shape
    TN = int(tile)
    L = -(-max(int(n_rows), R) // TN) * TN
    idx_p = np.zeros((K, L), np.int64)
    idx_p[:, :R] = np.where(m, idx, 0)
    m_p = np.zeros((K, L), bool)
    m_p[:, :R] = m
    idx_t = idx_p.reshape(K, -1, TN)
    m_t = m_p.reshape(K, -1, TN)
    mins = np.where(m_t, idx_t, np.iinfo(np.int64).max).min(-1)
    maxs = np.where(m_t, idx_t, -1).max(-1)
    return mins, maxs, L


def tile_spans(gather_idx: np.ndarray, found: np.ndarray, n_rows: int,
               tile: int = 256) -> np.ndarray:
    """Host-side per-(tap, tile) index spans (max - 128-aligned window
    start + 1) of a rulebook — the distribution ``choose_window`` sizes
    the DMA window from.  Empty tiles report span 0."""
    mins, maxs, _ = _tile_min_max(gather_idx, found, n_rows, tile)
    start = np.where(maxs >= 0, mins, 0) // 128 * 128
    return np.where(maxs >= 0, maxs - start + 1, 0).reshape(-1)


def choose_window(rulebooks, n_rows: int, tile: int = 256,
                  max_window: int = 4096, vmem_budget_bytes: int = 8 << 20,
                  cin: int = 64, bytes_per_el: int = 2,
                  shared: bool = True) -> int:
    """Pick the DMA window from measured rulebooks: the smallest
    128-multiple W for which every sampled (tap, tile) passes the exact
    routing test in :func:`_window_decision` (including its end-of-table
    clamp), bounded by ``max_window`` and by what the double-buffered
    [2, Cin, W] VMEM scratch allows within ``vmem_budget_bytes``.

    ``rulebooks``: iterable of (gather_idx, found) or
    (gather_idx, found, n_rows_override) sampled from real scans — the
    override carries the feature-table row count when it differs from
    ``n_rows`` (e.g. strided books index the previous block's larger
    table).  Returns the bound itself if nothing smaller fits (callers
    should then expect XLA fallbacks — check ``pallas_fits``)."""
    stats = [_tile_min_max(np.asarray(b[0]), np.asarray(b[1]),
                           b[2] if len(b) > 2 else n_rows, tile)
             for b in rulebooks]
    vmem_cap = vmem_budget_bytes // (2 * cin * bytes_per_el) // 128 * 128
    bound = int(min(max_window, max(vmem_cap, 128)))
    for w in range(128, bound + 1, 128):
        ok = True
        for mins, maxs, L in stats:
            if w > L:
                ok = False      # small-table shortcut -> XLA, skip
                break
            if shared:
                # the shared kernel uses one per-tile window covering
                # the union of all taps' rows (all-empty tiles keep the
                # int64-max min sentinel and mx=-1 -> unconstrained)
                mn, mx = mins.min(0), maxs.max(0)
            else:
                mn, mx = mins, maxs
            start = np.clip(mn, 0, max(L - w, 0)) // 128 * 128
            if not np.all(np.where(mx >= 0, mx - start, -1) < w):
                ok = False
                break
        if ok:
            return w
    return bound


def choose_windows(per_block_rulebooks, n_rows: int, tile: int = 256,
                   **kw) -> tuple:
    """Per-BLOCK windows: ``choose_window`` over each block's own books.

    ``per_block_rulebooks``: sequence (one entry per middle block) of
    rulebook iterables in :func:`choose_window`'s format.  The one-hot
    gather costs tile*window*Cin per tap, so early blocks with tight key
    spans should not pay the worst block's window — feed the result to
    ``SparseMiddle.pallas_window`` / ``VoxelNetConfig
    .sparse_pallas_window`` as a tuple (len == number of blocks)."""
    return tuple(choose_window(books, n_rows, tile, **kw)
                 for books in per_block_rulebooks)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def gather_gemm(features: jax.Array, gather_idx: jax.Array,
                found: jax.Array, weights: jax.Array,
                interpret: bool | None = None, tile: int = 256,
                window: int = 768, shared: bool = True) -> jax.Array:
    """features [N, Cin] x rulebook ([K, R] idx + found) x weights
    [K, Cin, Cout] -> [R, Cout] float32.

    Semantics identical to ``sparse_conv.submanifold_conv`` /
    ``strided_sparse_conv`` (without bias/valid-masking, which callers
    apply): ``out[r] = sum_k found[k, r] * features[idx[k, r]] @ W[k]``.
    Key-sorted (windowable) rulebooks run the Pallas windowed kernel;
    anything else falls back to the XLA path inside the same jit program.

    ``shared=True`` (default): one per-tile window DMA serves all K
    taps (~K-fold less HBM traffic; the window must cover the tile's
    cross-tap union span).  ``shared=False``: per-(tap, tile) windows,
    monotone rulebooks only.

    Differentiable: backward is plain XLA (masked scatter-add for
    d/dfeatures, per-tap GEMMs for d/dweights).
    """
    return _gather_gemm_impl(features, gather_idx, found, weights,
                             interpret=interpret, tile=tile,
                             window=window, shared=shared)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "window",
                                    "shared"))
def _gather_gemm_impl(features, gather_idx, found, weights,
                      interpret=None, tile=256, window=768, shared=True):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, Cin = features.shape
    K, R = gather_idx.shape
    Cout = weights.shape[-1]
    TN, W = int(tile), int(window)

    # pad rows to a tile multiple covering both table and rulebook
    idx, mask, L = _pad_rulebook(gather_idx, found, N, TN)
    feats = jnp.pad(features, ((0, L - N), (0, 0)))

    def xla_only(f, i, m, w):
        g = jnp.where(m.astype(bool)[:, :, None], f[i], 0)
        g = jnp.transpose(g, (1, 0, 2)).reshape(L, K * Cin)
        return jnp.dot(g, w.reshape(K * Cin, Cout),
                       preferred_element_type=jnp.float32)

    if W > L:   # table smaller than one window: nothing to tile
        return xla_only(feats, idx, mask,
                        weights.astype(features.dtype))[:R]

    decide = _shared_window_decision if shared else _window_decision
    kernel = _pallas_gather_gemm_shared if shared else _pallas_gather_gemm
    win_start, fits = decide(idx, mask, L, TN, W)
    win_flat = win_start.reshape(-1)

    def pallas_path(args):
        f, i, m, wf, w = args
        return kernel(f.T, i, m, wf, w, TN=TN, W=W,
                      interpret=interpret)

    def xla_path(args):
        f, i, m, _, w = args
        return xla_only(f, i, m, w)

    out = lax.cond(fits, pallas_path, xla_path,
                   (feats, idx, mask, win_flat,
                    weights.astype(features.dtype)))
    return out[:R]


def _gather_gemm_fwd(features, gather_idx, found, weights, interpret,
                     tile, window, shared):
    out = _gather_gemm_impl(features, gather_idx, found, weights,
                            interpret=interpret, tile=tile, window=window,
                            shared=shared)
    return out, (features, gather_idx, found, weights)


def _gather_gemm_bwd(interpret, tile, window, shared, res, dout):
    features, gather_idx, found, weights = res
    N = features.shape[0]
    K, R = gather_idx.shape
    dout = dout.astype(jnp.float32)
    mask = found.astype(jnp.float32)
    idx = jnp.clip(gather_idx.astype(jnp.int32), 0, N - 1)
    w32 = weights.astype(jnp.float32)

    # dfeats[idx[k, r]] += found[k, r] * dout[r] @ W[k]^T
    contrib = jnp.einsum("ro,kio->kri", dout, w32) * mask[:, :, None]
    dfeats = jnp.zeros((N, features.shape[1]), jnp.float32)
    dfeats = dfeats.at[idx.reshape(-1)].add(contrib.reshape(K * R, -1))
    # dW[k] = (found * feats[idx[k]])^T @ dout
    gathered = features.astype(jnp.float32)[idx] * mask[:, :, None]
    dW = jnp.einsum("kri,ro->kio", gathered, dout)
    return (dfeats.astype(features.dtype), None, None,
            dW.astype(weights.dtype))


gather_gemm.defvjp(_gather_gemm_fwd, _gather_gemm_bwd)


# ---------------------------------------------------------------------------
# Key-match gather-GEMM: the join happens INSIDE the kernel.
#
# The rulebook builders above answer "which input row matches query key
# q?" with a device-wide sort join (~10 ms per FHD rulebook).  But the
# Pallas kernel never needed the row INDEX — it needs the one-hot
# matrix, and that can be built directly from the KEYS it already has
# in VMEM: onehot[i, w] = (window_keys[w] == query_keys[i]).  So the
# key-match variant consumes (sorted input keys, per-tap query keys) —
# both pure elementwise/linearize computations — and the only remaining
# device-side construction cost for a whole sparse conv stack is the
# strided blocks' output-SITE sort (sparse_conv.build_strided_sites).
# The window start per (tap, tile) comes from two tiny searchsorted
# calls on the tile's query-key range.  Unlike the index kernel, NO
# monotonicity is required — only that each tile's key range spans < W
# table rows, which key-sorted voxel layouts give by construction.
# ---------------------------------------------------------------------------

_INT32_MAX = np.iinfo(np.int32).max


def _keymatch_kernel(win_ref, qk_ref, keysT_hbm, featsT_hbm, w_ref,
                     out_ref, fscratch, kscratch, sems, ksems, *,
                     K: int, TN: int, W: int, n_tiles: int):
    """featsT_hbm: [Cin, L]; keysT_hbm: [1, L] (both windowed on the
    128-aligned minor axis); qk_ref: [K, L] per-tap query keys."""
    t = pl.program_id(0)

    def get_dma(slot, k):
        ws = pl.multiple_of(win_ref[k * n_tiles + t], 128)
        return (pltpu.make_async_copy(
                    featsT_hbm.at[:, pl.ds(ws, W)],
                    fscratch.at[slot], sems.at[slot]),
                pltpu.make_async_copy(
                    keysT_hbm.at[:, pl.ds(ws, W)],
                    kscratch.at[slot], ksems.at[slot]))

    for d in get_dma(0, 0):
        d.start()
    sl = pl.ds(pl.multiple_of(t * TN, TN), TN)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):                       # static unroll over taps
        if k + 1 < K:                        # double-buffered windows
            for d in get_dma((k + 1) % 2, k + 1):
                d.start()
        for d in get_dma(k % 2, k):
            d.wait()
        qk = qk_ref[k, sl]                                  # [TN]
        win_keys = kscratch[k % 2][0]                       # [W]
        # the join: one VPU compare builds the one-hot; sentinel queries
        # (INT32_MAX) are masked so padded queries can't match padded
        # table rows. Broadcast the int32 query column BEFORE comparing:
        # Mosaic can't insert a minor dim on 1-bit vectors.
        qcol = qk[:, None]                                  # [TN, 1] i32
        onehot = ((win_keys[None, :] == qcol)
                  & (qcol != _INT32_MAX))
        gathered = jax.lax.dot_general(
            onehot.astype(fscratch.dtype), fscratch[k % 2],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot(
            gathered.astype(w_ref.dtype), w_ref[k],
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _pallas_keymatch_gemm(featsT, keys, qk, win_start, weights, *,
                          TN: int, W: int, interpret: bool):
    Cin, L = featsT.shape
    K = weights.shape[0]
    Cout = weights.shape[-1]
    n_tiles = L // TN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),               # qk
            pl.BlockSpec(memory_space=pl.ANY),                   # keysT HBM
            pl.BlockSpec(memory_space=pl.ANY),                   # featsT HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),               # weights
        ],
        out_specs=pl.BlockSpec((TN, Cout), lambda t, ws: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), featsT.dtype),
            pltpu.VMEM((2, 1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_keymatch_kernel, K=K, TN=TN, W=W,
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Cout), jnp.float32),
        interpret=interpret,
    )(win_start, qk, keys.reshape(1, L), featsT, weights)


def _keymatch_kernel_shared(win_ref, qk_ref, keysT_hbm, featsT_hbm,
                            w_ref, out_ref, fscratch, kscratch, sems,
                            ksems, *, K: int, TN: int, W: int,
                            n_tiles: int):
    """Shared-window variant of :func:`_keymatch_kernel`: ONE feature
    window per tile serves all K taps (the per-tile window covers the
    union of every tap's matched rows), so HBM traffic drops ~K-fold —
    for 3x3x3 convs the per-tap kernel re-DMAs an almost identical
    window 27 times.  Double-buffered across grid tiles instead of
    across taps."""
    t = pl.program_id(0)

    def get_dma(slot, tt):
        ws = pl.multiple_of(win_ref[tt], 128)
        return (pltpu.make_async_copy(
                    featsT_hbm.at[:, pl.ds(ws, W)],
                    fscratch.at[slot], sems.at[slot]),
                pltpu.make_async_copy(
                    keysT_hbm.at[:, pl.ds(ws, W)],
                    kscratch.at[slot], ksems.at[slot]))

    @pl.when(t == 0)
    def _start_first():
        for d in get_dma(0, 0):
            d.start()

    @pl.when(t + 1 < n_tiles)
    def _start_next():
        for d in get_dma((t + 1) % 2, t + 1):
            d.start()

    for d in get_dma(t % 2, t):
        d.wait()

    sl = pl.ds(pl.multiple_of(t * TN, TN), TN)
    win_keys = kscratch[t % 2][0]                           # [W]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):                       # static unroll over taps
        qk = qk_ref[k, sl]                                  # [TN]
        qcol = qk[:, None]                                  # [TN, 1] i32
        onehot = ((win_keys[None, :] == qcol)
                  & (qcol != _INT32_MAX))
        gathered = jax.lax.dot_general(
            onehot.astype(fscratch.dtype), fscratch[t % 2],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot(
            gathered.astype(w_ref.dtype), w_ref[k],
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _pallas_keymatch_gemm_shared(featsT, keys, qk, win_start, weights, *,
                                 TN: int, W: int, interpret: bool):
    Cin, L = featsT.shape
    K = weights.shape[0]
    Cout = weights.shape[-1]
    n_tiles = L // TN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),               # qk
            pl.BlockSpec(memory_space=pl.ANY),                   # keysT HBM
            pl.BlockSpec(memory_space=pl.ANY),                   # featsT HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),               # weights
        ],
        out_specs=pl.BlockSpec((TN, Cout), lambda t, ws: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), featsT.dtype),
            pltpu.VMEM((2, 1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_keymatch_kernel_shared, K=K, TN=TN, W=W,
                          n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Cout), jnp.float32),
        interpret=interpret,
    )(win_start, qk, keys.reshape(1, L), featsT, weights)


def _keymatch_kernel_subwin(win_ref, off_ref, qk_ref, keysT_hbm,
                            featsT_hbm, w_ref, out_ref, fscratch,
                            kscratch, sems, ksems, *, K: int, TN: int,
                            W: int, WS: int, n_tiles: int):
    """Per-tap SUBWINDOW variant of :func:`_keymatch_kernel_shared`.

    One per-tile union-window DMA (width ``W``) serves all K taps, but
    each tap compares + gathers only a ``WS``-wide slice of it at a
    prefetched per-(tap, tile) offset: a single tap's matched rows span
    ~1.5-3x less than the K-tap union (tools/span_analysis.py), and the
    one-hot compare (VPU) and gather matmul (MXU) both scale with the
    compare width, so the dominant kernel cost drops by that ratio at
    ZERO extra HBM traffic.

    No validity mask pass: the wrapper zeroes feature rows whose key is
    the INT32_MAX sentinel, so sentinel queries can only ever match
    zero-feature rows and contribute nothing.
    """
    t = pl.program_id(0)

    def get_dma(slot, tt):
        ws = pl.multiple_of(win_ref[tt], 128)
        return (pltpu.make_async_copy(
                    featsT_hbm.at[:, pl.ds(ws, W)],
                    fscratch.at[slot], sems.at[slot]),
                pltpu.make_async_copy(
                    keysT_hbm.at[:, pl.ds(ws, W)],
                    kscratch.at[slot], ksems.at[slot]))

    @pl.when(t == 0)
    def _start_first():
        for d in get_dma(0, 0):
            d.start()

    @pl.when(t + 1 < n_tiles)
    def _start_next():
        for d in get_dma((t + 1) % 2, t + 1):
            d.start()

    for d in get_dma(t % 2, t):
        d.wait()

    sl = pl.ds(pl.multiple_of(t * TN, TN), TN)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for k in range(K):                       # static unroll over taps
        o = pl.multiple_of(off_ref[k * n_tiles + t], 128)
        sub_keys = kscratch[t % 2, 0, pl.ds(o, WS)]         # [WS]
        qcol = qk_ref[k, sl][:, None]                       # [TN, 1] i32
        onehot = (sub_keys[None, :] == qcol)
        gathered = jax.lax.dot_general(
            onehot.astype(fscratch.dtype),
            fscratch[t % 2, :, pl.ds(o, WS)],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + jax.lax.dot(
            gathered.astype(w_ref.dtype), w_ref[k],
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _pallas_keymatch_gemm_subwin(featsT, keys, qk, win_start, tap_off,
                                 weights, *, TN: int, W: int, WS: int,
                                 interpret: bool):
    Cin, L = featsT.shape
    K = weights.shape[0]
    Cout = weights.shape[-1]
    n_tiles = L // TN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),               # qk
            pl.BlockSpec(memory_space=pl.ANY),                   # keysT HBM
            pl.BlockSpec(memory_space=pl.ANY),                   # featsT HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),               # weights
        ],
        out_specs=pl.BlockSpec((TN, Cout), lambda t, ws, off: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), featsT.dtype),
            pltpu.VMEM((2, 1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_keymatch_kernel_subwin, K=K, TN=TN, W=W,
                          WS=WS, n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Cout), jnp.float32),
        interpret=interpret,
    )(win_start, tap_off, qk, keys.reshape(1, L), featsT, weights)


def _keymatch_kernel_grouped(win_ref, off_ref, qk_ref, keysT_hbm,
                             featsT_hbm, w_ref, out_ref, fscratch,
                             kscratch, sems, ksems, *, NG: int, G: int,
                             TN: int, W: int, WS: int, n_tiles: int):
    """Grouped-tap variant of :func:`_keymatch_kernel_subwin`.

    Taps arrive pre-permuted so that each contiguous run of ``G`` taps
    differs only in dz (see :func:`group_perm`).  Under the depth-minor
    key order a dz shift moves a query key by exactly +-1, so a group's
    matched rows span barely more than a single tap's — one
    per-(group, tile) subwindow serves all G taps.  The G one-hot
    matrices stack row-wise into ONE gather matmul
    ``[G*TN, WS] @ [WS, Cin]`` and the accumulate collapses to ONE
    ``[TN, G*Cin] @ [G*Cin, Cout]`` matmul per group: G-fold fewer,
    G-fold larger MXU ops than the per-tap kernel at identical MACs —
    this attacks the measured efficiency gap (many narrow matmuls), not
    the MAC count.

    No validity mask pass: the wrapper zeroes feature rows whose key is
    the INT32_MAX sentinel, so sentinel queries can only ever match
    zero-feature rows and contribute nothing.
    """
    t = pl.program_id(0)

    def get_dma(slot, tt):
        ws = pl.multiple_of(win_ref[tt], 128)
        return (pltpu.make_async_copy(
                    featsT_hbm.at[:, pl.ds(ws, W)],
                    fscratch.at[slot], sems.at[slot]),
                pltpu.make_async_copy(
                    keysT_hbm.at[:, pl.ds(ws, W)],
                    kscratch.at[slot], ksems.at[slot]))

    @pl.when(t == 0)
    def _start_first():
        for d in get_dma(0, 0):
            d.start()

    @pl.when(t + 1 < n_tiles)
    def _start_next():
        for d in get_dma((t + 1) % 2, t + 1):
            d.start()

    for d in get_dma(t % 2, t):
        d.wait()

    sl = pl.ds(pl.multiple_of(t * TN, TN), TN)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(NG):                    # static unroll over groups
        o = pl.multiple_of(off_ref[g * n_tiles + t], 128)
        sub_keys = kscratch[t % 2, 0, pl.ds(o, WS)]         # [WS]
        onehots = []
        for i in range(G):
            qcol = qk_ref[g * G + i, sl][:, None]           # [TN, 1]
            onehots.append(
                (sub_keys[None, :] == qcol).astype(fscratch.dtype))
        stacked = jnp.concatenate(onehots, axis=0)          # [G*TN, WS]
        gathered = jax.lax.dot_general(
            stacked, fscratch[t % 2, :, pl.ds(o, WS)],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [G*TN, Cin]
        cols = jnp.concatenate(
            [lax.slice_in_dim(gathered, i * TN, (i + 1) * TN, axis=0)
             for i in range(G)], axis=1)                    # [TN, G*Cin]
        acc = acc + jax.lax.dot(
            cols.astype(w_ref.dtype), w_ref[g],
            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _pallas_keymatch_gemm_grouped(featsT, keys, qk, win_start, grp_off,
                                  weights_g, *, TN: int, W: int,
                                  WS: int, G: int, interpret: bool):
    """``weights_g``: [NG, G*Cin, Cout] — taps pre-permuted into
    contiguous dz-groups and flattened tap-major into the contraction
    axis (matching the kernel's column concatenation order)."""
    Cin, L = featsT.shape
    NG = weights_g.shape[0]
    Cout = weights_g.shape[-1]
    n_tiles = L // TN

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),               # qk
            pl.BlockSpec(memory_space=pl.ANY),                   # keysT HBM
            pl.BlockSpec(memory_space=pl.ANY),                   # featsT HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),               # weights
        ],
        out_specs=pl.BlockSpec((TN, Cout), lambda t, ws, off: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Cin, W), featsT.dtype),
            pltpu.VMEM((2, 1, W), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_keymatch_kernel_grouped, NG=NG, G=G, TN=TN,
                          W=W, WS=WS, n_tiles=n_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, Cout), jnp.float32),
        interpret=interpret,
    )(win_start, grp_off, qk, keys.reshape(1, L), featsT, weights_g)


def group_perm(kernel_size) -> np.ndarray:
    """Tap permutation that makes dz-groups CONTIGUOUS: tap enumeration
    (:func:`sparse_conv._offsets` / ``conv_taps``) is z-major
    (``k = (dz*ky + dy)*kx + dx``); the grouped kernel wants
    (dy, dx)-major with dz minor — ``ky*kx`` groups of ``kz`` taps
    each.  Apply to BOTH the query-key
    rows and the weight taps: ``qk[perm], w[perm]`` (the tap sum is
    permutation-invariant, so results are unchanged)."""
    kz, ky, kx = (int(k) for k in kernel_size)
    g, i = np.meshgrid(np.arange(ky * kx), np.arange(kz),
                       indexing="ij")
    return (i * (ky * kx) + g).reshape(-1)          # [ky*kx*kz]


def _keymatch_group_decision(keys, qk, L: int, TN: int, W: int,
                             WS: int, G: int):
    """Union window starts [nt] + per-(GROUP, tile) subwindow offsets
    [NG, nt] + routing test (grouped twin of
    :func:`_keymatch_subwin_decision`): the union window must cover
    every tap's matched rows AND each dz-group's matched rows must fit
    its WS-wide subwindow.  ``qk`` must already be group-permuted."""
    K = qk.shape[0]
    NG = K // G
    n_tiles = L // TN
    qk_t = qk.reshape(NG, G, n_tiles, TN)
    validq = qk_t != _INT32_MAX
    big = jnp.int32(_INT32_MAX)
    lo = jnp.min(jnp.where(validq, qk_t, big), axis=(1, 3))    # [NG, nt]
    hi = jnp.max(jnp.where(validq, qk_t, -1), axis=(1, 3))
    start_row = jnp.searchsorted(keys, lo).astype(jnp.int32)
    end_row = jnp.searchsorted(keys, hi, side="right").astype(jnp.int32)
    lo_u, hi_u = lo.min(0), hi.max(0)                          # [nt]
    su = jnp.searchsorted(keys, lo_u).astype(jnp.int32)
    eu = jnp.searchsorted(keys, hi_u, side="right").astype(jnp.int32)
    win_start = (jnp.clip(jnp.where(lo_u == big, 0, su), 0,
                          max(L - W, 0)) // 128 * 128)
    fits_u = jnp.where(hi_u < 0, True, eu - 1 - win_start < W)
    off = jnp.clip((start_row - win_start[None, :]) // 128 * 128,
                   0, max(W - WS, 0))
    fits_g = jnp.where(hi < 0, True,
                       end_row - 1 - (win_start[None, :] + off) < WS)
    sorted_unique = jnp.all((keys[1:] > keys[:-1])
                            | (keys[1:] == big))
    fits = jnp.all(fits_u) & jnp.all(fits_g) & sorted_unique
    return win_start, off, fits


def _keymatch_subwin_decision(keys, qk, L: int, TN: int, W: int,
                              WS: int):
    """Union window starts [nt] + per-(tap, tile) subwindow offsets
    [K, nt] (row offsets INTO the union window, 128-aligned) + routing
    test: the union window must cover every tap's matched rows AND each
    tap's matched rows must fit its WS-wide subwindow."""
    K = qk.shape[0]
    n_tiles = L // TN
    qk_t = qk.reshape(K, n_tiles, TN)
    validq = qk_t != _INT32_MAX
    big = jnp.int32(_INT32_MAX)
    lo = jnp.min(jnp.where(validq, qk_t, big), axis=-1)         # [K, nt]
    hi = jnp.max(jnp.where(validq, qk_t, -1), axis=-1)
    start_row = jnp.searchsorted(keys, lo).astype(jnp.int32)
    end_row = jnp.searchsorted(keys, hi, side="right").astype(jnp.int32)
    lo_u, hi_u = lo.min(0), hi.max(0)                           # [nt]
    su = jnp.searchsorted(keys, lo_u).astype(jnp.int32)
    eu = jnp.searchsorted(keys, hi_u, side="right").astype(jnp.int32)
    win_start = (jnp.clip(jnp.where(lo_u == big, 0, su), 0,
                          max(L - W, 0)) // 128 * 128)
    fits_u = jnp.where(hi_u < 0, True, eu - 1 - win_start < W)
    # per-tap offset: subwindow starts at/below the tap's first matched
    # row; win_start <= su//128*128 <= start_row except when clipped to
    # L-W, where the union fit already bounds everything
    off = jnp.clip((start_row - win_start[None, :]) // 128 * 128,
                   0, max(W - WS, 0))
    fits_k = jnp.where(hi < 0, True,
                       end_row - 1 - (win_start[None, :] + off) < WS)
    sorted_unique = jnp.all((keys[1:] > keys[:-1])
                            | (keys[1:] == big))
    fits = jnp.all(fits_u) & jnp.all(fits_k) & sorted_unique
    return win_start, off, fits


def _keymatch_shared_window_decision(keys, qk, L: int, TN: int, W: int):
    """Per-TILE window starts + routing test for the shared-window
    key-match kernel: the window must cover the union of all K taps'
    matched rows for that tile."""
    K = qk.shape[0]
    n_tiles = L // TN
    qk_t = qk.reshape(K, n_tiles, TN)
    validq = qk_t != _INT32_MAX
    big = jnp.int32(_INT32_MAX)
    lo = jnp.min(jnp.where(validq, qk_t, big), axis=(0, 2))     # [nt]
    hi = jnp.max(jnp.where(validq, qk_t, -1), axis=(0, 2))      # [nt]
    start_row = jnp.searchsorted(keys, lo).astype(jnp.int32)
    end_row = jnp.searchsorted(keys, hi, side="right").astype(jnp.int32)
    win_start = (jnp.clip(jnp.where(lo == big, 0, start_row), 0,
                          max(L - W, 0)) // 128 * 128)
    fits_tile = jnp.where(hi < 0, True, end_row - 1 - win_start < W)
    sorted_unique = jnp.all((keys[1:] > keys[:-1])
                            | (keys[1:] == big))
    return win_start, jnp.all(fits_tile) & sorted_unique


def _keymatch_window_decision(keys, qk, L: int, TN: int, W: int):
    """Per-(tap, tile) window starts + routing test for the key-match
    kernel.  ``keys`` [L] must be ascending with unique valid entries
    (INT32_MAX padding); ``fits`` is False otherwise, so unsorted
    layouts take the exact XLA fallback instead of silently mismatching.
    """
    K = qk.shape[0]
    n_tiles = L // TN
    qk_t = qk.reshape(K, n_tiles, TN)
    validq = qk_t != _INT32_MAX
    big = jnp.int32(_INT32_MAX)
    lo = jnp.min(jnp.where(validq, qk_t, big), axis=-1)         # [K, nt]
    hi = jnp.max(jnp.where(validq, qk_t, -1), axis=-1)
    start_row = jnp.searchsorted(keys, lo).astype(jnp.int32)
    end_row = jnp.searchsorted(keys, hi, side="right").astype(jnp.int32)
    win_start = (jnp.clip(jnp.where(lo == big, 0, start_row), 0,
                          max(L - W, 0)) // 128 * 128)
    fits_tile = jnp.where(hi < 0, True, end_row - 1 - win_start < W)
    sorted_unique = jnp.all((keys[1:] > keys[:-1])
                            | (keys[1:] == big))
    return win_start, jnp.all(fits_tile) & sorted_unique


def keymatch_fits(in_keys: jax.Array, q_keys: jax.Array,
                  tile: int = 256, window: int = 768,
                  shared: bool = True, subwindow: int = 0,
                  group: int = 1) -> jax.Array:
    """Telemetry twin of the key-match routing decision (cf.
    :func:`pallas_fits`).  ``shared``/``subwindow``/``group`` must
    match the kernel mode (``q_keys`` group-permuted when group > 1)."""
    N = in_keys.shape[0]
    K, M = q_keys.shape
    TN = int(tile)
    L = -(-max(N, M) // TN) * TN
    if int(window) > L:
        return jnp.asarray(False)   # small-table XLA shortcut, not a miss
    keys = jnp.pad(in_keys, (0, L - N), constant_values=_INT32_MAX)
    qk = jnp.pad(q_keys, ((0, 0), (0, L - M)),
                 constant_values=_INT32_MAX)
    if subwindow and group > 1:
        _, _, fits = _keymatch_group_decision(keys, qk, L, TN,
                                              int(window),
                                              int(subwindow),
                                              int(group))
        return fits
    if subwindow:
        _, _, fits = _keymatch_subwin_decision(keys, qk, L, TN,
                                               int(window),
                                               int(subwindow))
        return fits
    decide = (_keymatch_shared_window_decision if shared
              else _keymatch_window_decision)
    _, fits = decide(keys, qk, L, TN, int(window))
    return fits


def keymatch_tap_spans(in_keys: np.ndarray, q_keys: np.ndarray,
                       tile: int = 256) -> np.ndarray:
    """Host-side per-(tap, tile) row spans for the SUBWINDOW key-match
    kernel: for each tap and output tile, how many table rows (from the
    128-aligned subwindow start) that single tap's matched range
    covers.  The smallest viable subwindow is
    ``ceil(max(spans)/128)*128``; size ``choose_keymatch_subwindow``
    from these over sampled scans.  Empty (tap, tile)s report 0."""
    big = np.iinfo(np.int32).max
    keys = np.asarray(in_keys, np.int64)
    qk = np.asarray(q_keys, np.int64)
    N = keys.shape[0]
    K, M = qk.shape
    TN = int(tile)
    L = -(-max(N, M) // TN) * TN
    keys_p = np.full(L, big, np.int64)
    keys_p[:N] = keys
    qk_p = np.full((K, L), big, np.int64)
    qk_p[:, :M] = qk
    qk_t = qk_p.reshape(K, -1, TN)
    validq = qk_t != big
    lo = np.where(validq, qk_t, np.iinfo(np.int64).max).min(2)  # [K, nt]
    hi = np.where(validq, qk_t, -1).max(2)
    start = np.searchsorted(keys_p, lo) // 128 * 128
    end = np.searchsorted(keys_p, hi, side="right")
    return np.where(hi >= 0, end - start, 0).reshape(-1)


def keymatch_group_spans(in_keys: np.ndarray, q_keys: np.ndarray,
                         tile: int = 256, group: int = 1) -> np.ndarray:
    """Host-side per-(GROUP, tile) row spans for the grouped key-match
    kernel (``q_keys`` must already be group-permuted — see
    :func:`group_perm`): how many table rows each dz-group's matched
    range covers from its 128-aligned subwindow start.  Under the
    depth-minor key order this is barely wider than a single tap's span
    (a dz shift moves a query key by +-1)."""
    big = np.iinfo(np.int32).max
    keys = np.asarray(in_keys, np.int64)
    qk = np.asarray(q_keys, np.int64)
    N = keys.shape[0]
    K, M = qk.shape
    G = int(group)
    TN = int(tile)
    L = -(-max(N, M) // TN) * TN
    keys_p = np.full(L, big, np.int64)
    keys_p[:N] = keys
    qk_p = np.full((K, L), big, np.int64)
    qk_p[:, :M] = qk
    qk_t = qk_p.reshape(K // G, G, -1, TN)
    validq = qk_t != big
    lo = np.where(validq, qk_t, np.iinfo(np.int64).max).min((1, 3))
    hi = np.where(validq, qk_t, -1).max((1, 3))                # [NG, nt]
    start = np.searchsorted(keys_p, lo) // 128 * 128
    end = np.searchsorted(keys_p, hi, side="right")
    return np.where(hi >= 0, end - start, 0).reshape(-1)


def choose_keymatch_subwindow(samples, tile: int = 256,
                              max_window: int = 4096) -> int:
    """Smallest 128-multiple subwindow covering every sampled
    per-(tap, tile) span (:func:`keymatch_tap_spans`), bounded by
    ``max_window``.  ``samples``: iterable of (in_keys, q_keys) host
    arrays from real scans."""
    need = 128
    for in_keys, qk in samples:
        spans = keymatch_tap_spans(np.asarray(in_keys), np.asarray(qk),
                                   tile)
        if spans.size:
            need = max(need, int(-(-int(spans.max()) // 128) * 128))
    return int(min(need, max_window))


def keymatch_window_spans(in_keys: np.ndarray, q_keys: np.ndarray,
                          tile: int = 256) -> np.ndarray:
    """Host-side per-tile UNION row spans for the shared-window
    key-match kernel: for each output tile, how many table rows
    (from the 128-aligned window start) the union of every tap's
    matched range covers.  The smallest viable shared window is
    ``ceil(max(spans)/128)*128`` — size ``choose_keymatch_window``
    from these over sampled scans.  Empty tiles report 0."""
    big = np.iinfo(np.int32).max
    keys = np.asarray(in_keys, np.int64)
    qk = np.asarray(q_keys, np.int64)
    N = keys.shape[0]
    K, M = qk.shape
    TN = int(tile)
    L = -(-max(N, M) // TN) * TN
    keys_p = np.full(L, big, np.int64)
    keys_p[:N] = keys
    qk_p = np.full((K, L), big, np.int64)
    qk_p[:, :M] = qk
    qk_t = qk_p.reshape(K, -1, TN)
    validq = qk_t != big
    lo = np.where(validq, qk_t, np.iinfo(np.int64).max).min((0, 2))
    hi = np.where(validq, qk_t, -1).max((0, 2))
    start = np.searchsorted(keys_p, lo) // 128 * 128
    end = np.searchsorted(keys_p, hi, side="right")
    return np.where(hi >= 0, end - start, 0)


def choose_keymatch_window(samples, tile: int = 256,
                           max_window: int = 4096,
                           vmem_budget_bytes: int = 8 << 20,
                           cin: int = 64, bytes_per_el: int = 2) -> int:
    """Smallest 128-multiple window covering every sampled per-tile
    union span (:func:`keymatch_window_spans`), bounded by
    ``max_window`` and the double-buffered VMEM scratch budget.
    ``samples``: iterable of (in_keys, q_keys) host arrays from real
    scans.  Returns the bound itself if nothing smaller fits (expect
    XLA fallbacks — check ``keymatch_fits``)."""
    need = 128
    for in_keys, qk in samples:
        spans = keymatch_window_spans(np.asarray(in_keys),
                                      np.asarray(qk), tile)
        if spans.size:
            need = max(need, int(-(-int(spans.max()) // 128) * 128))
    vmem_cap = vmem_budget_bytes // (2 * cin * bytes_per_el) // 128 * 128
    return int(min(max(need, 128), max_window, max(vmem_cap, 128)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def keymatch_gemm(features: jax.Array, in_keys: jax.Array,
                  q_keys: jax.Array, weights: jax.Array,
                  interpret: bool | None = None, tile: int = 256,
                  window: int = 768, shared: bool = True,
                  subwindow: int = 0, group: int = 1) -> jax.Array:
    """features [N, Cin] x sorted keys [N] x query keys [K, M] x weights
    [K, Cin, Cout] -> [M, Cout] float32.

    ``out[m] = sum_k (exists j: in_keys[j] == q_keys[k, m])
               * features[j] @ W[k]`` — submanifold / strided sparse
    conv semantics with the rulebook join fused into the kernel.  Query
    keys come from :func:`sparse_conv.subm_tap_keys` /
    :func:`sparse_conv.strided_tap_keys`; INT32_MAX marks no-query.
    Layouts whose tile key-spans exceed the window (or unsorted keys)
    fall back to an exact XLA merge-join path inside the same jit.

    ``shared=True`` (default): one per-tile window DMA serves all K
    taps (~K-fold less HBM traffic; window must cover the tile's
    cross-tap union span).  ``shared=False``: per-(tap, tile) windows.

    ``subwindow=WS > 0`` (implies shared DMA): each tap compares and
    gathers only a WS-wide slice of the per-tile union window at a
    per-(tap, tile) offset — a single tap's matched rows span ~1.5-3x
    less than the K-tap union, and the one-hot compare (VPU) + gather
    matmul (MXU) both scale with the compare width.  Size WS with
    :func:`choose_keymatch_subwindow`.

    ``group=G > 1`` (requires subwindow mode; ``G`` must divide K and
    the CALLER must have permuted ``q_keys`` rows and ``weights`` taps
    with :func:`group_perm` so each contiguous G-tap run differs only
    in dz): the G one-hot matrices share one per-(group, tile)
    subwindow and stack into ONE gather matmul + ONE accumulate matmul
    — G-fold fewer, G-fold larger MXU ops at identical MACs.
    """
    return _keymatch_impl(features, in_keys, q_keys, weights,
                          interpret=interpret, tile=tile, window=window,
                          shared=shared, subwindow=subwindow,
                          group=group)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "window",
                                    "shared", "subwindow", "group"))
def _keymatch_impl(features, in_keys, q_keys, weights, interpret=None,
                   tile=256, window=768, shared=True, subwindow=0,
                   group=1):
    from automatic_as_built_reconstruction_tpu.ops.sparse_conv import (
        _merge_lookup)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, Cin = features.shape
    K, M = q_keys.shape
    Cout = weights.shape[-1]
    TN, W, WS = int(tile), int(window), int(subwindow)

    L = -(-max(N, M) // TN) * TN
    feats = jnp.pad(features, ((0, L - N), (0, 0)))
    keys = jnp.pad(in_keys, (0, L - N), constant_values=_INT32_MAX)
    qk = jnp.pad(q_keys, ((0, 0), (0, L - M)),
                 constant_values=_INT32_MAX)
    # zero the features of sentinel-key rows (invalid/padded voxels):
    # sentinel queries can then only ever match zero rows, so the
    # kernels need no per-tap validity mask pass
    feats = jnp.where((keys == _INT32_MAX)[:, None], 0, feats)

    def xla_path(args):
        f, ky, q, w = args[0], args[1], args[2], args[-1]
        idx, hit = _merge_lookup(ky, q.reshape(-1))
        g = jnp.where(hit.reshape(K, L)[:, :, None],
                      f[idx.reshape(K, L)], 0)
        g = jnp.transpose(g, (1, 0, 2)).reshape(L, K * Cin)
        return jnp.dot(g, w.reshape(K * Cin, Cout),
                       preferred_element_type=jnp.float32)

    w_cast = weights.astype(features.dtype)
    if W > L or (WS and WS > W):  # table smaller than one window
        return xla_path((feats, keys, qk, w_cast))[:M]

    if WS and group > 1:
        if K % group:
            raise ValueError(f"group={group} must divide K={K}")
        win_start, grp_off, fits = _keymatch_group_decision(
            keys, qk, L, TN, W, WS, int(group))
        NG = K // int(group)
        wg = w_cast.reshape(NG, int(group) * Cin, Cout)

        def pallas_path(args):
            f, ky, q, wf, off, w = args
            return _pallas_keymatch_gemm_grouped(
                f.T, ky, q, wf, off, w, TN=TN, W=W, WS=WS,
                G=int(group), interpret=interpret)

        out = lax.cond(fits, pallas_path,
                       lambda a: xla_path((a[0], a[1], a[2], w_cast)),
                       (feats, keys, qk, win_start.reshape(-1),
                        grp_off.reshape(-1), wg))
        return out[:M]

    if WS:
        win_start, tap_off, fits = _keymatch_subwin_decision(
            keys, qk, L, TN, W, WS)

        def pallas_path(args):
            f, ky, q, wf, off, w = args
            return _pallas_keymatch_gemm_subwin(
                f.T, ky, q, wf, off, w, TN=TN, W=W, WS=WS,
                interpret=interpret)

        out = lax.cond(fits, pallas_path, lambda a: xla_path(a),
                       (feats, keys, qk, win_start.reshape(-1),
                        tap_off.reshape(-1), w_cast))
        return out[:M]

    decide = (_keymatch_shared_window_decision if shared
              else _keymatch_window_decision)
    kernel = (_pallas_keymatch_gemm_shared if shared
              else _pallas_keymatch_gemm)
    win_start, fits = decide(keys, qk, L, TN, W)

    def pallas_path(args):
        f, ky, q, wf, w = args
        return kernel(f.T, ky, q, wf, w, TN=TN, W=W,
                      interpret=interpret)

    out = lax.cond(fits, pallas_path, xla_path,
                   (feats, keys, qk, win_start.reshape(-1), w_cast))
    return out[:M]


def _keymatch_fwd(features, in_keys, q_keys, weights, interpret, tile,
                  window, shared, subwindow, group):
    out = _keymatch_impl(features, in_keys, q_keys, weights,
                         interpret=interpret, tile=tile, window=window,
                         shared=shared, subwindow=subwindow,
                         group=group)
    return out, (features, in_keys, q_keys, weights)


def _keymatch_bwd(interpret, tile, window, shared, subwindow, group,
                  res, dout):
    from automatic_as_built_reconstruction_tpu.ops.sparse_conv import (
        _merge_lookup)

    features, in_keys, q_keys, weights = res
    N = features.shape[0]
    K, M = q_keys.shape
    idx, hit = _merge_lookup(in_keys, q_keys.reshape(-1))
    gather_idx = idx.reshape(K, M)
    found = hit.reshape(K, M)
    dfeats, _, _, dW = _gather_gemm_bwd(
        interpret, tile, window, shared,
        (features, gather_idx, found, weights), dout)
    return dfeats, None, None, dW


keymatch_gemm.defvjp(_keymatch_fwd, _keymatch_bwd)
