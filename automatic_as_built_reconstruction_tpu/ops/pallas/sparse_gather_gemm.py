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
                tile: int = 256, window: int = 768) -> jax.Array:
    """Telemetry twin of the routing decision inside the kernel wrapper:
    True iff ``gather_gemm`` with these args would take the Pallas path.
    jit-able; use it to measure the fallback rate on real rulebooks
    (bench.py reports ``pallas_fallback_rate``)."""
    idx, mask, L = _pad_rulebook(gather_idx, found, int(n_rows), int(tile))
    if int(window) > L:
        return jnp.asarray(False)   # small-table XLA shortcut, not a miss
    _, fits = _window_decision(idx, mask, L, int(tile), int(window))
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
                  cin: int = 64, bytes_per_el: int = 2) -> int:
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
            start = np.clip(mins, 0, max(L - w, 0)) // 128 * 128
            if not np.all(np.where(maxs >= 0, maxs - start, -1) < w):
                ok = False
                break
        if ok:
            return w
    return bound


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gather_gemm(features: jax.Array, gather_idx: jax.Array,
                found: jax.Array, weights: jax.Array,
                interpret: bool | None = None, tile: int = 256,
                window: int = 768) -> jax.Array:
    """features [N, Cin] x rulebook ([K, R] idx + found) x weights
    [K, Cin, Cout] -> [R, Cout] float32.

    Semantics identical to ``sparse_conv.submanifold_conv`` /
    ``strided_sparse_conv`` (without bias/valid-masking, which callers
    apply): ``out[r] = sum_k found[k, r] * features[idx[k, r]] @ W[k]``.
    Monotone (key-sorted) rulebooks run the Pallas windowed kernel;
    anything else falls back to the XLA path inside the same jit program.

    Differentiable: backward is plain XLA (masked scatter-add for
    d/dfeatures, per-tap GEMMs for d/dweights).
    """
    return _gather_gemm_impl(features, gather_idx, found, weights,
                             interpret=interpret, tile=tile,
                             window=window)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "window"))
def _gather_gemm_impl(features, gather_idx, found, weights,
                      interpret=None, tile=256, window=768):
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

    win_start, fits = _window_decision(idx, mask, L, TN, W)
    win_flat = win_start.reshape(-1)

    def pallas_path(args):
        f, i, m, wf, w = args
        return _pallas_gather_gemm(f.T, i, m, wf, w, TN=TN, W=W,
                                   interpret=interpret)

    def xla_path(args):
        f, i, m, _, w = args
        return xla_only(f, i, m, w)

    out = lax.cond(fits, pallas_path, xla_path,
                   (feats, idx, mask, win_flat,
                    weights.astype(features.dtype)))
    return out[:R]


def _gather_gemm_fwd(features, gather_idx, found, weights, interpret,
                     tile, window):
    out = _gather_gemm_impl(features, gather_idx, found, weights,
                            interpret=interpret, tile=tile, window=window)
    return out, (features, gather_idx, found, weights)


def _gather_gemm_bwd(interpret, tile, window, res, dout):
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
