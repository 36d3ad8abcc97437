"""Pallas gather-GEMM kernel for sparse 3D convolution (north-star N1).

The XLA path in ``ops.sparse_conv`` materializes the gathered neighbor
tensor ``[K, N, Cin]`` to HBM, transposes it, and feeds a GEMM — three
HBM round-trips of a tensor 27x the feature map.  This kernel keeps
everything in VMEM: the feature table is resident, each kernel tap is a
hardware ``dynamic_gather`` (``jnp.take_along_axis`` row-gather lowers to
``tpu.dynamic_gather`` on Mosaic), the tap mask is a VPU multiply, and
the per-tap GEMM accumulates on the MXU in fp32.

[ref: external spconv gather-GEMM-scatter pipeline,
spconv/src/spconv/reordering.cu — lineage-expected, UNVERIFIED;
BASELINE.json names "gather-GEMM-scatter Pallas kernels" explicitly]

Constraint inherited from Mosaic's gather lowering: the gather's index
array must match the operand shape, so the rulebook is padded so that the
row count of every gather equals the feature-table row count N.  Callers
with fewer output rows (strided convs, R < N) pad and slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(feats_ref, idx_ref, mask_ref, w_ref, out_ref, *, K: int):
    N, Cin = feats_ref.shape
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    feats = feats_ref[:]
    for k in range(K):
        idx2d = jnp.broadcast_to(idx_ref[k][:, None], (N, Cin))
        g = jnp.take_along_axis(feats, idx2d, axis=0)   # tpu.dynamic_gather
        g = g * mask_ref[k][:, None]
        acc = acc + jax.lax.dot(g, w_ref[k],
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_gemm(features: jax.Array, gather_idx: jax.Array,
                found: jax.Array, weights: jax.Array,
                interpret: bool | None = None) -> jax.Array:
    """features [N, Cin] x rulebook ([K, R] idx + found) x weights
    [K, Cin, Cout] -> [R, Cout] float32.

    Semantics identical to ``sparse_conv.submanifold_conv`` /
    ``strided_sparse_conv`` (without bias/valid-masking, which callers
    apply): ``out[r] = sum_k found[k, r] * features[idx[k, r]] @ W[k]``.

    Differentiable: forward is the Pallas kernel; the backward pass is
    plain XLA (masked scatter-add for d/dfeatures, per-tap GEMMs for
    d/dweights) — gradients match the XLA reference path.
    """
    return _gather_gemm_impl(features, gather_idx, found, weights,
                             interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_gemm_impl(features, gather_idx, found, weights,
                      interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, Cin = features.shape
    K, R = gather_idx.shape
    # Mosaic's gather needs index shape == operand shape: pad both the
    # feature table and the rulebook rows to L = max(N, R)
    L = max(N, R)
    if N < L:
        features = jnp.pad(features, ((0, L - N), (0, 0)))
    if R < L:
        pad = ((0, 0), (0, L - R))
        gather_idx = jnp.pad(gather_idx, pad)
        found = jnp.pad(found, pad)
    mask = found.astype(features.dtype)
    idx = jnp.clip(gather_idx.astype(jnp.int32), 0, L - 1)

    out = pl.pallas_call(
        functools.partial(_kernel, K=K),
        out_shape=jax.ShapeDtypeStruct((L, weights.shape[-1]), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(features, idx, mask, weights.astype(features.dtype))
    return out[:R]


def _gather_gemm_fwd(features, gather_idx, found, weights, interpret):
    out = _gather_gemm_impl(features, gather_idx, found, weights, interpret)
    return out, (features, gather_idx, found, weights)


def _gather_gemm_bwd(interpret, res, dout):
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
    dfeats = dfeats.at[idx.reshape(-1)].add(
        contrib.reshape(K * R, -1))
    # dW[k] = (found * feats[idx[k]])^T @ dout
    gathered = features.astype(jnp.float32)[idx] * mask[:, :, None]
    dW = jnp.einsum("kri,ro->kio", gathered, dout)
    return (dfeats.astype(features.dtype), None, None,
            dW.astype(weights.dtype))


gather_gemm.defvjp(_gather_gemm_fwd, _gather_gemm_bwd)
