"""Pallas TPU kernels for the hot ops.

Design notes: XLA scatters serialize row updates through HBM on TPU (we
measured ~54 ms for the 12k-pillar -> 214k-cell canvas scatter at batch 8).
These kernels re-express scatters as *blocked one-hot matmuls over sorted
keys* — each canvas tile's contributors form a contiguous window of the
key-sorted pillar array, so a [TILE_W, TILE_R] equality mask against the
tile's cell ids drives the MXU instead of a serialized scatter.
"""
