"""Pallas pairwise rotated-IoU kernel (north-star N2).

The XLA lowering of the masked Sutherland–Hodgman clip materializes every
[16, N, K] intermediate to HBM (the slot compaction alone is ~128 full
passes over the pair grid — ~650 ms/scan at N=K=1000, memory-bound).
This kernel computes one [TN, TK] pair tile per grid step with the
ENTIRE clip in vector registers: the polygon is a Python list of
[TN, TK] planes, every half-plane clip and the slot compaction are fully
unrolled VPU ops, and only the intersection-area tile is written back.

The tile is deliberately SMALL (8 x 256 = 2 vregs/plane): Mosaic unrolls
every vector op over the tile's vregs, so the ~2.5k-op clip must stay a
few thousand instructions — large tiles explode compile time, not
performance (the grid replays one compiled body).

Same math as ops.rotated_iou (parity-tested); IoU division outside.

[ref: second/core/non_max_suppression/nms_gpu.py::devRotateIoUEval —
lineage-expected, UNVERIFIED; BASELINE.json names the rotated-IoU/NMS
device kernels explicitly]
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corner_cols(boxes):
    """[N, 5] -> [N, 8] f32: columns x0..x3, y0..y3 of the CCW corners."""
    x, y, w, l, yaw = (boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
                       boxes[:, 4])
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = jnp.stack([-0.5 * w, 0.5 * w, 0.5 * w, -0.5 * w], 1)   # [N, 4]
    ly = jnp.stack([-0.5 * l, -0.5 * l, 0.5 * l, 0.5 * l], 1)
    xs = lx * c[:, None] - ly * s[:, None] + x[:, None]
    ys = lx * s[:, None] + ly * c[:, None] + y[:, None]
    return jnp.concatenate([xs, ys], 1).astype(jnp.float32)


def _kernel(ca_ref, cb_ref, out_ref):
    """One [TN, TK] pair tile.  ca: [TN, 8], cb: [TK, 8] corner columns."""
    TN, TK = out_ref.shape
    zero = jnp.zeros((TN, TK), jnp.float32)

    # subject polygon = A corners broadcast over columns: 8 (x, y) slots
    px = [ca_ref[:, i][:, None] + zero for i in range(4)] + [zero] * 4
    py = [ca_ref[:, 4 + i][:, None] + zero for i in range(4)] + [zero] * 4
    n = jnp.full((TN, TK), 4, jnp.int32)

    bx = [cb_ref[:, i][None, :] for i in range(4)]
    by = [cb_ref[:, 4 + i][None, :] for i in range(4)]

    for e in range(4):
        axe, aye = bx[e], by[e]
        ex = bx[(e + 1) % 4] - axe
        ey = by[(e + 1) % 4] - aye
        s_val = [ex * (py[i] - aye) - ey * (px[i] - axe) for i in range(8)]
        cand_x, cand_y, emit = [], [], []
        for i in range(8):
            active = i < n
            if i + 1 < 8:        # next vertex in the valid cyclic run
                use_nxt = (i + 1) < n
                nx = jnp.where(use_nxt, px[i + 1], px[0])
                ny = jnp.where(use_nxt, py[i + 1], py[0])
                sn = jnp.where(use_nxt, s_val[i + 1], s_val[0])
            else:
                nx, ny, sn = px[0], py[0], s_val[0]
            sc = s_val[i]
            cur_in = sc >= 0
            emit.append(active & cur_in)
            cand_x.append(px[i])
            cand_y.append(py[i])
            denom = sc - sn
            t = jnp.where(jnp.abs(denom) > 1e-12, sc / denom, 0.0)
            emit.append(active & (cur_in != (sn >= 0)))
            cand_x.append(px[i] + t * (nx - px[i]))
            cand_y.append(py[i] + t * (ny - py[i]))
        # compact 16 candidates -> 8 slots, all in registers
        pos = []
        run = jnp.zeros((TN, TK), jnp.int32)
        for i in range(16):
            pos.append(jnp.where(emit[i], run, -1))
            run = run + emit[i].astype(jnp.int32)
        px = [zero] * 8
        py = [zero] * 8
        for i in range(16):
            for j in range(8):
                hit = pos[i] == j
                px[j] = jnp.where(hit, cand_x[i], px[j])
                py[j] = jnp.where(hit, cand_y[i], py[j])
        n = run

    area = jnp.zeros((TN, TK), jnp.float32)
    for i in range(8):
        if i + 1 < 8:
            use_nxt = (i + 1) < n
            nx = jnp.where(use_nxt, px[i + 1], px[0])
            ny = jnp.where(use_nxt, py[i + 1], py[0])
        else:
            nx, ny = px[0], py[0]
        area = area + jnp.where(i < n, px[i] * ny - nx * py[i], 0.0)
    out_ref[:] = jnp.maximum(0.5 * area, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("tile_n", "tile_k", "interpret"))
def intersection_area_matrix_pallas(boxes: jax.Array, qboxes: jax.Array,
                                    tile_n: int = 8, tile_k: int = 256,
                                    interpret: bool | None = None
                                    ) -> jax.Array:
    """Pairwise rotated intersection areas [N, K] via the tiled
    register-resident clip kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, K = boxes.shape[0], qboxes.shape[0]
    TN, TK = int(tile_n), int(tile_k)
    if not interpret:
        TN = -(-TN // 8) * 8        # sublane multiple
        TK = -(-TK // 128) * 128    # lane multiple
    Np = -(-N // TN) * TN
    Kp = -(-K // TK) * TK
    # pad with degenerate far-away boxes (zero area -> zero overlap)
    pad_box = jnp.asarray([1e6, 1e6, 0.0, 0.0, 0.0], jnp.float32)
    bp = jnp.concatenate(
        [boxes.astype(jnp.float32),
         jnp.broadcast_to(pad_box, (Np - N, 5))], 0)
    qp = jnp.concatenate(
        [qboxes.astype(jnp.float32),
         jnp.broadcast_to(pad_box, (Kp - K, 5))], 0)
    ca = _corner_cols(bp)                     # [Np, 8]
    cb = _corner_cols(qp)                     # [Kp, 8]

    out = pl.pallas_call(
        _kernel,
        grid=(Np // TN, Kp // TK),
        in_specs=[
            pl.BlockSpec((TN, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((TK, 8), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TN, TK), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Np, Kp), jnp.float32),
        # the fully-unrolled clip gives every SSA temp a VMEM stack
        # slot (~60 MB at the default 16 MB scoped limit); v5e has
        # 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ca, cb)
    return out[:N, :K]


@functools.partial(jax.jit, static_argnames=("criterion", "tile_n",
                                             "tile_k", "interpret"))
def rotate_iou_matrix_pallas(boxes: jax.Array, qboxes: jax.Array,
                             criterion: int = -1, tile_n: int = 8,
                             tile_k: int = 256,
                             interpret: bool | None = None) -> jax.Array:
    """Rotated IoU [N, K] of (x, y, w, l, yaw) BEV boxes — exact same
    results as ``ops.rotated_iou.rotate_iou_matrix``."""
    inter = intersection_area_matrix_pallas(boxes, qboxes, tile_n, tile_k,
                                            interpret)
    area_a = (boxes[:, 2] * boxes[:, 3]).astype(jnp.float32)[:, None]
    area_b = (qboxes[:, 2] * qboxes[:, 3]).astype(jnp.float32)[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = jnp.broadcast_to(area_a, inter.shape)
    else:
        denom = jnp.broadcast_to(area_b, inter.shape)
    return jnp.where(denom > 0, inter / jnp.maximum(denom, 1e-12), 0.0)
