"""Benchmark: scans/sec/chip for both flagship detector paths + the
voxelizer, on structured synthetic KITTI-scale scans.

Prints ONE JSON line.  The primary metric is the pillar-path end-to-end
inference throughput; ``extra`` carries the SECOND/FHD sparse path and the
device hard-voxelization rate (BASELINE.md rows).

Scenes are structured (ground plane + clustered car-sized objects +
sparse clutter), not uniform noise — uniform points flatter sort-based
kernels and under-stress per-voxel caps.

Measurement hygiene — this container's axon relay *caches identical
dispatches*, `block_until_ready` does not actually synchronize, every
dispatch pays ~40 ms round-trip, and executions much beyond ~0.3 s can
crash the relay worker.  So every metric uses a LOOP-DELTA measurement:
the jit program runs its body R times (`lax.scan`, each iteration on
step-perturbed inputs so the work is real and distinct) and reduces to a
scalar the host consumes via float(); per-iteration time is
(t[R_hi] - t[R_lo]) / (R_hi - R_lo), which cancels the dispatch overhead
exactly while keeping each execution short.

Baselines (BASELINE.md): PointPillars paper 62 Hz end-to-end on a GTX
1080 Ti (CVPR 2019); SECOND paper ~40 ms/frame (25 Hz) for the large
model on a GTX 1080 Ti (Sensors 2018).
"""
from __future__ import annotations

import concurrent.futures as cf
import functools
import json
import time

import numpy as np

PILLAR_BASELINE_SPS = 62.0   # PointPillars paper, 1080 Ti
SECOND_BASELINE_SPS = 25.0   # SECOND paper large model, 1080 Ti
NUM_POINTS = 18000


def make_scene(seed: int, n_points: int = NUM_POINTS) -> np.ndarray:
    """Structured scan: ground plane + ~40 car-like clusters + clutter."""
    r = np.random.default_rng(seed)
    n_ground = int(n_points * 0.55)
    n_clutter = int(n_points * 0.10)
    n_obj = n_points - n_ground - n_clutter
    ground = np.stack([r.uniform(0, 69.1, n_ground),
                       r.uniform(-39.7, 39.7, n_ground),
                       r.normal(-1.73, 0.03, n_ground)], 1)
    n_clusters = 40
    centers = np.stack([r.uniform(5, 65, n_clusters),
                        r.uniform(-35, 35, n_clusters),
                        np.full(n_clusters, -1.0)], 1)
    per = -(-n_obj // n_clusters)
    objs = []
    for c in centers:
        yaw = r.uniform(0, np.pi)
        local = np.stack([r.uniform(-1.9, 1.9, per),
                          r.uniform(-0.8, 0.8, per),
                          r.uniform(-0.7, 0.9, per)], 1)
        rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                        [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1]])
        objs.append(local @ rot.T + c)
    obj = np.concatenate(objs)[: n_obj]
    clutter = np.stack([r.uniform(0, 69.1, n_clutter),
                        r.uniform(-39.7, 39.7, n_clutter),
                        r.uniform(-1.7, 1.5, n_clutter)], 1)
    xyz = np.concatenate([ground, obj, clutter])[:n_points]
    refl = r.random((xyz.shape[0], 1))
    scan = np.concatenate([xyz, refl], 1).astype(np.float32)
    return scan[r.permutation(scan.shape[0])]


def _loop_delta(jax, jnp, body, args, r_lo: int, r_hi: int,
                reps: int = 3) -> float:
    """Seconds per body() iteration via the loop-delta method.

    ``body(i, *args)`` must return a scalar; it should perturb its inputs
    with the step index ``i`` so every iteration does real, distinct work.
    """
    from jax import lax

    @jax.jit
    def run(R, *a):
        # dynamic trip count: ONE compile serves every R (compiles here
        # cost minutes through the remote-compile relay)
        def step(i, acc):
            return acc + body(i.astype(jnp.float32) + acc * 1e-30, *a)
        return lax.fori_loop(0, R, step, jnp.float32(0))

    times = {}
    for R in (r_lo, r_hi):
        float(run(R, *args))               # compile(first)/warm
        best = np.inf
        for rep in range(reps):
            a0 = args[0] * np.float32(1 + 1e-6 * rep)
            t0 = time.perf_counter()
            float(run(R, a0, *args[1:]))
            best = min(best, time.perf_counter() - t0)
        times[R] = best
    return (times[r_hi] - times[r_lo]) / (r_hi - r_lo)


def bench_pillar(jax, jnp) -> float:
    """Pillar-path e2e (device voxelize + VFE + scatter + RPN) scans/s."""
    from __graft_entry__ import _flagship_cfg
    from automatic_as_built_reconstruction_tpu.models.voxelnet import VoxelNet
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    cfg = _flagship_cfg()
    model = VoxelNet(cfg=cfg)
    B = 8
    MAX_VOXELS, MAX_PPV = 12000, 32

    base = np.stack([make_scene(b) for b in range(B)])
    num_valid = jnp.full((B,), NUM_POINTS, jnp.int32)

    voxelize = jax.vmap(
        lambda p, n: voxelize_jax.voxelize(
            p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
            grid_size=cfg.grid_size, max_points=MAX_PPV,
            max_voxels=MAX_VOXELS, first_appearance=False))

    r0 = voxelize(jnp.asarray(base), num_valid)
    variables = model.init(jax.random.key(0), r0.voxels[:1, :64],
                           r0.num_points[:1, :64], r0.coords[:1, :64])

    def body(i, pts0):
        pts = pts0 + 0.011 * (i + 1.0)        # distinct scan per iteration
        r = voxelize(pts, num_valid)
        out = model.apply(variables, r.voxels, r.num_points, r.coords,
                          train=False)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in out.values())

    dt = _loop_delta(jax, jnp, body, (jnp.asarray(base),), 1, 3)
    return B / dt


def bench_second_fhd(jax, jnp) -> dict:
    """SECOND/FHD sparse path: host voxelize+rulebooks pipelined with the
    device forward (VFE + sparse middle + RPN).  Reports the throughput of
    the slower stage (they overlap in the real input pipeline)."""
    import flax.linen as nn

    from automatic_as_built_reconstruction_tpu import native
    from automatic_as_built_reconstruction_tpu.core import voxelize as vox
    from automatic_as_built_reconstruction_tpu.models.middle import (
        SparseMiddle)
    from automatic_as_built_reconstruction_tpu.models.rpn import RPN
    from automatic_as_built_reconstruction_tpu.ops import rulebook_host as rbh

    VOXEL = (0.05, 0.05, 0.1)
    RANGE = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    GRID = (40, 1600, 1408)        # (D, H, W)
    VCAP, PPV = 16000, 5
    B = 2

    middle_kw = dict(grid_dhw=GRID, num_input_features=4,
                     num_filters=(16, 32, 64, 64),
                     layers_per_block=(2, 2, 2, 2),
                     z_strides=(2, 2, 2, 2), xy_strides=(2, 2, 2, 1))

    class FHDNet(nn.Module):
        @nn.compact
        def __call__(self, feats, coords, rulebooks):
            bev = SparseMiddle(dtype=jnp.bfloat16, use_pallas_gemm=True,
                               **middle_kw)(feats, coords,
                                            rulebooks=rulebooks)
            return RPN(layer_nums=(5,), layer_strides=(1,),
                       num_filters=(128,), upsample_strides=(1.0,),
                       num_upsample_filters=(128,), num_class=1,
                       num_anchor_per_loc=2,
                       dtype=jnp.bfloat16)(bev)

    PLAN = SparseMiddle(**middle_kw).plan(VCAP)
    n_host_scans = 16
    scans = [make_scene(1000 + i) for i in range(n_host_scans)]

    def host_stage(scan):
        if native.AVAILABLE:
            # fused FCFS voxelize + capped mean, key-sorted (one C pass;
            # monotone rulebooks -> Pallas windowed gather-GEMM)
            fpad, cpad, _, _ = native.voxelize_sorted_mean(
                scan, VOXEL, RANGE, PPV, VCAP)
        else:
            voxels, coords, npts = vox.points_to_voxel_fast(
                scan, VOXEL, RANGE, max_points=PPV, max_voxels=VCAP)
            nv = voxels.shape[0]
            keys = ((coords[:, 0].astype(np.int64) * GRID[1]
                     + coords[:, 1]) * GRID[2] + coords[:, 2])
            order = np.argsort(keys, kind="stable")
            voxels, coords, npts = (voxels[order], coords[order],
                                    npts[order])
            feats = voxels[:, :, :4].sum(1) / np.maximum(npts, 1)[:, None]
            cpad = np.full((VCAP, 3), -1, np.int32)
            cpad[:nv] = coords
            fpad = np.zeros((VCAP, 4), np.float32)
            fpad[:nv] = feats
        books = rbh.build_middle_rulebooks(cpad, PLAN)
        return fpad, cpad, books

    # host stage with the input pipeline's worker pool (C++ releases the
    # GIL); pool sized to the machine — oversubscribing a small host only
    # adds GIL/context-switch overhead
    import os
    try:
        n_cores = len(os.sched_getaffinity(0))   # honors cgroup limits
    except AttributeError:
        n_cores = os.cpu_count() or 1
    n_workers = max(1, min(8, n_cores))
    with cf.ThreadPoolExecutor(n_workers) as pool:
        list(pool.map(host_stage, scans[:4]))          # warm the pool
        t0 = time.perf_counter()
        prepped = list(pool.map(host_stage, scans))
        t_host = time.perf_counter() - t0
    host_sps = n_host_scans / t_host

    feats = np.stack([p[0] for p in prepped[:B]])
    coords = np.stack([p[1] for p in prepped[:B]])
    books = {k: np.stack([p[2][k] for p in prepped[:B]])
             for k in prepped[0][2]}

    model = FHDNet()
    db = {k: jnp.asarray(v) for k, v in books.items()}
    dc = jnp.asarray(coords)
    variables = model.init(jax.random.key(0), jnp.asarray(feats), dc,
                           rbh.unflatten(db, len(PLAN)))

    def body(i, f):
        preds = model.apply(variables, f * (1 + 1e-6 * i), dc,
                            rbh.unflatten(db, len(PLAN)))
        return sum(jnp.sum(v.astype(jnp.float32)) for v in preds.values())

    dt = _loop_delta(jax, jnp, body, (jnp.asarray(feats),), 2, 8)
    device_sps = B / dt
    return {"second_fhd_scans_per_sec": round(min(host_sps, device_sps), 2),
            "second_fhd_device_scans_per_sec": round(device_sps, 2),
            "second_fhd_host_prep_scans_per_sec": round(host_sps, 2),
            "second_fhd_vs_baseline": round(
                min(host_sps, device_sps) / SECOND_BASELINE_SPS, 3)}


def bench_voxelize(jax, jnp) -> float:
    """Device hard-voxelization throughput (Mpoints/s) on building-scale
    scans (200k points)."""
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    P = 200_000
    pts = make_scene(2000, P)
    num_valid = jnp.int32(P)

    def body(i, p0):
        r = voxelize_jax.voxelize(
            p0 + 0.007 * (i + 1.0), num_valid, voxel_size=(0.05, 0.05, 0.1),
            pc_range=(0.0, -40.0, -3.0, 70.4, 40.0, 1.0),
            grid_size=(1408, 1600, 40), max_points=5, max_voxels=30000,
            first_appearance=True)
        return jnp.sum(r.num_points).astype(jnp.float32)

    dt = _loop_delta(jax, jnp, body, (jnp.asarray(pts),), 2, 10)
    return P / dt / 1e6


def main():
    import jax
    import jax.numpy as jnp

    pillar_sps = bench_pillar(jax, jnp)
    fhd = bench_second_fhd(jax, jnp)
    vox_mpts = bench_voxelize(jax, jnp)

    print(json.dumps({
        "metric": "pillar_e2e_inference_scans_per_sec_per_chip",
        "value": round(pillar_sps, 2),
        "unit": "scans/sec",
        "vs_baseline": round(pillar_sps / PILLAR_BASELINE_SPS, 3),
        "extra": {**fhd,
                  "voxelize_mpoints_per_sec": round(vox_mpts, 2)},
    }))


if __name__ == "__main__":
    main()
