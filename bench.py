"""Benchmark: end-to-end scans/sec/chip for the flagship pillar detector.

Measures full on-device inference — voxelization (sort-based kernel) +
pillar VFE + scatter + RPN — on synthetic KITTI-scale scans (~18k points
each), batch 8, on whatever chip JAX exposes.  Prints ONE JSON line.

Measurement hygiene (this container's axon relay *caches identical
dispatches* and `block_until_ready` does not actually synchronize):
- a distinct input batch every iteration, and
- the jit program reduces its outputs to one scalar that the host
  consumes with float(), forcing real end-to-end execution.

Baseline: PointPillars paper reports 62 Hz end-to-end on a GTX 1080 Ti
(CVPR 2019; the reference stack's published speed for this model family —
BASELINE.md).  vs_baseline = our scans/sec / 62.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SCANS_PER_SEC = 62.0  # PointPillars paper, 1080 Ti
BATCH = 8
NUM_POINTS = 18000
MAX_VOXELS = 12000
MAX_POINTS_PER_VOXEL = 32
ITERS = 10


def _make_batch(seed: int) -> np.ndarray:
    r = np.random.default_rng(seed)
    return np.stack([
        np.concatenate([
            r.uniform(0, 69.1, (NUM_POINTS, 1)),
            r.uniform(-39.7, 39.7, (NUM_POINTS, 1)),
            r.uniform(-2.5, 0.5, (NUM_POINTS, 1)),
            r.random((NUM_POINTS, 1))], axis=1).astype(np.float32)
        for _ in range(BATCH)])


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from automatic_as_built_reconstruction_tpu.models.voxelnet import VoxelNet
    from automatic_as_built_reconstruction_tpu.ops import voxelize_jax

    cfg = _flagship_cfg()
    model = VoxelNet(cfg=cfg)

    num_valid = jnp.asarray(np.full((BATCH,), NUM_POINTS, np.int32))

    voxelize = jax.vmap(
        lambda p, n: voxelize_jax.voxelize(
            p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
            grid_size=cfg.grid_size, max_points=MAX_POINTS_PER_VOXEL,
            max_voxels=MAX_VOXELS, first_appearance=False))

    pts0 = jnp.asarray(_make_batch(0))
    res = voxelize(pts0, num_valid)
    variables = model.init(jax.random.key(0), res.voxels[:1, :64],
                           res.num_points[:1, :64], res.coords[:1, :64])

    @jax.jit
    def infer(variables, points, num_valid):
        r = voxelize(points, num_valid)
        out = model.apply(variables, r.voxels, r.num_points, r.coords,
                          train=False)
        return {k: v for k, v in out.items()} | {
            "_sync": sum(jnp.sum(v) for v in out.values())}

    batches = [jnp.asarray(_make_batch(s)) for s in range(ITERS + 1)]
    float(infer(variables, batches[-1], num_valid)["_sync"])  # compile+warm

    t0 = time.perf_counter()
    for i in range(ITERS):
        out = infer(variables, batches[i], num_valid)
        float(out["_sync"])  # host-consume => true synchronization
    dt = time.perf_counter() - t0

    scans_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "pillar_e2e_inference_scans_per_sec_per_chip",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / BASELINE_SCANS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
