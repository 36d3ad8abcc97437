"""Diagnose the synthetic-KITTI FHD convergence failure (CPU).

The 2500-step rehearsal plateaued with every loss pinned near its prior
(loss_dir = ln 2 exactly), which smells like the RPN never sees usable
middle features or the targets are broken.  This script loads the
trained checkpoint and one real training batch, then prints stage-by-
stage activation stats + target sanity.

Usage:  JAX_PLATFORMS=cpu python tools/diag_kitti.py
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

MODEL_DIR = pathlib.Path("/tmp/kitti_fhd_run")


def stats(name, x):
    x = np.asarray(x, np.float32)
    nz = float((np.abs(x) > 1e-6).mean())
    print(f"  {name:28s} shape={tuple(x.shape)} mean={x.mean():+.4f} "
          f"std={x.std():.4f} min={x.min():+.3f} max={x.max():+.3f} "
          f"frac_nonzero={nz:.3f}")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from automatic_as_built_reconstruction_tpu.train import train as t
    from automatic_as_built_reconstruction_tpu.models import voxelnet as vm
    from automatic_as_built_reconstruction_tpu.train import checkpoint as ck

    bundle = t.Bundle(MODEL_DIR / "rehearsal.config")
    print("model_cfg middle:", bundle.model_cfg.middle_name,
          "vfe:", bundle.model_cfg.vfe_name)
    _, loader = bundle.input_reader(training=True, seed=0)
    batch = next(iter(loader))
    print("batch keys:", sorted(batch.keys()))
    for k in ("voxels", "num_points", "coordinates", "labels",
              "reg_targets", "anchors"):
        if k in batch:
            stats(k, batch[k])
    labels = np.asarray(batch["labels"])
    print("  labels: pos=%d neg=%d ignore=%d" % (
        (labels > 0).sum(), (labels == 0).sum(), (labels < 0).sum()))
    if "reg_targets" in batch:
        rt = np.asarray(batch["reg_targets"])
        pos = labels > 0
        print("  reg_targets at pos anchors:")
        stats("rt[pos]", rt[pos])

    # points actually inside gt boxes?
    vox = np.asarray(batch["voxels"])  # [B,V,T,C]
    npnts = np.asarray(batch["num_points"])
    print("  total real points in batch:",
          int(npnts.sum()), " voxels used:",
          int((npnts > 0).sum()), "/", vox.shape[1])

    # load ckpt
    state, tx = t.init_state(bundle, example={
        k: jnp.asarray(batch[k][:1]) for k in
        ("voxels", "num_points", "coordinates")})
    mgr = ck.CheckpointManager(MODEL_DIR)
    step = mgr.latest_step()
    print("restoring step", step)
    state = mgr.restore(state, step)

    ex = {k: jnp.asarray(v[:1]) for k, v in batch.items()
          if isinstance(v, np.ndarray) and v.dtype != object}
    labels = labels[:1]
    books = t._middle_rulebooks(ex, bundle.model_cfg)
    print("host rulebooks present:", books is not None, flush=True)
    import time as _time
    t0 = _time.time()
    preds, stages = bundle.model.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        ex["voxels"], ex["num_points"], ex["coordinates"], train=False,
        middle_rulebooks=books, return_stages=True)
    print("forward done in %.1fs" % (_time.time() - t0), flush=True)
    print("stage stats (ckpt weights):")
    for k, v in stages.items():
        stats(k, v)
    flat = vm._flatten_preds(preds, bundle.model_cfg)
    for k, v in flat.items():
        stats(k, v)
    cls = np.asarray(flat["cls_preds"], np.float32)
    sig = 1 / (1 + np.exp(-cls))
    print("  cls sigmoid: mean=%.5f max=%.5f  @pos-anchors mean=%.5f" % (
        sig.mean(), sig.max(),
        sig.reshape(labels.shape + (-1,))[labels > 0].mean()))

    # per-example saturation telemetry
    preds2, mut = bundle.model.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        ex["voxels"], ex["num_points"], ex["coordinates"], train=True,
        middle_rulebooks=books, mutable=["batch_stats", "intermediates"])
    import jax.tree_util as jtu
    for p, v in jtu.tree_leaves_with_path(mut.get("intermediates", {})):
        print("  intermediate", jtu.keystr(p), np.asarray(v))


if __name__ == "__main__":
    main()
