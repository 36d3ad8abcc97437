#!/usr/bin/env python
"""Measure sparse-middle site caps through the REAL augmented prep.

`ops.sparse_conv.measure_site_caps` over raw scans underestimates
capacities once gt-database paste-in lands (the r5 multiclass run
tripped the saturation fail-fast at caps measured from raw scans: up
to 23 pasted objects add >25% active sites).  This tool builds the
config's actual training input pipeline — db-sampling, per-object and
global augmentation, bucketing — draws N batches, and measures the
per-block output-site maxima from the coordinates the middle will
really see.

  python tools/measure_caps_prepped.py <config> [--batches 30]
      [--safety 1.2]

Prints the `out_site_caps` line to paste into the config (or pass to
tools/kitti_rehearsal.py --out_caps).  CPU-only.
"""
from __future__ import annotations

import argparse
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--safety", type=float, default=1.2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)
    from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc
    from automatic_as_built_reconstruction_tpu.train import train as t

    bundle = t.Bundle(args.config)
    ds, loader = bundle.input_reader(training=True)
    v_cap = (int(bundle.config.train_input_reader
                 .preprocess.max_number_of_voxels) or 12000)
    plan = voxelnet_mod.middle_plan(bundle.model_cfg, v_cap)
    grid_dhw, specs = sc.respec(plan)

    coords = []
    it = iter(loader)
    for _ in range(args.batches):
        batch = next(it)
        for c in np.asarray(batch["coordinates"]):
            coords.append(c)
    caps = sc.measure_site_caps(coords, grid_dhw, specs,
                                safety=args.safety)
    print(f"measured over {len(coords)} AUGMENTED examples "
          f"(safety {args.safety}):")
    print("out_site_caps: " + ",".join(str(c) for c in caps))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
