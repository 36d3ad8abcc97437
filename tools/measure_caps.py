"""Measure per-block sparse-middle site capacities for a config+dataset.

Runs the REAL training prep (augmentation + gt-database sampling
included — sampled objects add voxels, so caps must be measured through
the same path training feeds) over N passes of the train split, pushes
every example's voxel coords through the middle plan's strided convs on
host, and prints the `out_site_caps` values to paste into the config or
`tools/kitti_rehearsal.py --out_caps`.

CPU-only: forces jax off the TPU relay before importing the package, so
it is safe to run while a bench/training job owns the single relay
client [ref: SURVEY.md §5.7 capacity sizing; memory: tpu-relay-operations].

Usage:
  python tools/measure_caps.py --data_root /tmp/synth_kitti \
      [--config second/car/car.fhd.config] [--passes 2] [--safety 1.15]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile

REPO = pathlib.Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--config", default="second/car/car.fhd.config")
    ap.add_argument("--passes", type=int, default=2,
                    help="augmentation passes over the train split")
    ap.add_argument("--batch_size", type=int, default=3)
    ap.add_argument("--safety", type=float, default=1.15)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # never touch the relay

    from tools.kitti_rehearsal import make_config
    from automatic_as_built_reconstruction_tpu.train import train as t
    from automatic_as_built_reconstruction_tpu.ops import sparse_conv as sc
    from automatic_as_built_reconstruction_tpu.models import (
        voxelnet as voxelnet_mod)

    cfg_text = make_config(args.data_root, 100, args.batch_size, 0.0015,
                           config_rel=args.config, out_caps=())
    with tempfile.NamedTemporaryFile(
            "w", suffix=".config", delete=False) as f:
        f.write(cfg_text)
        cfg_path = f.name
    bundle = t.Bundle(cfg_path)
    prep_ds, _ = bundle.input_reader(training=True, seed=0)
    v_cap = (int(bundle.config.train_input_reader
                 .preprocess.max_number_of_voxels) or 12000)
    grid, specs = sc.respec(voxelnet_mod.middle_plan(bundle.model_cfg,
                                                     v_cap))

    def coords_iter():
        n = len(prep_ds)
        for p in range(args.passes):
            for i in range(n):
                ex = prep_ds.example(i, seed=90000 * (p + 1) + i)
                c = ex["coordinates"]
                yield c
                if (i + 1) % 100 == 0:
                    print(f"pass {p}: {i + 1}/{n}", flush=True)

    caps = sc.measure_site_caps(coords_iter(), grid, specs,
                                safety=args.safety)
    print("measured out_site_caps:", ",".join(str(c) for c in caps))


if __name__ == "__main__":
    main()
