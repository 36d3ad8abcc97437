"""Batch collation: stack fixed-capacity examples into device-ready arrays.

The reference ragged-concatenates voxels and pads a batch-index column onto
coordinates [ref: merge_second_batch — UNVERIFIED].  TPU-first: every
example is already padded to static capacity by ``prep_pointcloud``, so
batching is a plain stack — fixed shapes, zero recompilation.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

_STACK_KEYS = (
    "voxels", "num_points", "coordinates", "num_voxels", "anchors",
    "anchors_mask", "labels", "reg_targets", "importance",
)
_LIST_KEYS = ("metadata", "calib", "gt_boxes", "gt_names")


def merge_batch(examples: List[Dict[str, np.ndarray]]) -> Dict[str, object]:
    out: Dict[str, object] = {}
    for k in examples[0].keys():
        if k in _STACK_KEYS or k.startswith("rb"):
            # rb* = host-precomputed sparse-conv rulebooks (rulebook_host)
            out[k] = np.stack([e[k] for e in examples])
        elif k in _LIST_KEYS:
            out[k] = [e[k] for e in examples]
    return out


_VOXEL_CAP_KEYS = ("voxels", "num_points", "coordinates")


def pick_bucket(num_voxels: int, buckets) -> int:
    """Smallest bucket >= the example's active voxel count (last bucket =
    full capacity catches overflow)."""
    for b in buckets:
        if num_voxels <= b:
            return int(b)
    return int(buckets[-1])


def shrink_to_bucket(example: Dict[str, np.ndarray],
                     bucket: int) -> Dict[str, np.ndarray]:
    """Slice the voxel-capacity arrays down to ``bucket`` rows.

    Valid voxels are stored first, so slicing drops only padding (or, for
    overflowing scans, the FCFS tail — same semantics as a smaller
    ``max_voxels``).  Bucketed padding is the TPU answer to
    variable-density scans paying full-capacity cost [ref: SURVEY.md §5.7].
    Only valid for examples without host rulebooks (``rb*`` keys), whose
    shapes are tied to the full-capacity block plan.
    """
    out = dict(example)
    for k in _VOXEL_CAP_KEYS:
        if k in out and out[k].shape[0] > bucket:
            out[k] = out[k][:bucket]
    return out


def device_example(batch: Dict[str, object]) -> Dict[str, np.ndarray]:
    """The array-only subset that is shipped to the device."""
    keys = ("voxels", "num_points", "coordinates", "anchors", "anchors_mask",
            "labels", "reg_targets", "importance")
    out = {k: batch[k] for k in keys if k in batch}
    out.update({k: v for k, v in batch.items() if k.startswith("rb")})
    return out
