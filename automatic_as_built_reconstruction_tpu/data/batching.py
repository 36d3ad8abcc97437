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


def device_example(batch: Dict[str, object]) -> Dict[str, np.ndarray]:
    """The array-only subset that is shipped to the device."""
    keys = ("voxels", "num_points", "coordinates", "anchors", "anchors_mask",
            "labels", "reg_targets", "importance")
    out = {k: batch[k] for k in keys if k in batch}
    out.update({k: v for k, v in batch.items() if k.startswith("rb")})
    return out
