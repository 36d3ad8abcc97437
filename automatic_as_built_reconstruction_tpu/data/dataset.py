"""Dataset abstraction + name registry.

A dataset returns *sensor data dicts* from ``get_sensor_data(idx)``:

    {
      "lidar": {"points": [P, C] float32},
      "metadata": {...},                          # e.g. image_idx / scene id
      "annotations": {                            # absent for test splits
          "boxes": [N, 7] lidar boxes,
          "names": [N] str,
          "difficulty": [N] int,
      },
      "calib": {...},                             # optional (KITTI)
    }

[ref: second/data/dataset.py — lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

from typing import Dict, Type

REGISTERED_DATASET_CLASSES: Dict[str, Type["Dataset"]] = {}


def register_dataset(cls=None, *, name: str | None = None):
    def wrap(c):
        REGISTERED_DATASET_CLASSES[name or c.__name__] = c
        return c

    return wrap(cls) if cls is not None else wrap


def get_dataset_class(name: str) -> Type["Dataset"]:
    if name not in REGISTERED_DATASET_CLASSES:
        raise KeyError(
            f"dataset {name!r} not registered; "
            f"have {sorted(REGISTERED_DATASET_CLASSES)}")
    return REGISTERED_DATASET_CLASSES[name]


class Dataset:
    """Base dataset: length + sensor-data access + eval hook."""

    NumPointFeatures: int = 4

    def __len__(self) -> int:
        raise NotImplementedError

    def get_sensor_data(self, idx: int) -> dict:
        raise NotImplementedError

    def evaluation(self, detections, output_dir=None) -> dict:
        """Dataset-specific eval over a list of per-sample detection dicts."""
        raise NotImplementedError

    # torch-DataLoader-style accessor used by the input pipeline
    def __getitem__(self, idx: int) -> dict:
        return self.get_sensor_data(idx)
