"""Training metrics — torchplus-equivalents, jit-friendly.

``Scalar`` (windowed running mean) and ``PrecisionRecall`` (thresholded
precision/recall over the classification head) mirror the reference's
in-loop metrics [ref: torchplus/metrics.py — lineage-expected, UNVERIFIED].
The device parts are pure functions returning counts; accumulation happens
host-side.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def precision_recall_counts(cls_preds, labels,
                            thresholds: Sequence[float] = (0.1, 0.3, 0.5,
                                                           0.7, 0.9)):
    """Counts for thresholded PR over the sigmoid cls head.

    cls_preds: [B, A, C] logits (background encoded as all-zeros).
    labels: [B, A] int (-1 ignore, 0 background, >0 class).

    Returns dict of [T] arrays: tp, fp, fn (device-computable, summable
    across steps).
    """
    scores = jnp.max(jnp.asarray(cls_preds), axis=-1)
    scores = 1.0 / (1.0 + jnp.exp(-scores))  # sigmoid
    cared = labels >= 0
    positive = labels > 0
    th = jnp.asarray(thresholds)[:, None, None]
    pred_pos = (scores[None] >= th) & cared[None]
    tp = jnp.sum(pred_pos & positive[None], axis=(1, 2))
    fp = jnp.sum(pred_pos & ~positive[None] & cared[None], axis=(1, 2))
    fn = jnp.sum(~pred_pos & positive[None] & cared[None], axis=(1, 2))
    return {"tp": tp, "fp": fp, "fn": fn}


class PrecisionRecall:
    """Host-side accumulator over :func:`precision_recall_counts`."""

    def __init__(self, thresholds: Sequence[float] = (0.1, 0.3, 0.5, 0.7,
                                                      0.9)):
        self.thresholds = tuple(thresholds)
        self.clear()

    def clear(self):
        n = len(self.thresholds)
        self._tp = np.zeros(n)
        self._fp = np.zeros(n)
        self._fn = np.zeros(n)

    def update(self, counts: Dict[str, np.ndarray]):
        self._tp += np.asarray(counts["tp"])
        self._fp += np.asarray(counts["fp"])
        self._fn += np.asarray(counts["fn"])

    @property
    def value(self) -> Dict[str, np.ndarray]:
        prec = self._tp / np.maximum(self._tp + self._fp, 1)
        rec = self._tp / np.maximum(self._tp + self._fn, 1)
        return {"precision": prec, "recall": rec,
                "thresholds": np.asarray(self.thresholds)}

    def summary(self) -> str:
        v = self.value
        parts = [f"@{t:.1f} P={p:.3f} R={r:.3f}"
                 for t, p, r in zip(v["thresholds"], v["precision"],
                                    v["recall"])]
        return "PR " + " | ".join(parts)


class Scalar:
    """Windowed running mean (lineage ``torchplus.metrics.Scalar``)."""

    def __init__(self):
        self._total = 0.0
        self._count = 0

    def update(self, value: float):
        self._total += float(value)
        self._count += 1

    @property
    def value(self) -> float:
        return self._total / max(self._count, 1)

    def clear(self):
        self._total, self._count = 0.0, 0
