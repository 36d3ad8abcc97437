"""Loss proto -> loss hyperparameters (feeds VoxelNetConfig fields)."""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class LossParams:
    cls_weight: float = 1.0
    loc_weight: float = 2.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_sigma: float = 3.0
    code_weights: Optional[Tuple[float, ...]] = None
    cls_loss_type: str = "weighted_sigmoid_focal"
    loc_loss_type: str = "weighted_smooth_l1"


def build(cfg) -> LossParams:
    p = LossParams()
    if cfg.classification_weight:
        p.cls_weight = cfg.classification_weight
    if cfg.localization_weight:
        p.loc_weight = cfg.localization_weight
    cls_which = cfg.classification_loss.WhichOneof("classification_loss")
    if cls_which:
        p.cls_loss_type = cls_which
        if cls_which == "weighted_sigmoid_focal":
            c = cfg.classification_loss.weighted_sigmoid_focal
            p.focal_gamma = c.gamma or 2.0
            p.focal_alpha = c.alpha or 0.25
    loc_which = cfg.localization_loss.WhichOneof("localization_loss")
    if loc_which:
        p.loc_loss_type = loc_which
        if loc_which == "weighted_smooth_l1":
            c = cfg.localization_loss.weighted_smooth_l1
            p.smooth_l1_sigma = c.sigma or 3.0
            if c.code_weight:
                p.code_weights = tuple(c.code_weight)
    return p
