"""RegionSimilarityCalculator proto -> core.region_similarity instance."""
from __future__ import annotations

from ..core import region_similarity
from ..protos import similarity_pb2


def build(cfg: "similarity_pb2.RegionSimilarityCalculator"):
    which = cfg.WhichOneof("region_similarity")
    if which == "rotate_iou_similarity":
        return region_similarity.RotateIouSimilarity()
    if which == "nearest_iou_similarity" or which is None:
        return region_similarity.NearestIouSimilarity()
    if which == "distance_similarity":
        c = cfg.distance_similarity
        return region_similarity.DistanceSimilarity(
            distance_norm=c.distance_norm, with_rotation=c.with_rotation,
            rotation_alpha=c.rotation_alpha)
    raise ValueError(f"unknown similarity {which}")
