"""Model zoo — flax modules, registered by name.

One top-level model (:class:`~.voxelnet.VoxelNet`) composed of three
swappable stages chosen by string from registries: VFE (voxel/pillar
feature encoder), middle extractor (sparse 3D conv or pillar scatter),
RPN (dense BEV backbone + heads).  PointPillars is not a separate model:
it is VFE=PillarFeatureNet + middle=PointPillarsScatter + the same RPN.

[ref: second/pytorch/models/ — lineage-expected, UNVERIFIED (SURVEY.md §0)]
"""
from .losses import (SigmoidFocalClassificationLoss,
                     WeightedSmoothL1LocalizationLoss,
                     WeightedSoftmaxClassificationLoss)
from .pointpillars import PillarFeatureNet, PointPillarsScatter
from .rpn import RPN
from .voxel_encoder import SimpleVoxel, VoxelFeatureExtractor
from .voxelnet import VoxelNet, MIDDLE_REGISTRY, VFE_REGISTRY
