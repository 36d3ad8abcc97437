"""Dense BEV backbone (RPN) + detection heads.

NHWC layout (TPU-native), flax convs.  Structure mirrors the lineage RPNV2:
N downsampling blocks (stride-s conv + k stride-1 convs, BN+ReLU each),
each block upsampled back by transposed conv to a common stride and
concatenated, then 1x1 heads for class / box / direction.

[ref: second/pytorch/models/rpn.py — lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    filters: int
    layers: int
    stride: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        x = nn.relu(x)
        for _ in range(self.layers):
            x = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class Upsample(nn.Module):
    filters: int
    stride: int
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        if self.stride >= 1:
            s = int(round(self.stride))
            x = nn.ConvTranspose(self.filters, (s, s), strides=(s, s),
                                 use_bias=False, dtype=self.dtype)(x)
        else:
            # fractional "upsample" = downsample conv (lineage supports
            # upsample_strides < 1 expressed as 1/int)
            inv = int(round(1 / self.stride))
            x = nn.Conv(self.filters, (inv, inv), strides=(inv, inv),
                        use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


class RPN(nn.Module):
    """Multi-scale BEV backbone with per-location anchor heads."""

    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (128, 128, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (256, 256, 256)
    num_anchor_per_loc: int = 2
    num_class: int = 1
    box_code_size: int = 7
    use_direction_classifier: bool = True
    num_direction_bins: int = 2
    encode_background_as_zeros: bool = True
    use_yaw_quality: bool = False
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: [B, H, W, C] BEV features -> dict of prediction maps."""
        ups = []
        for i, (n, s, f) in enumerate(zip(self.layer_nums, self.layer_strides,
                                          self.num_filters)):
            x = ConvBlock(f, n, s, dtype=self.dtype)(x, train=train)
            ups.append(Upsample(self.num_upsample_filters[i],
                                self.upsample_strides[i],
                                dtype=self.dtype)(x, train=train))
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]

        if self.encode_background_as_zeros:
            num_cls = self.num_anchor_per_loc * self.num_class
        else:
            num_cls = self.num_anchor_per_loc * (self.num_class + 1)
        box_preds = nn.Conv(self.num_anchor_per_loc * self.box_code_size,
                            (1, 1), name="conv_box", dtype=self.dtype)(x)
        # Focal-loss prior init (RetinaNet): bias = -log((1-pi)/pi),
        # pi = 0.01, so a fresh head scores every anchor ~0.01 instead of
        # sigmoid(0) = 0.5.  Stabilizes early focal training (step-1 cls
        # loss ~0.03 instead of ~14) and keeps an untrained net's
        # predict() on the pruned NMS path instead of the dense
        # all-anchors-fire worst case.  (Init-only: checkpoints override.)
        cls_preds = nn.Conv(num_cls, (1, 1), name="conv_cls",
                            dtype=self.dtype,
                            bias_init=nn.initializers.constant(
                                -4.59511985013459))(x)
        ret = {"box_preds": box_preds, "cls_preds": cls_preds}
        if self.use_direction_classifier:
            ret["dir_cls_preds"] = nn.Conv(
                self.num_anchor_per_loc * self.num_direction_bins, (1, 1),
                name="conv_dir_cls", dtype=self.dtype)(x)
        if self.use_yaw_quality:
            # per-anchor yaw-quality logit (see voxelnet.compute_loss);
            # bias init 2.0 -> sigmoid ~0.88, so a fresh head leaves the
            # absolute detection scores (and the nms_score_threshold
            # semantics) nearly unchanged until it learns
            ret["quality_preds"] = nn.Conv(
                self.num_anchor_per_loc, (1, 1), name="conv_quality",
                dtype=self.dtype,
                bias_init=nn.initializers.constant(2.0))(x)
        return ret
