"""Detection losses — pure functions + thin class wrappers.

[ref: second/pytorch/core/losses.py — lineage-expected, UNVERIFIED]
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _sigmoid_cross_entropy_with_logits(logits, labels):
    """Numerically stable elementwise sigmoid CE."""
    return (jnp.maximum(logits, 0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


@dataclasses.dataclass
class SigmoidFocalClassificationLoss:
    """Focal loss (RetinaNet): FL = alpha_t * (1 - p_t)^gamma * CE."""

    gamma: float = 2.0
    alpha: float = 0.25

    def __call__(self, prediction_tensor, target_tensor, weights,
                 class_indices=None):
        """[.., A, C] logits and one-hot targets; weights [.., A]."""
        per_entry_ce = _sigmoid_cross_entropy_with_logits(
            prediction_tensor, target_tensor)
        p = jax.nn.sigmoid(prediction_tensor)
        p_t = target_tensor * p + (1 - target_tensor) * (1 - p)
        modulating = jnp.power(1.0 - p_t, self.gamma) if self.gamma else 1.0
        if self.alpha is not None:
            alpha_w = (target_tensor * self.alpha
                       + (1 - target_tensor) * (1 - self.alpha))
        else:
            alpha_w = 1.0
        loss = modulating * alpha_w * per_entry_ce
        return loss * weights[..., None]


@dataclasses.dataclass
class WeightedSmoothL1LocalizationLoss:
    """Huber loss with transition at 1/sigma^2; optional per-dim codewise
    weights."""

    sigma: float = 3.0
    code_weights: tuple | None = None

    def __call__(self, prediction_tensor, target_tensor, weights):
        """[.., A, code] preds/targets; weights [.., A]."""
        diff = prediction_tensor - target_tensor
        if self.code_weights is not None:
            diff = diff * jnp.asarray(self.code_weights, diff.dtype)
        abs_diff = jnp.abs(diff)
        s2 = self.sigma**2
        lt = abs_diff < (1.0 / s2)
        loss = jnp.where(lt, 0.5 * s2 * diff**2, abs_diff - 0.5 / s2)
        return loss * weights[..., None]


@dataclasses.dataclass
class WeightedSoftmaxClassificationLoss:
    """Softmax CE for the direction classifier head."""

    logit_scale: float = 1.0

    def __call__(self, prediction_tensor, target_tensor, weights):
        """[.., A, C] logits, [.., A, C] one-hot, weights [.., A]."""
        logits = prediction_tensor / self.logit_scale
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.sum(target_tensor * log_probs, axis=-1)
        return ce * weights


def prepare_loss_weights(labels, pos_cls_weight: float = 1.0,
                         neg_cls_weight: float = 1.0,
                         loss_norm_type: str = "NormByNumPositives",
                         dtype=jnp.float32):
    """Per-anchor cls/reg weights from labels [B, A].

    [ref: second/pytorch/models/voxelnet.py::prepare_loss_weights]
    """
    cared = labels >= 0
    positives = labels > 0
    negatives = labels == 0
    cls_weights = (negatives.astype(dtype) * neg_cls_weight
                   + positives.astype(dtype) * pos_cls_weight)
    reg_weights = positives.astype(dtype)
    if loss_norm_type == "NormByNumPositives":
        pos_norm = jnp.maximum(
            positives.sum(axis=1, keepdims=True).astype(dtype), 1.0)
        reg_weights = reg_weights / pos_norm
        cls_weights = cls_weights / pos_norm
    elif loss_norm_type == "NormByNumExamples":
        num_examples = jnp.maximum(
            cared.sum(axis=1, keepdims=True).astype(dtype), 1.0)
        cls_weights = cls_weights / num_examples
        pos_norm = jnp.maximum(
            positives.sum(axis=1, keepdims=True).astype(dtype), 1.0)
        reg_weights = reg_weights / pos_norm
    elif loss_norm_type == "NormByNumPosNeg":
        pos_neg = jnp.stack(
            [positives.astype(dtype), negatives.astype(dtype)], axis=-1)
        normalizer = pos_neg.sum(1, keepdims=True)  # [B, 1, 2]
        cls_normalizer = (pos_neg * normalizer).sum(-1)
        cls_normalizer = jnp.maximum(cls_normalizer, 1.0)
        normalizer = jnp.maximum(normalizer, 1.0)
        reg_weights = reg_weights / normalizer[:, 0:1, 0]
        cls_weights = cls_weights / cls_normalizer
    elif loss_norm_type == "DontNorm":
        pass
    else:
        raise ValueError(f"unknown loss_norm_type {loss_norm_type}")
    return cls_weights, reg_weights, cared
