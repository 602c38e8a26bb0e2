"""Loss functions (registry-built, reference: mmdet losses used by configs).

GaussianFocalLoss — CornerNet-style focal loss on gaussian heatmaps
(reference: mmdet.models.losses.gaussian_focal_loss, used by CenterHead).
L1Loss / SmoothL1Loss — weighted elementwise regression losses.
FocalLoss — sigmoid focal for the DETR-style heads.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .builder import LOSSES


def clip_sigmoid(x, eps: float = 1e-4):
    """Sigmoid clamped away from {0, 1} (reference core/utils clip_sigmoid)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


@LOSSES.register_module()
class GaussianFocalLoss:
    """Focal loss for gaussian-splatted heatmaps.

    pos: -(1-p)^alpha log(p) at target==1;
    neg: -(1-t)^gamma p^alpha log(1-p) elsewhere.
    """

    def __init__(self, alpha: float = 2.0, gamma: float = 4.0,
                 reduction: str = "mean", loss_weight: float = 1.0):
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, avg_factor=None):
        """pred: already clip_sigmoid'ed probabilities; target: gaussians."""
        eps = 1e-12
        pos_w = (target == 1.0).astype(pred.dtype)
        neg_w = jnp.power(1 - target, self.gamma)
        pos = -jnp.log(pred + eps) * jnp.power(1 - pred, self.alpha) * pos_w
        neg = -jnp.log(1 - pred + eps) * jnp.power(pred, self.alpha) * neg_w
        loss = pos + neg * (1 - pos_w)
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.sum()
            if avg_factor is not None:
                loss = loss / jnp.maximum(avg_factor, 1.0)
            else:
                loss = loss / loss.size
        return self.loss_weight * loss


@LOSSES.register_module()
class L1Loss:

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = jnp.abs(pred - target)
        if weight is not None:
            loss = loss * weight
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.sum() / (avg_factor if avg_factor is not None
                                 else max(loss.size, 1))
        return self.loss_weight * loss


@LOSSES.register_module()
class SmoothL1Loss:

    def __init__(self, beta: float = 1.0, reduction: str = "mean",
                 loss_weight: float = 1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        diff = jnp.abs(pred - target)
        loss = jnp.where(diff < self.beta,
                         0.5 * diff * diff / self.beta,
                         diff - 0.5 * self.beta)
        if weight is not None:
            loss = loss * weight
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.sum() / (avg_factor if avg_factor is not None
                                 else max(loss.size, 1))
        return self.loss_weight * loss


@LOSSES.register_module()
class MSELoss:

    def __init__(self, reduction: str = "mean", loss_weight: float = 1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = jnp.square(pred - target)
        if weight is not None:
            loss = loss * weight
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.sum() / (avg_factor if avg_factor is not None
                                 else max(loss.size, 1))
        return self.loss_weight * loss


@LOSSES.register_module()
class FocalLoss:
    """Sigmoid focal loss (DETR-style classification)."""

    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, reduction: str = "mean",
                 loss_weight: float = 1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target_onehot, weight=None, avg_factor=None):
        """pred: [N, C] logits; target_onehot: [N, C] {0,1}."""
        p = jax.nn.sigmoid(pred)
        ce = optax_sigmoid_ce(pred, target_onehot)
        p_t = p * target_onehot + (1 - p) * (1 - target_onehot)
        alpha_t = (self.alpha * target_onehot +
                   (1 - self.alpha) * (1 - target_onehot))
        loss = alpha_t * jnp.power(1 - p_t, self.gamma) * ce
        if weight is not None:
            while weight.ndim < loss.ndim:
                weight = weight[..., None]
            loss = loss * weight
        if self.reduction == "sum":
            loss = loss.sum()
        elif self.reduction == "mean":
            loss = loss.sum() / (avg_factor if avg_factor is not None
                                 else max(loss.size, 1))
        return self.loss_weight * loss


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
