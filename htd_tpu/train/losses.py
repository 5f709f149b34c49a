"""Loss functions.

Behavioral specs: reference mmdet/models/losses/{cross_entropy_loss.py,
smooth_l1_loss.py, accuracy.py} and the averaging rules in
bbox_head.py:141-186 / anchor_head.py:373-418 (see SURVEY.md §8):
  * RPN cls: per-anchor sigmoid BCE, sum/num_total_samples;
  * RCNN cls: softmax CE, sum/#(weight > 0);
  * reg: smooth-L1 on positives, sum/total-sampled;
  * SFA: multi-label BCE-with-logits, mean over (B, C+1), x loss_weight.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def smooth_l1(pred: Array, target: Array, beta: float) -> Array:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def softmax_ce(
    logits: Array, labels: Array, weights: Array, avg_factor: Array
) -> Array:
    """Weighted softmax cross-entropy, summed and divided by avg_factor."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * weights) / jnp.maximum(avg_factor, 1.0)


def sigmoid_bce(
    logits: Array, targets: Array, weights: Array, avg_factor: Array
) -> Array:
    """Weighted per-element sigmoid BCE, summed / avg_factor."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.sum(loss * weights) / jnp.maximum(avg_factor, 1.0)


def smooth_l1_loss(
    pred: Array,
    target: Array,
    weights: Array,
    beta: float,
    avg_factor: Array,
) -> Array:
    """Weighted smooth-L1 (weights broadcast over the last dim)."""
    loss = smooth_l1(pred.astype(jnp.float32), target.astype(jnp.float32), beta)
    return jnp.sum(loss * weights) / jnp.maximum(avg_factor, 1.0)


def multilabel_bce(logits: Array, targets: Array, loss_weight: float) -> Array:
    """BCEWithLogitsLoss(mean) * loss_weight — the SFA/ISC image-level loss."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return loss_weight * jnp.mean(loss)


def accuracy(logits: Array, labels: Array, weights: Optional[Array] = None) -> Array:
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if weights is None:
        return jnp.mean(correct)
    return jnp.sum(correct * weights) / jnp.maximum(jnp.sum(weights), 1.0)
