"""Test-time augmentation (MultiScaleFlipAug) merging.

Behavioral spec: reference test_time_aug.py:10 (aug expansion),
merge_augs.py:8-87 (merge_aug_proposals = NMS over original-frame unified
proposals; merge_aug_bboxes = mean of recovered boxes/scores) and
htd_roi_head.aug_test:388-441.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from htd_tpu.config import ProposalConfig, RCNNTestConfig
from htd_tpu.ops.boxes import bbox_flip
from htd_tpu.ops.nms import NEG_INF, multiclass_nms, nms

Array = jnp.ndarray


def map_back(boxes: Array, img_shape, scale_factor, flip: bool) -> Array:
    """Aug frame -> original frame (bbox_mapping_back)."""
    b = bbox_flip(boxes, img_shape) if flip else boxes
    return b / jnp.asarray(scale_factor, b.dtype)


def map_into(boxes: Array, img_shape, scale_factor, flip: bool) -> Array:
    """Original frame -> aug frame (bbox_mapping)."""
    b = boxes * jnp.asarray(scale_factor, boxes.dtype)
    return bbox_flip(b, img_shape) if flip else b


def merge_aug_proposals(
    aug_boxes: Sequence[Array],   # per aug (P, 4) in ORIGINAL frame
    aug_scores: Sequence[Array],  # per aug (P,)
    aug_valid: Sequence[Array],
    cfg: ProposalConfig,
) -> Tuple[Array, Array, Array]:
    boxes = jnp.concatenate(list(aug_boxes), axis=0)
    scores = jnp.concatenate(list(aug_scores), axis=0).astype(jnp.float32)
    valid = jnp.concatenate(list(aug_valid), axis=0)
    scores = jnp.where(valid, scores, NEG_INF)
    keep_idx, keep_score, keep_valid = nms(boxes, scores, cfg.nms_thr, cfg.max_num)
    out_boxes = jnp.where(keep_valid[:, None], boxes[keep_idx], 0.0)
    return out_boxes, jnp.where(keep_valid, keep_score, 0.0), keep_valid


def merge_aug_bboxes(
    aug_boxes: Sequence[Array],   # per aug (P, 4) decoded, ORIGINAL frame
    aug_scores: Sequence[Array],  # per aug (P, C+1) softmax scores
) -> Tuple[Array, Array]:
    boxes = jnp.mean(jnp.stack(list(aug_boxes)), axis=0)
    scores = jnp.mean(jnp.stack(list(aug_scores)), axis=0)
    return boxes, scores


def final_nms(boxes, scores, valid, cfg: RCNNTestConfig):
    scores = jnp.where(valid[:, None], scores, 0.0)
    return multiclass_nms(
        boxes,
        scores,
        cfg.score_thr,
        cfg.nms_iou,
        cfg.max_per_img,
        use_soft_nms=cfg.use_soft_nms,
        soft_min_score=cfg.soft_min_score,
    )
