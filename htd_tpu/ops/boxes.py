"""Pure-jnp box utilities.

Semantics mirror the reference's core box algebra (behavioral spec:
/root/reference/mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:78-200,
/root/reference/mmdet/core/bbox/iou_calculators/iou2d_calculator.py,
/root/reference/mmdet/core/bbox/transforms.py) but are written batched
and broadcasting-first so they vmap/jit cleanly on TPU.

All functions take/return `[..., 4]` boxes in (x1, y1, x2, y2) order and
are dtype-polymorphic (box math should stay float32).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

Array = jnp.ndarray

_DEFAULT_WH_RATIO_CLIP = 16.0 / 1000.0


def bbox2delta(
    proposals: Array,
    gt: Array,
    means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
    stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> Array:
    """Encode `gt` boxes relative to `proposals` as (dx, dy, dw, dh).

    Inverse of :func:`delta2bbox`. Shapes broadcast over leading dims.
    """
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(
    rois: Array,
    deltas: Array,
    means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
    stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    max_shape: Optional[Array] = None,
    wh_ratio_clip: float = _DEFAULT_WH_RATIO_CLIP,
) -> Array:
    """Decode (dx, dy, dw, dh) deltas on top of `rois`.

    Args:
      rois: `[..., 4]` base boxes.
      deltas: `[..., 4]` (class-agnostic; for per-class deltas reshape the
        class dim into a leading/batch dim before calling).
      max_shape: optional `(h, w)` (array or tuple) used to clip the decoded
        boxes to the image. May be a traced per-image value.
    """
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    denorm = deltas * stds + means
    dx, dy, dw, dh = (denorm[..., i] for i in range(4))

    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        boxes = clip_boxes(boxes, max_shape)
    return boxes


def clip_boxes(boxes: Array, img_shape) -> Array:
    """Clip boxes to `[0, w] x [0, h]`. `img_shape` is (h, w) (may be traced)."""
    h = jnp.asarray(img_shape[0], dtype=boxes.dtype)
    w = jnp.asarray(img_shape[1], dtype=boxes.dtype)
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_area(boxes: Array) -> Array:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_overlaps(
    bboxes1: Array,
    bboxes2: Array,
    mode: str = "iou",
    is_aligned: bool = False,
    eps: float = 1e-6,
) -> Array:
    """Pairwise IoU / IoF between `[..., M, 4]` and `[..., N, 4]` boxes.

    Returns `[..., M, N]` (or `[..., M]` when `is_aligned`). `eps` guards the
    denominator, matching the reference's numerics.
    """
    assert mode in ("iou", "iof"), mode
    area1 = bbox_area(bboxes1)
    area2 = bbox_area(bboxes2)

    if not is_aligned:
        b1 = bboxes1[..., :, None, :]
        b2 = bboxes2[..., None, :, :]
        area1 = area1[..., :, None]
        area2 = area2[..., None, :]
    else:
        b1, b2 = bboxes1, bboxes2

    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]

    if mode == "iou":
        union = area1 + area2 - overlap
    else:  # iof
        union = area1 if not is_aligned else area1
    union = jnp.maximum(union, eps)
    return overlap / union


def bbox_flip(boxes: Array, img_shape, direction: str = "horizontal") -> Array:
    """Flip boxes inside an image of `img_shape` = (h, w)."""
    h = jnp.asarray(img_shape[0], dtype=boxes.dtype)
    w = jnp.asarray(img_shape[1], dtype=boxes.dtype)
    if direction == "horizontal":
        x1 = w - boxes[..., 2]
        x2 = w - boxes[..., 0]
        return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
    elif direction == "vertical":
        y1 = h - boxes[..., 3]
        y2 = h - boxes[..., 1]
        return jnp.stack([boxes[..., 0], y1, boxes[..., 2], y2], axis=-1)
    else:
        raise ValueError(direction)


def bbox_mapping(
    boxes: Array,
    img_shape,
    scale_factor,
    flip: bool,
    flip_direction: str = "horizontal",
) -> Array:
    """Map boxes from the original image frame into an augmented frame."""
    scale = jnp.asarray(scale_factor, dtype=boxes.dtype)
    new = boxes * scale
    if flip:
        new = bbox_flip(new, img_shape, flip_direction)
    return new


def bbox_mapping_back(
    boxes: Array,
    img_shape,
    scale_factor,
    flip: bool,
    flip_direction: str = "horizontal",
) -> Array:
    """Map boxes from an augmented frame back into the original frame."""
    new = bbox_flip(boxes, img_shape, flip_direction) if flip else boxes
    scale = jnp.asarray(scale_factor, dtype=boxes.dtype)
    return new / scale


def bbox_center_scale(boxes: Array, eps: float = 1e-6) -> Array:
    """sqrt(w*h) of each box (the FPN level-mapping 'scale')."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.sqrt(jnp.clip(w * h, 0, None))


def map_roi_levels(
    boxes: Array, num_levels: int, finest_scale: float = 56.0
) -> Array:
    """FPN level index per roi: floor(log2(sqrt(area)/finest + 1e-6)).

    Behavioral spec: reference single_level_roi_extractor.py:32-51 and the
    duplicate in htd_bbox_head.py:129-135.
    """
    scale = bbox_center_scale(boxes)
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)
