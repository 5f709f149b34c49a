"""Host-side image preprocessing -> static-shape device batches.

Behavioral spec: the reference's train/test pipelines
(datasets/pipelines/transforms.py: Resize keep_ratio :202-231 with bbox
scale+clip :233-241, RandomFlip :318, Normalize :546 (BGR->RGB), Pad
size_divisor=32 :475) and the aspect-ratio GroupSampler
(samplers/group_sampler.py) — generalized into fixed orientation BUCKETS so
every compiled program sees one static (H, W).

COCO defaults: test scale (1333, 800), normalize mean/std from
configs/_base_/datasets/coco_detection.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

MEAN_RGB = np.array([123.675, 116.28, 103.53], np.float32)
STD_RGB = np.array([58.395, 57.12, 57.375], np.float32)


def rescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int, float]:
    """mmcv.rescale_size semantics: fit inside (long, short) keeping ratio.

    Returns (new_h, new_w, factor)."""
    long_side, short_side = max(scale), min(scale)
    factor = min(long_side / max(h, w), short_side / min(h, w))
    new_h = int(h * factor + 0.5)
    new_w = int(w * factor + 0.5)
    return new_h, new_w, factor


def ceil32(x: int) -> int:
    return int(np.ceil(x / 32.0) * 32)


def bucket_shape(scale: Tuple[int, int], landscape: bool) -> Tuple[int, int]:
    """Static pad bucket for an orientation group at a given test scale."""
    long_side, short_side = max(scale), min(scale)
    if landscape:
        return ceil32(short_side), ceil32(long_side)
    return ceil32(long_side), ceil32(short_side)


@dataclasses.dataclass
class ProcessedImage:
    image: np.ndarray        # (H, W, 3) float32, normalized, zero-padded
    img_shape: np.ndarray    # (2,) resized (h, w)
    scale_factor: np.ndarray # (4,) (w, h, w, h) resize factors
    boxes: Optional[np.ndarray] = None   # transformed gt boxes
    labels: Optional[np.ndarray] = None
    flipped: bool = False


def _resize_bilinear(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(
            Image.fromarray(img.astype(np.uint8)).resize((new_w, new_h), Image.BILINEAR)
        )


def preprocess(
    img_bgr: np.ndarray,
    scale: Tuple[int, int] = (1333, 800),
    bucket: Optional[Tuple[int, int]] = None,
    flip: bool = False,
    boxes: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
) -> ProcessedImage:
    """Resize (keep ratio) -> flip -> BGR->RGB -> normalize -> pad to bucket.

    `boxes` are transformed alongside (scale, clip to resized shape, flip) —
    exactly the reference Resize/RandomFlip ordering.
    """
    h, w = img_bgr.shape[:2]
    new_h, new_w, _ = rescale_size(h, w, scale)
    img = _resize_bilinear(img_bgr, new_h, new_w)
    w_scale = new_w / w
    h_scale = new_h / h
    scale_factor = np.array([w_scale, h_scale, w_scale, h_scale], np.float32)

    if boxes is not None and len(boxes):
        boxes = boxes.astype(np.float32) * scale_factor
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, new_w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, new_h)
    elif boxes is not None:
        boxes = boxes.reshape(0, 4).astype(np.float32)

    if flip:
        img = img[:, ::-1]
        if boxes is not None and len(boxes):
            x1 = new_w - boxes[:, 2]
            x2 = new_w - boxes[:, 0]
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=-1)

    img = img[..., ::-1].astype(np.float32)  # BGR -> RGB
    img = (img - MEAN_RGB) / STD_RGB

    if bucket is None:
        bucket = (ceil32(new_h), ceil32(new_w))
    padded = np.zeros((bucket[0], bucket[1], 3), np.float32)
    padded[:new_h, :new_w] = img

    return ProcessedImage(
        image=padded,
        img_shape=np.array([new_h, new_w], np.float32),
        scale_factor=scale_factor,
        boxes=boxes,
        labels=labels,
        flipped=flip,
    )


def pad_gt(
    boxes: np.ndarray, labels: np.ndarray, max_gt: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad per-image gt to (max_gt, ...) + validity mask."""
    n = min(len(boxes), max_gt)
    out_b = np.zeros((max_gt, 4), np.float32)
    out_l = np.zeros((max_gt,), np.int32)
    out_v = np.zeros((max_gt,), bool)
    out_b[:n] = boxes[:n]
    out_l[:n] = labels[:n]
    out_v[:n] = True
    return out_b, out_l, out_v
