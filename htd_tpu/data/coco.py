"""COCO dataset: annotation parsing, filtering, grouped batching.

Behavioral spec: reference datasets/coco.py:30-180 (pycocotools-backed
parsing, xywh->xyxy conversion, cat_id->contiguous label map, crowd ->
ignore) and datasets/custom.py:150-171 (train filtering: images smaller
than 32px or without valid gt are dropped; aspect-ratio group flag).
Implemented directly over the json — no pycocotools dependency.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from htd_tpu.data.pipeline import bucket_shape, pad_gt, preprocess


@dataclasses.dataclass
class ImageRecord:
    img_id: int
    file_name: str
    height: int
    width: int
    boxes: np.ndarray      # (N, 4) xyxy, non-crowd
    labels: np.ndarray     # (N,) contiguous [0, C)
    crowd_boxes: np.ndarray  # (M, 4) xyxy iscrowd regions (ignore)

    @property
    def landscape(self) -> bool:
        return self.width >= self.height


class CocoDataset:
    def __init__(
        self,
        ann_file: str,
        img_root: str = "",
        test_mode: bool = False,
        min_size: int = 32,
    ):
        self.img_root = img_root
        with open(ann_file) as f:
            data = json.load(f)
        cats = data.get("categories", [])
        self.cat_ids = [c["id"] for c in cats]
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.classes = [c["name"] for c in cats]

        anns_by_img: Dict[int, List[dict]] = {}
        for a in data.get("annotations", []):
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.records: List[ImageRecord] = []
        for img in data["images"]:
            anns = anns_by_img.get(img["id"], [])
            boxes, labels, crowds = [], [], []
            for a in anns:
                if a.get("ignore", False):
                    continue
                x, y, w, h = a["bbox"]
                # reference coco.py clip + min-size semantics
                x1, y1 = max(x, 0), max(y, 0)
                x2 = min(x + w, img["width"])
                y2 = min(y + h, img["height"])
                if x2 <= x1 or y2 <= y1 or a.get("area", w * h) <= 0:
                    continue
                if a.get("iscrowd", 0):
                    crowds.append([x1, y1, x2, y2])
                else:
                    boxes.append([x1, y1, x2, y2])
                    labels.append(self.cat2label[a["category_id"]])
            rec = ImageRecord(
                img_id=img["id"],
                file_name=img["file_name"],
                height=img["height"],
                width=img["width"],
                boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int32),
                crowd_boxes=np.asarray(crowds, np.float32).reshape(-1, 4),
            )
            if not test_mode:
                if min(img["width"], img["height"]) < min_size:
                    continue
                if len(rec.boxes) == 0:
                    continue
            self.records.append(rec)

    def __len__(self) -> int:
        return len(self.records)

    def groundtruth(self) -> Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """img_id -> (boxes, labels, iscrowd) for the evaluator."""
        out = {}
        for r in self.records:
            boxes = np.concatenate([r.boxes, r.crowd_boxes], axis=0)
            labels = np.concatenate(
                [r.labels, np.zeros(len(r.crowd_boxes), np.int32)]
            )
            crowd = np.concatenate(
                [np.zeros(len(r.boxes), bool), np.ones(len(r.crowd_boxes), bool)]
            )
            out[r.img_id] = (boxes, labels, crowd)
        return out

    def load_image(self, rec: ImageRecord) -> np.ndarray:
        import os

        import cv2

        path = os.path.join(self.img_root, rec.file_name)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img


def grouped_batches(
    dataset: CocoDataset,
    batch_size: int,
    shuffle: bool,
    seed: int = 0,
    drop_last: bool = False,
) -> Iterator[List[ImageRecord]]:
    """Aspect-ratio-homogeneous batches (GroupSampler semantics): every batch
    holds only landscape or only portrait images, so each maps to one static
    bucket/compiled program."""
    rng = np.random.RandomState(seed)
    groups: Dict[bool, List[int]] = {True: [], False: []}
    for i, r in enumerate(dataset.records):
        groups[r.landscape].append(i)
    order: List[List[int]] = []
    for flag, idxs in groups.items():
        idxs = list(idxs)
        if shuffle:
            rng.shuffle(idxs)
        for i in range(0, len(idxs), batch_size):
            chunk = idxs[i : i + batch_size]
            if drop_last and len(chunk) < batch_size:
                continue
            order.append(chunk)
    if shuffle:
        rng.shuffle(order)
    for chunk in order:
        yield [dataset.records[i] for i in chunk]


def make_test_batch(
    dataset: CocoDataset,
    records: Sequence[ImageRecord],
    scale: Tuple[int, int] = (1333, 800),
    batch_size: Optional[int] = None,
):
    """Load + preprocess a test batch into static arrays.

    Returns (images, img_shapes, scale_factors, img_ids); short batches are
    padded by repeating the last image (masked out by img_ids < 0).
    """
    bucket = bucket_shape(scale, records[0].landscape)
    imgs, shapes, sfs, ids = [], [], [], []
    for rec in records:
        p = preprocess(dataset.load_image(rec), scale=scale, bucket=bucket)
        imgs.append(p.image)
        shapes.append(p.img_shape)
        sfs.append(p.scale_factor)
        ids.append(rec.img_id)
    n = batch_size or len(records)
    while len(imgs) < n:
        imgs.append(imgs[-1])
        shapes.append(shapes[-1])
        sfs.append(sfs[-1])
        ids.append(-1)
    return (
        np.stack(imgs),
        np.stack(shapes),
        np.stack(sfs),
        np.asarray(ids, np.int64),
    )


def sample_mstrain_scale(
    rng: np.random.RandomState,
    scale_range: Tuple[Tuple[int, int], Tuple[int, int]],
    step: int = 32,
) -> Tuple[int, int]:
    """Multi-scale train sampling (Resize multiscale_mode='range').

    Behavioral spec: reference transforms.py random_sample — the short side
    is drawn uniformly between the two scales' short sides (HTD mstrain:
    (1600, 400)-(1600, 1400)). We quantize to `step` so the number of
    distinct compiled buckets stays bounded.
    """
    (l1, s1), (l2, s2) = scale_range
    long_side = max(l1, l2)
    lo, hi = min(s1, s2), max(s1, s2)
    short = int(rng.randint(lo, hi + 1))
    short = int(np.clip(round(short / step) * step, lo, hi))
    return (long_side, short)


def make_train_batch(
    dataset: CocoDataset,
    records: Sequence[ImageRecord],
    scale: Tuple[int, int] = (1333, 800),
    max_gt: int = 100,
    flip_prob: float = 0.5,
    rng: Optional[np.random.RandomState] = None,
    flips: Optional[Sequence[bool]] = None,
):
    """Load + augment + pad a train batch. Returns dict of arrays.

    One scale per batch (all images share the bucket), matching the static
    -shape requirement; the reference samples per image, which only changes
    the schedule of scales, not their distribution.

    `flips` (optional) fixes the per-record flip decisions explicitly — the
    multi-host path draws them for the GLOBAL batch on every process from
    the shared epoch seed, then each host loads only its slice.
    """
    rng = rng or np.random.RandomState(0)
    bucket = bucket_shape(scale, records[0].landscape)
    imgs, shapes, gtb, gtl, gtv = [], [], [], [], []
    for i, rec in enumerate(records):
        flip = bool(flips[i]) if flips is not None else bool(rng.rand() < flip_prob)
        p = preprocess(
            dataset.load_image(rec),
            scale=scale,
            bucket=bucket,
            flip=flip,
            boxes=rec.boxes,
            labels=rec.labels,
        )
        b, l, v = pad_gt(p.boxes, rec.labels, max_gt)
        imgs.append(p.image)
        shapes.append(p.img_shape)
        gtb.append(b)
        gtl.append(l)
        gtv.append(v)
    return dict(
        images=np.stack(imgs),
        img_shapes=np.stack(shapes),
        gt_boxes=np.stack(gtb),
        gt_labels=np.stack(gtl),
        gt_valid=np.stack(gtv),
    )
