#!/usr/bin/env python
"""Visualize the train pipeline's output images + gt boxes.

Reference tools/browse_dataset.py equivalent: iterates the dataset, runs
each image through the train pipeline minus Normalize/FormatBundle (the
reference's default --skip-type), and draws the transformed gt boxes.
With --raw, the pipeline is skipped entirely (original image + annotation
boxes). Images are written to --output-dir (this environment is headless;
there is no display path).

Usage:
  python tools/browse_dataset.py --ann instances_train2017.json \
      --img-root train2017 --output-dir /tmp/browse --max-images 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ann", required=True)
    p.add_argument("--img-root", default="")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--config", default="htd_r50_1x",
                   help="config preset supplying the train scale")
    p.add_argument("--scale", default=None, help="override train scale as WxH")
    p.add_argument("--raw", action="store_true",
                   help="skip the pipeline: original image + gt boxes")
    p.add_argument("--flip-prob", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument(
        "--corruption", default=None,
        help="optionally view a corruption (htd_tpu.data.corruptions name)",
    )
    p.add_argument("--severity", type=int, default=3)
    args = p.parse_args()

    from htd_tpu import config as C
    from htd_tpu.data.coco import CocoDataset
    from htd_tpu.data.pipeline import preprocess, MEAN_RGB, STD_RGB
    from htd_tpu.utils.visualize import draw_detections

    cfg = getattr(C, args.config)()
    scale = (
        tuple(int(v) for v in args.scale.split("x"))
        if args.scale else cfg.train.img_scale
    )
    dataset = CocoDataset(args.ann, args.img_root, test_mode=False)
    if args.corruption:
        from htd_tpu.data.corruptions import CorruptedDataset

        dataset = CorruptedDataset(dataset, args.corruption, args.severity)
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)

    n = len(dataset.records)
    for i, rec in enumerate(dataset.records):
        if args.max_images is not None and i >= args.max_images:
            break
        img = dataset.load_image(rec)
        if args.raw:
            vis, boxes, labels = img, rec.boxes, rec.labels
        else:
            pr = preprocess(
                img, scale=scale, bucket=None,
                flip=bool(rng.rand() < args.flip_prob),
                boxes=rec.boxes, labels=rec.labels,
            )
            # un-normalize back to displayable BGR (= skipping Normalize,
            # like the reference's --skip-type default)
            rgb = pr.image * STD_RGB + MEAN_RGB
            vis = np.clip(rgb[..., ::-1], 0, 255).astype(np.uint8)
            vis = np.ascontiguousarray(vis)
            boxes, labels = pr.boxes, rec.labels
        out_file = os.path.join(
            args.output_dir, os.path.basename(rec.file_name)
        )
        draw_detections(
            vis, boxes, np.ones(len(boxes), np.float32), labels,
            class_names=dataset.classes, score_thr=0.0, out_file=out_file,
        )
        if (i + 1) % 50 == 0 or i + 1 == n:
            print(f"[browse] {i + 1}/{n}")


if __name__ == "__main__":
    main()
