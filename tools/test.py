#!/usr/bin/env python
"""Evaluate a checkpoint on COCO val (reference tools/test.py equivalent).

Usage:
  python tools/test.py --config htd_r50_1x --checkpoint ckpt_or_pth \
      --ann annotations/instances_val2017.json --img-root val2017
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--ann", required=True)
    p.add_argument("--img-root", default="")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--dump", default=None, help="write detections json here")
    args = p.parse_args()

    from htd_tpu import config as C
    from htd_tpu.apis import evaluate_dataset, init_detector
    from htd_tpu.data.coco import CocoDataset

    cfg = getattr(C, args.config)()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    model, variables = init_detector(cfg, args.checkpoint)
    dataset = CocoDataset(args.ann, args.img_root, test_mode=True)
    out = evaluate_dataset(
        model, variables, dataset,
        batch_size=args.batch_size, max_images=args.max_images,
        return_detections=bool(args.dump),
    )
    if args.dump:
        metrics, dets = out
        with open(args.dump, "w") as f:
            json.dump(
                {
                    str(k): dict(
                        boxes=v[0].tolist(),
                        scores=v[1].tolist(),
                        labels=v[2].tolist(),
                    )
                    for k, v in dets.items()
                },
                f,
            )
    else:
        metrics = out
    print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
