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
    p.add_argument(
        "--coco-dump", default=None,
        help="write standard COCO results json (list of {image_id, "
             "category_id, bbox xywh, score}) for test-dev submission — "
             "the reference --format-only analog",
    )
    p.add_argument(
        "--aug", action="store_true",
        help="multi-scale+flip TTA per image (the mstrain configs' test "
             "pipeline); slower, evaluates via aug_inference_detector",
    )
    p.add_argument("--aug-scales", nargs="+", default=None,
                   help="TTA scales as WxH, e.g. 1600x800 1600x1000 "
                        "(default: the config's test_scale)")
    p.add_argument(
        "--set", dest="cfg_options", nargs="+", default=[],
        help="config overrides as dotted.path=value, e.g. "
             "--set rcnn_test.score_thr=0.01",
    )
    p.add_argument("--scale", default=None,
                   help="override test img_scale as WxH "
                        "(default: the config's test_scale, e.g. 1600x800 "
                        "for htd_x101_dcn_2x)")
    p.add_argument(
        "--chips", type=int, default=1,
        help="single-host multi-chip batch-parallel eval over a 'data' "
             "mesh of N local devices (multi_gpu_test analog); batch-size "
             "must be a multiple of N",
    )
    p.add_argument(
        "--eval", default="bbox", choices=["bbox", "proposal"],
        help="'bbox' = COCO mAP; 'proposal' = RPN-only AR@{100,300,1000} "
             "(reference 'proposal_fast' metric / RPN detector eval)",
    )
    p.add_argument(
        "--platform", default=None, choices=["cpu", "tpu"],
        help="force the jax platform via the config API (this machine "
             "pins JAX_PLATFORMS which the env var cannot override; "
             "'cpu' avoids dispatching over a remote-TPU tunnel)",
    )
    p.add_argument(
        "--fast", action="store_true",
        help="keep the serving RoIAlign preset (max_samples=4, ~24%% "
             "faster). By default this ACCURACY tool runs the exact mmcv "
             "sampling_ratio=0 grid (max_samples=8) — the serving clamp "
             "costs a measured score p99 delta of 0.027 (PERF.md round-4 "
             "fidelity A/B), irrelevant for serving but not for an eval",
    )
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update(
            "jax_platforms",
            "cpu" if args.platform == "cpu" else "tpu,axon",
        )
        if args.platform == "cpu":
            jax.config.update("jax_default_matmul_precision", "highest")

    from htd_tpu import config as C
    from htd_tpu.apis import evaluate_dataset, init_detector
    from htd_tpu.data.coco import CocoDataset

    cfg = getattr(C, args.config)()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    if args.cfg_options:
        cfg = C.apply_overrides(cfg, args.cfg_options)
    user_set_ms = any(
        o.split("=")[0].strip() == "roi_extractor.max_samples"
        for o in args.cfg_options
    )
    if not args.fast and not user_set_ms:
        # accuracy tooling defaults to the EXACT RoIAlign grid; serving
        # keeps the clamped preset (bench.py / inference APIs unchanged)
        cfg = C.apply_overrides(cfg, ["roi_extractor.max_samples=8"])
        print("[test] exact RoIAlign grid (max_samples=8); pass --fast "
              "for the serving preset", file=sys.stderr)
    scale = (
        tuple(int(v) for v in args.scale.split("x"))
        if args.scale else cfg.test_scale
    )
    dataset = CocoDataset(args.ann, args.img_root, test_mode=True)
    calib = None
    if (args.checkpoint and any(cfg.backbone.stage_with_dcn)
            and dataset.records):
        # calibrate the DCN dispatch on REAL val images (apis
        # _auto_calibrate_dcn falls back to noise without them)
        from htd_tpu.data.coco import make_test_batch

        recs = [r for r in dataset.records
                if r.landscape == dataset.records[0].landscape][:4]
        calib = make_test_batch(
            dataset, recs, scale=scale, batch_size=len(recs)
        )[0]
    model, variables = init_detector(cfg, args.checkpoint, calib_images=calib)
    if args.eval == "proposal":
        from htd_tpu.apis import evaluate_proposals

        metrics = evaluate_proposals(
            model, variables, dataset,
            batch_size=args.batch_size, scale=scale,
            max_images=args.max_images,
        )
        print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))
        return
    if args.aug:
        import numpy as np

        from htd_tpu.apis import aug_inference_detector
        from htd_tpu.data.coco_eval import evaluate_coco_map

        scales = (
            [tuple(int(v) for v in s.split("x")) for s in args.aug_scales]
            if args.aug_scales else [scale]
        )
        dets = {}
        for i, rec in enumerate(dataset.records):
            if args.max_images and i >= args.max_images:
                break
            img = dataset.load_image(rec)
            b, s_, l = aug_inference_detector(
                model, variables, img, scales=scales, flip=True
            )
            dets[rec.img_id] = (b.astype(np.float64), s_.astype(np.float64), l)
        gt = {k: v for k, v in dataset.groundtruth().items() if k in dets}
        metrics = evaluate_coco_map(dets, gt, num_classes=len(dataset.cat_ids) or 80)
        print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))
        return

    mesh = None
    if args.chips > 1:
        from htd_tpu.parallel.mesh import make_mesh

        assert args.batch_size % args.chips == 0, "--batch-size % --chips"
        mesh = make_mesh(args.chips)
    out = evaluate_dataset(
        model, variables, dataset,
        batch_size=args.batch_size, scale=scale, max_images=args.max_images,
        return_detections=bool(args.dump or args.coco_dump), mesh=mesh,
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
        metrics = out if not args.coco_dump else out[0]
    if args.coco_dump:
        _, dets = out
        n_cats = len(dataset.cat_ids)
        skipped = 0
        results = []
        for img_id, (boxes, scores, labels) in dets.items():
            for b, s, l in zip(boxes, scores, labels):
                if int(l) >= n_cats:
                    # model label space wider than the dataset's categories
                    # (debug datasets); unmappable labels cannot be
                    # submitted — skip, don't crash
                    skipped += 1
                    continue
                results.append(dict(
                    image_id=int(img_id),
                    category_id=int(dataset.cat_ids[int(l)]),
                    bbox=[float(b[0]), float(b[1]),
                          float(b[2] - b[0]), float(b[3] - b[1])],
                    score=float(s),
                ))
        if skipped:
            print(f"[coco-dump] skipped {skipped} detections with labels "
                  f">= {n_cats} dataset categories", file=sys.stderr)
        with open(args.coco_dump, "w") as f:
            json.dump(results, f)
    print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
