#!/usr/bin/env python
"""Corruption-robustness benchmark (reference tools/test_robustness.py).

Evaluates a checkpoint on COCO val under the ImageNet-C corruption grid
(corruption x severity; severity 0 = clean, evaluated once) and writes an
aggregated results json consumed by tools/robustness_eval.py (P / mPC /
rPC). Behavioral spec: reference tools/test_robustness.py:169-373 — same
corruption group names, same severity loop, same severity-0 reuse; the
corruption is applied to the raw image before Resize (CorruptedDataset =
the reference's Corrupt pipeline insertion at position 1).

Usage:
  python tools/test_robustness.py --config htd_r50_1x --checkpoint ckpt \
      --ann instances_val2017.json --img-root val2017 \
      --out work_dir/robustness.json --corruptions benchmark
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--ann", required=True)
    p.add_argument("--img-root", default="")
    p.add_argument("--out", required=True, help="aggregated results json path")
    p.add_argument(
        "--corruptions", nargs="+", default=["benchmark"],
        help="corruption names or groups (all/benchmark/noise/blur/weather/"
             "digital/holdout/None)",
    )
    p.add_argument("--severities", type=int, nargs="+", default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=0, help="corruption RNG seed")
    p.add_argument("--scale", default=None, help="test img_scale as WxH")
    p.add_argument(
        "--summaries", action="store_true",
        help="print the metric dict for every (corruption, severity)",
    )
    p.add_argument(
        "--final-prints", nargs="+", default=["mPC"],
        choices=["P", "mPC", "rPC"],
    )
    p.add_argument(
        "--final-prints-aggregate", default="benchmark",
        choices=["all", "benchmark"],
    )
    p.add_argument(
        "--set", dest="cfg_options", nargs="+", default=[],
        help="config overrides as dotted.path=value",
    )
    args = p.parse_args()

    from htd_tpu import config as C
    from htd_tpu.apis import evaluate_dataset, init_detector
    from htd_tpu.data.coco import CocoDataset
    from htd_tpu.data.corruptions import ALL_CORRUPTIONS, GROUPS, CorruptedDataset

    corruptions = []
    for name in args.corruptions:
        if name == "None":
            corruptions, args.severities = ["None"], [0]
            break
        expanded = GROUPS.get(name, [name])
        for c in expanded:
            if c not in ALL_CORRUPTIONS:
                p.error(f"unknown corruption {c!r}")
            if c not in corruptions:
                corruptions.append(c)

    cfg = getattr(C, args.config)()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    if args.cfg_options:
        cfg = C.apply_overrides(cfg, args.cfg_options)
    scale = (
        tuple(int(v) for v in args.scale.split("x"))
        if args.scale else cfg.test_scale
    )
    model, variables = init_detector(cfg, args.checkpoint)
    dataset = CocoDataset(args.ann, args.img_root, test_mode=True)

    aggregated = {}
    for ci, corruption in enumerate(corruptions):
        aggregated[corruption] = {}
        for severity in args.severities:
            # severity 0 (clean) is corruption-independent: evaluate once
            # (reference test_robustness.py:243-247)
            if ci > 0 and severity == 0:
                aggregated[corruption]["0"] = aggregated[corruptions[0]]["0"]
                continue
            print(f"\n[robustness] {corruption} severity {severity}")
            ds = (
                dataset
                if severity == 0 or corruption == "None"
                else CorruptedDataset(dataset, corruption, severity, seed=args.seed)
            )
            metrics = evaluate_dataset(
                model, variables, ds,
                batch_size=args.batch_size, scale=scale,
                max_images=args.max_images,
            )
            # NaN (empty area range) -> null: keep the dump strict JSON
            metrics = {
                k: (None if v != v else v) for k, v in metrics.items()
            }
            aggregated[corruption][str(severity)] = {"bbox": metrics}
            if args.summaries:
                print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))
            # checkpoint the aggregate after every cell (long runs)
            with open(args.out, "w") as f:
                json.dump(aggregated, f, indent=1)

    from robustness_eval import get_results

    get_results(
        args.out,
        prints=args.final_prints,
        aggregate=args.final_prints_aggregate,
    )


if __name__ == "__main__":
    main()
