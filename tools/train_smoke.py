#!/usr/bin/env python
"""On-device training smoke: N full-resolution train steps on synthetic
data; prints the loss curve and verifies it decreases. Validates the real
train path (assign/sample/7 losses/backward/SGD) at production shapes.

Usage: python tools/train_smoke.py [--steps 300] [--batch 2] [--bf16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--lr", type=float, default=None,
                   help="override lr (reference 0.02 assumes batch 12; "
                        "linear scaling suggests lr*batch/12)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.train.train_step import (
        TrainBatch,
        create_train_state,
        make_jitted_train_step,
    )

    cfg = getattr(C, args.config)()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    if args.lr is not None:
        import dataclasses
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, lr=args.lr))

    rng = np.random.RandomState(0)
    b, h, w = args.batch, args.height, args.width
    max_gt = cfg.train.max_gt

    def make_batch():
        images = rng.normal(0, 1, (b, h, w, 3)).astype(np.float32)
        gt_boxes = np.zeros((b, max_gt, 4), np.float32)
        gt_labels = np.zeros((b, max_gt), np.int32)
        gt_valid = np.zeros((b, max_gt), bool)
        for i in range(b):
            for g in range(6):
                x1 = rng.uniform(0, w - 120)
                y1 = rng.uniform(0, h - 120)
                bw, bh = rng.uniform(40, 110), rng.uniform(40, 110)
                gt_boxes[i, g] = [x1, y1, x1 + bw, y1 + bh]
                gt_labels[i, g] = rng.randint(0, cfg.num_classes)
                gt_valid[i, g] = True
                # paint the object so there is signal to fit
                images[i, int(y1):int(y1 + bh), int(x1):int(x1 + bw)] += (
                    0.5 + 0.1 * gt_labels[i, g]
                )
        shapes = np.tile([[h - 18.0, w - 11.0]], (b, 1)).astype(np.float32)
        return TrainBatch(
            images=jnp.asarray(images),
            img_shapes=jnp.asarray(shapes),
            gt_boxes=jnp.asarray(gt_boxes),
            gt_labels=jnp.asarray(gt_labels),
            gt_valid=jnp.asarray(gt_valid),
        )

    # a small pool of fixed batches (pseudo-dataset)
    pool = [make_batch() for _ in range(4)]
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), pool[0], steps_per_epoch=1000
    )
    step = make_jitted_train_step(model, tx)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    first = last = None
    for it in range(args.steps):
        state, metrics = step(state, pool[it % len(pool)], key)
        if it % args.log_every == 0 or it == args.steps - 1:
            loss = float(metrics["loss"])
            acc = float(metrics["s0.acc"])
            if first is None:
                first = loss
            last = loss
            print(json.dumps({
                "iter": it, "loss": round(loss, 4),
                "s0.acc": round(acc, 4),
                "rpn_cls": round(float(metrics["loss_rpn_cls"]), 4),
                "s1_cls": round(float(metrics["s1.loss_cls"]), 4),
                "elapsed_s": round(time.time() - t0, 1),
            }), flush=True)
            assert np.isfinite(loss), f"diverged at {it}"
    print(json.dumps({"first": first, "last": last,
                      "converged": bool(last < 0.7 * first)}))


if __name__ == "__main__":
    main()
