#!/usr/bin/env python
"""Throughput benchmark (reference tools/benchmark.py protocol).

Timing method: N model iterations inside ONE compiled program (dynamic
fori bound), slope between two N values — robust to the tunnel's per-call
round-trip and its no-op block_until_ready (see bench.py).

Usage:
  python tools/benchmark.py [--config htd_r50_1x] [--bf16]          # inference
  python tools/benchmark.py --train --batch-size 2 [--bf16]          # train step
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def _program_flops(jitfn, *args):
    """XLA cost-analysis FLOPs of one program application (the same
    estimator tools/get_flops.py uses); None when unavailable."""
    try:
        analysis = jitfn.lower(*args).compile().cost_analysis()
        f = analysis.get("flops") if analysis else None
        return float(f) if f and f > 0 else None
    except Exception:  # noqa: BLE001 — MFU is an extra, never fail the bench
        return None


def _chip_peak_flops():
    try:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench_constants.json")) as f:
            return float(json.load(f)["chip_peak_flops"])
    except Exception:  # noqa: BLE001
        return None


def _slope_time(run_n, n_small=2, n_big=12, repeats=3):
    float(run_n(1))  # compile + warmup
    def timed(n):
        t0 = time.perf_counter()
        float(run_n(n))
        return time.perf_counter() - t0
    t_small = min(timed(n_small) for _ in range(repeats))
    t_big = min(timed(n_big) for _ in range(repeats))
    return (t_big - t_small) / (n_big - n_small)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--height", type=int, default=None,
                   help="default: landscape bucket of the config's test_scale")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--train", action="store_true", help="benchmark the train step")
    p.add_argument("--no-mfu", action="store_true",
                   help="skip the extra cost-analysis compile that the "
                        "MFU estimate needs")
    args = p.parse_args()

    import jax

    from htd_tpu.utils.kernel_probe import probe_and_gate

    probe_and_gate(train=args.train)
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.apis import init_detector

    cfg = getattr(C, args.config)()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")

    from htd_tpu.data.pipeline import bucket_shape

    # per-model test resolution (X-101-DCN tests at (1600, 800), others
    # (1333, 800) — reference configs line 27 of each)
    bh, bw = bucket_shape(cfg.test_scale, landscape=True)
    rng = np.random.RandomState(0)
    b = args.batch_size
    h = args.height if args.height is not None else bh
    w = args.width if args.width is not None else bw
    images = jnp.asarray(rng.normal(0, 1, (b, h, w, 3)).astype(np.float32))
    shapes = jnp.asarray(np.tile([[h - 18.0, w - 11.0]], (b, 1)).astype(np.float32))
    sfs = jnp.ones((b, 4), jnp.float32)

    flops_per_iter = None
    if not args.train:
        model, variables = init_detector(cfg, args.checkpoint)

        @jax.jit
        def run_iters(v, im, sh, sf, n):
            def body(i, acc):
                dets = model.apply(v, im + i.astype(im.dtype) * 1e-9, sh, sf)
                return acc + jnp.sum(dets.scores)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        per_iter = _slope_time(lambda n: run_iters(variables, images, shapes, sfs, n))
        mode = "inference"
        if not args.no_mfu:
            flops_per_iter = _program_flops(
                jax.jit(lambda v, im, sh, sf: model.apply(v, im, sh, sf)),
                variables, images, shapes, sfs,
            )
    else:
        from htd_tpu.train.train_step import TrainBatch, create_train_state, train_step

        max_gt = cfg.train.max_gt
        gt_boxes = np.zeros((b, max_gt, 4), np.float32)
        gt_valid = np.zeros((b, max_gt), bool)
        gt_labels = np.zeros((b, max_gt), np.int32)
        for i in range(b):
            for g in range(8):
                x1, y1 = rng.uniform(0, w - 80), rng.uniform(0, h - 80)
                gt_boxes[i, g] = [x1, y1, x1 + rng.uniform(30, 70), y1 + rng.uniform(30, 70)]
                gt_labels[i, g] = rng.randint(0, cfg.num_classes)
                gt_valid[i, g] = True
        batch = TrainBatch(
            images=images, img_shapes=shapes,
            gt_boxes=jnp.asarray(gt_boxes), gt_labels=jnp.asarray(gt_labels),
            gt_valid=jnp.asarray(gt_valid),
        )
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=1000
        )

        @jax.jit
        def run_iters(state, batch, n):
            def body(i, st):
                b2 = batch._replace(images=batch.images + i.astype(batch.images.dtype) * 1e-9)
                st2, _ = train_step(model, tx, st, b2, jax.random.PRNGKey(0))
                return st2
            out = jax.lax.fori_loop(0, n, body, state)
            return out.params["rpn_head"]["rpn_conv"]["kernel"].sum()

        per_iter = _slope_time(lambda n: run_iters(state, batch, n), n_big=8)
        mode = "train"
        if not args.no_mfu:
            # fwd+bwd+SGD FLOPs of the exact step program (VERDICT r04
            # item 9: train optimization judged as utilization too)
            # return the FULL new state: returning a scalar would let XLA
            # dead-code-eliminate the step out of the costed program
            flops_per_iter = _program_flops(
                jax.jit(lambda st, bt: train_step(
                    model, tx, st, bt, jax.random.PRNGKey(0))),
                state, batch,
            )

    ips = b / per_iter
    out = {
        "config": args.config,
        "mode": mode,
        "batch": b, "hw": [h, w],
        "images_per_sec": round(ips, 3),
        "ms_per_iter": round(1000 * per_iter, 3),
    }
    peak = _chip_peak_flops()
    if flops_per_iter and peak and jax.default_backend() != "cpu":
        out["flops_per_img"] = round(flops_per_iter / b)
        out["mfu"] = round(ips * flops_per_iter / b / peak, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
