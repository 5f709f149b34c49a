#!/usr/bin/env python
"""Throughput benchmark (reference tools/benchmark.py protocol: warmup 5,
single-image batches, steady-state fps).

Usage: python tools/benchmark.py [--config htd_r50_1x] [--iters 200] [--bf16]
"""

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--train", action="store_true", help="benchmark the train step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.apis import init_detector, make_inference_fn

    cfg = getattr(C, args.config)()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    model, variables = init_detector(cfg, args.checkpoint)

    rng = np.random.RandomState(0)
    b, h, w = args.batch_size, args.height, args.width
    images = jnp.asarray(rng.normal(0, 1, (b, h, w, 3)).astype(np.float32))
    shapes = jnp.asarray(np.tile([[h - 18.0, w - 11.0]], (b, 1)).astype(np.float32))
    sfs = jnp.ones((b, 4), jnp.float32)

    fwd = make_inference_fn(model, variables)
    out = fwd(images, shapes, sfs)
    jax.block_until_ready(out)
    for _ in range(5):
        out = fwd(images, shapes, sfs)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(images, shapes, sfs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    ips = args.iters * b / dt
    print(json.dumps({
        "config": args.config,
        "batch": b, "hw": [h, w],
        "images_per_sec": round(ips, 3),
        "ms_per_image": round(1000 * dt / (args.iters * b), 3),
    }))


if __name__ == "__main__":
    main()
