#!/usr/bin/env python
"""Stage-budget decomposition of HTD inference on the real TPU.

Times nested pipeline prefixes with the slope method (see PERF.md) and
reports per-stage deltas: backbone+FPN, +RPN proposals, +SFA+stage0,
+refine+stage1(extract/BA/convs/PGraph), +final NMS = full simple_test.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope(run_n, n_small=2, n_big=10, repeats=3):
    float(run_n(1))

    def timed(n):
        t0 = time.perf_counter()
        float(run_n(n))
        return time.perf_counter() - t0

    t1 = min(timed(n_small) for _ in range(repeats))
    t2 = min(timed(n_big) for _ in range(repeats))
    return (t2 - t1) / (n_big - n_small)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--set", dest="cfg_options", nargs="+", default=[])
    p.add_argument("--stages", nargs="+", default=None,
                   help="subset of prefixes to time")
    args = p.parse_args()

    import jax

    from htd_tpu.utils.kernel_probe import probe_and_gate

    probe_and_gate()
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.models.detector import HTDDetector

    cfg = getattr(C, args.config)(compute_dtype="bfloat16")
    if args.cfg_options:
        cfg = C.apply_overrides(cfg, args.cfg_options)
    model = HTDDetector(cfg)
    b, h, w = args.batch_size, args.height, args.width
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.normal(0, 1, (b, h, w, 3)).astype(np.float32))
    shapes = jnp.asarray(np.tile([[750.0, 1333.0]], (b, 1)).astype(np.float32))
    sfs = jnp.asarray(np.ones((b, 4), np.float32))

    init_fn = jax.jit(lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf))
    variables = init_fn(jax.random.PRNGKey(0), images, shapes, sfs)

    def prefix_fn(upto):
        """Pipeline prefix as a scalar-returning fn of (variables, images+eps).

        `variables` MUST be an argument, not a closure capture: captured
        arrays serialize into the HLO as literal constants, and the full
        param set blows past the remote-compile request size limit
        (observed HTTP 413 on the stage1/full prefixes)."""

        def fn(vs, img_i):
            out = model.apply(
                vs, img_i, shapes, sfs, upto, method=model.profile_prefix
            )
            return out

        return fn

    stages = [
        "backbone_fpn",
        "backbone_extract",
        "rpn_proposals",
        "stage0_extract",
        "stage0_extract_synth",
        "stage0",
        "stage1_extract",
        "stage1_ba",
        "stage1",
        "full",
    ]
    if args.stages:
        stages = args.stages
    prev = 0.0
    print(f"{'prefix':16s} {'cum ms':>8s} {'delta ms':>9s}")
    for s in stages:
        fn = prefix_fn(s)

        @jax.jit
        def run_n(vs, img, n, fn=fn):
            def body(i, acc):
                return acc + fn(vs, img + i.astype(img.dtype) * 1e-9)

            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        try:
            ms = slope(lambda k: run_n(variables, images, k)) * 1000
        except Exception as e:
            print(f"{s:16s} FAILED: {str(e)[:120]}")
            continue
        print(f"{s:16s} {ms:8.2f} {ms - prev:9.2f}")
        prev = ms


if __name__ == "__main__":
    main()
