#!/usr/bin/env python
"""Model FLOPs/params via XLA cost analysis (reference tools/get_flops.py).

Usage: python tools/get_flops.py [--config htd_r50_1x] [--height 768 --width 1344]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--dtype", default=None,
                   help="compute_dtype override (e.g. bfloat16 to cost the "
                        "exact program bench.py times)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.apis import init_detector

    cfg = getattr(C, args.config)()
    if args.dtype:
        cfg = cfg.replace(compute_dtype=args.dtype)
    model, variables = init_detector(cfg)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))

    images = jnp.zeros((1, args.height, args.width, 3))
    shapes = jnp.asarray([[args.height - 18.0, args.width - 11.0]])
    sfs = jnp.ones((1, 4))

    # variables must be an ARGUMENT (closing over them bakes the weights
    # into the HLO as constants — a >100MB upload the remote-compile
    # tunnel rejects with HTTP 413)
    lowered = jax.jit(
        lambda v, im, sh, sf: model.apply(v, im, sh, sf)
    ).lower(variables, images, shapes, sfs)
    analysis = lowered.compile().cost_analysis()
    flops = analysis.get("flops", float("nan")) if analysis else float("nan")
    print(f"params: {nparams / 1e6:.2f} M")
    print(f"forward flops (XLA estimate): {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
