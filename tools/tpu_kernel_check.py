#!/usr/bin/env python
"""On-TPU correctness gate for the round-3 kernel changes.

Validates, on the real chip (bf16 rounding tolerances):
  1. _build_pyramid_pallas == the XLA pad+concat build;
  2. roi_align_pallas_v4 default kernel == XLA pyramid-gather reference;
  3. roi_align_pallas_v4 HTD_V4_PACKED=1 == same reference;
  4. ops.upsample.upsample2x_add == broadcast+add form.

Exits nonzero on any mismatch — run before trusting any A/B numbers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import htd_tpu.ops.roi_align_pallas as rap
    from htd_tpu.ops.boxes import map_roi_levels
    from htd_tpu.ops.roi_align import roi_align_pyramid

    rng = np.random.RandomState(0)
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(
            rng.normal(0, 1, (192 // (2 ** i), 336 // (2 ** i), 256))
            .astype(np.float32)
        ).astype(jnp.bfloat16)
        for i in range(4)
    ]
    ok = True

    # 1. pyramid builder
    a = rap._build_pyramid_pallas(feats, rap.V4_RES_H, 384, rap.V4_X_BLOCK,
                                  rap.V4_Y_STRIPE)
    b = rap._build_pyramid_xla(feats, rap.V4_RES_H, 384, rap.V4_X_BLOCK,
                               rap.V4_Y_STRIPE)
    d = np.abs(np.asarray(a[0], np.float32) - np.asarray(b[0], np.float32))
    print(f"pyramid_builder max|diff| = {d.max()}")
    ok &= d.max() == 0.0

    # 2/3. v4 kernels vs gather reference
    n = 256
    rois = np.zeros((n, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 1200, n)
    rois[:, 1] = rng.uniform(0, 600, n)
    rois[:, 2] = rois[:, 0] + rng.uniform(8, 120, n)
    rois[:, 3] = rois[:, 1] + rng.uniform(8, 120, n)
    jrois = jnp.asarray(rois)
    lvls = map_roi_levels(jrois, 4)
    ref = np.asarray(
        roi_align_pyramid(feats, jrois, strides, lvls, 7, 0, 4), np.float32
    )
    for name, env in (("v4_default", "0"), ("v4_packed", "1")):
        os.environ["HTD_V4_PACKED"] = env
        out, ovf = jax.jit(
            lambda f, r, l: rap.roi_align_pallas_v4(f, r, strides, l, 7, 0, 4)
        )(feats, jrois, lvls)
        keep = ~np.asarray(ovf)  # size-overflow rois take the fallback path
        d = np.abs(np.asarray(out, np.float32)[keep] - ref[keep])
        print(f"{name} max|diff| = {d.max()} (kernel rois {keep.sum()}/{n})")
        ok &= d.max() < 0.1  # bf16 kernel vs bf16 gather rounding

    # 4. fused upsample+add (opt-in kernel; force the Pallas path here —
    # this gate exists to validate the kernel itself, not the default)
    from htd_tpu.ops import upsample as U

    os.environ["HTD_PALLAS_UPSAMPLE"] = "1"
    low = jnp.asarray(rng.normal(0, 1, (1, 96, 168, 256)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    lat = jnp.asarray(rng.normal(0, 1, (1, 192, 336, 256)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    got = np.asarray(jax.jit(U.upsample2x_add)(low, lat), np.float32)
    want = np.asarray(jax.jit(U._xla_up2_add)(low, lat), np.float32)
    d = np.abs(got - want)
    print(f"upsample2x_add max|diff| = {d.max()}")
    ok &= d.max() == 0.0

    print("TPU KERNEL CHECK:", "OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
