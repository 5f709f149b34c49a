#!/usr/bin/env python
"""Micro-benchmark: RoIAlign kernel variants on the real TPU.

Slope timing (N iterations inside one jit, CSE defeated) — see PERF.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope(run_n, n_small=2, n_big=12, repeats=3):
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
    p.add_argument("--rois", type=int, default=1000)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--dist", default="log", choices=["log", "nms"])
    p.add_argument("--only", default=None, help="substring filter on variants")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from htd_tpu.ops.boxes import map_roi_levels
    from htd_tpu.ops.roi_align import roi_align_pyramid
    from htd_tpu.ops import roi_align_pallas as rap

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)
    strides = (4, 8, 16, 32)
    h, w = args.height, args.width
    feats = [
        jnp.asarray(rng.normal(0, 1, (h // s, w // s, 256)).astype(np.float32), dt)
        for s in strides
    ]
    # roi distribution: --dist log (log-uniform scales; clusters heavily on
    # the coarse levels — flattering for window reuse) or --dist nms
    # (small, spread-out boxes like post-NMS proposals — the production
    # distribution, ~no window reuse)
    n = args.rois
    if args.dist == "nms":
        scale = np.exp(rng.uniform(np.log(24), np.log(160), n))
    else:
        scale = np.exp(rng.uniform(np.log(16), np.log(480), n))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), n))
    bw = np.minimum(scale * np.sqrt(ar), w - 2)
    bh = np.minimum(scale / np.sqrt(ar), h - 2)
    x1 = rng.uniform(0, w - bw)
    y1 = rng.uniform(0, h - bh)
    rois = jnp.asarray(np.stack([x1, y1, x1 + bw, y1 + bh], 1).astype(np.float32))
    lvls = map_roi_levels(rois, 4)

    import jax as _jax

    def _vmapped_trainable(r, l):
        return _jax.vmap(
            lambda rr, ll: rap.roi_align_fused_trainable(
                feats, rr, strides, ll, 7, 0, 4)
        )(r[None], l[None])[0]

    featsb = [f[None] for f in feats]

    def feats_b1():
        return featsb

    def _vmapped_feats_trainable(r, l):
        # feats as VMAPPED OPERANDS (batch axis 0) — exactly the model's
        # _roi_feats call pattern (jax.vmap over (B,H,W,C) levels)
        def one(fs, rr, ll):
            return rap.roi_align_fused_trainable(
                list(fs), rr, strides, ll, 7, 0, 4)

        return _jax.vmap(one)(tuple(featsb), r[None], l[None])[0]

    # 1x1 identity-ish conv to give features CONV-OUTPUT layouts, as they
    # have in-model (XLA assigns conv-friendly layouts that may force
    # relayout copies in front of the Pallas call)
    kern = jnp.asarray(np.eye(256, dtype=np.float32)[None, None], dt)

    def conv_feats():
        return [
            jax.lax.conv_general_dilated(
                f[None], kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0]
            for f in feats
        ]

    ref = None
    # window margins per variant for the correctness mask:
    # covered extent = (n*blk - blk - 2) on each axis
    variants = {
        "pyramid_gather_s4": (lambda r, l: roi_align_pyramid(
            feats, r, strides, l, max_samples=4), None),
        "conv_only": (lambda r, l: jnp.zeros((r.shape[0], 7, 7, 256), dt)
                      + sum(jnp.sum(f) for f in conv_feats())
                      + 0 * r[0, 0], None),
        "v3_fused_after_conv": (lambda r, l: rap.roi_align_fused(
            conv_feats(), r, strides, l, max_samples=4), (16, 64, 32, 96)),
        "v3_fused": (lambda r, l: rap.roi_align_fused(
            feats, r, strides, l, max_samples=4), (16, 64, 32, 96)),
        "v3_fused_trainable": (lambda r, l: rap.roi_align_fused_trainable(
            feats, r, strides, l, 7, 0, 4), (16, 64, 32, 96)),
        "v3_fused_train_vmap1": (_vmapped_trainable, (16, 64, 32, 96)),
        "v3_fused_train_vmapfeats": (_vmapped_feats_trainable, (16, 64, 32, 96)),
        "v4_bintile": (
            lambda r, l: rap.roi_align_pallas_v4(
                feats, r, strides, l, max_samples=4)[0],
            (16, rap.V4_COVER_H + 16 + 2, 96, rap.V4_COVER_W + 96 + 2),
        ),
        "v4_fused_batched": (
            lambda r, l: rap.roi_align_fused_batched(
                feats_b1(), r[None], strides, l[None], max_samples=4)[0],
            (16, rap.V4_COVER_H + 16 + 2, 96, rap.V4_COVER_W + 96 + 2),
        ),
        "v4_fused_after_conv": (
            lambda r, l: rap.roi_align_fused_batched(
                [f[None] for f in conv_feats()], r[None], strides, l[None],
                max_samples=4)[0],
            (16, rap.V4_COVER_H + 16 + 2, 96, rap.V4_COVER_W + 96 + 2),
        ),
    }
    for pack, ny, yb, nx, xb in (
        (1, 4, 16, 2, 64),   # 64x128 window (round-2 baseline geometry)
        (1, 4, 16, 3, 32),   # 64x96: same coverage, 25% less x traffic
        (1, 7, 8, 3, 32),    # 56x96: v2 y coverage, minimal traffic (23 specs)
        (1, 6, 8, 3, 32),    # 48x96: y coverage 38 px (vs 46) — more fallback
        (2, 4, 16, 3, 32),   # packed 64x96 (26 specs — may exceed Mosaic cap)
    ):
        name = f"v3_p{pack}_y{ny}x{yb}_x{nx}x{xb}"
        variants[name] = (
            lambda r, l, pack=pack, ny=ny, yb=yb, nx=nx, xb=xb:
            rap.roi_align_pallas_v3(
                feats, r, strides, l, max_samples=4,
                y_block=yb, n_y=ny, x_block=xb, n_x=nx, pack=pack),
            (yb, ny * yb, xb, nx * xb),
        )

    for name, (fn, win) in variants.items():
        if args.only and args.only not in name and name != "pyramid_gather_s4":
            continue
        try:
            @jax.jit
            def run_n(r, l, n):
                def body(i, acc):
                    out = fn(r + i.astype(r.dtype) * 1e-9, l)
                    return acc + jnp.sum(out.astype(jnp.float32))
                return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

            # correctness vs gather (window rois only; fallback covers rest
            # in v2/fused — raw v3 has no fallback, so compare on the
            # non-overflow subset)
            out = jax.jit(fn)(rois, lvls)
            if ref is None or win is None:
                if ref is None:
                    ref = np.asarray(out, np.float32)
                err = 0.0
                nbad = 0
                cov = 1.0
            else:
                yb, wh, xb, ww = win
                scales = np.asarray([1.0 / s for s in strides])[np.asarray(lvls)]
                ew = (np.asarray(rois)[:, 2] - np.asarray(rois)[:, 0]) * scales
                eh = (np.asarray(rois)[:, 3] - np.asarray(rois)[:, 1]) * scales
                okmask = (ew + xb + 2 <= ww) & (eh + yb + 2 <= wh)
                cov = float(okmask.mean())
                o = np.asarray(out, np.float32)
                d = np.abs(o - ref).max(axis=(1, 2, 3))
                err = float(d[okmask].max())
                nbad = int((d[okmask] > 0.05).sum())
            ms = slope(lambda k: run_n(rois, lvls, k)) * 1000
            print(f"{name:28s} {ms:7.2f} ms  max_err(win)={err:.4f} "
                  f"bad={nbad} win_cover={cov:.3f}")
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    main()
