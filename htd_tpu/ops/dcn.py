"""Deformable convolution v1 (gather-based bilinear sampling + matmul).

Behavioral spec: mmcv-full 1.2.1 `DeformConv2dPack` as wired into the
reference's ResNet bottlenecks (resnet.py:171-195, config
`dcn=dict(type='DCN', deform_groups=1)`): a regular conv predicts per-pixel
(dy, dx) offsets for every kernel tap (layout: [group, tap, (y, x)] along
channels), the deformed 3x3 samples are bilinearly interpolated with zero
padding outside the map, then contracted with the conv weight.

TPU mapping: the sampling becomes 4 corner gathers over the flattened map
(one DMA-friendly row gather per corner), the contraction is one big MXU
matmul over (taps x in-channels).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _bilinear_gather_quad(feat: Array, ys: Array, xs: Array) -> Array:
    """Quad-concat bilinear sampling: ONE wide row-gather per tap.

    The 4-corner formulation issues 4 gathers of C-wide rows; on this
    platform XLA row-gathers cap at ~136 GB/s for 512 B rows and improve
    substantially with row width (PERF.md "Op-level measurements"). Here we
    precompute a zero-padded map whose channel dim concatenates the 2x2
    corner neighborhood — quad[y, x] = [f[y,x], f[y,x+1], f[y+1,x],
    f[y+1,x+1]] — so each tap needs a single gather of a 4C-wide row
    (same total bytes, 1/4 the rows at 4x the width), and out-of-image
    corners read the zero padding instead of needing per-corner masks.

    feat: (H, W, C); ys/xs: float arrays of identical shape S.
    Returns S + (C,). Matches `_bilinear_gather` exactly in f32.
    """
    h, w, c = feat.shape
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0).astype(feat.dtype)
    lx = (xs - x0).astype(feat.dtype)
    # +1 shift onto the padded map; inside samples have y0 in [-1, h-1]
    y0i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
    x0i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)

    xp = jnp.pad(feat, ((1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [xp[:-1, :-1], xp[:-1, 1:], xp[1:, :-1], xp[1:, 1:]], axis=-1
    ).reshape((h + 1) * (w + 1), 4 * c)

    idx = y0i * (w + 1) + x0i
    g = jnp.take(quad, idx.reshape(-1), axis=0).reshape(idx.shape + (4 * c,))
    ins = inside.astype(feat.dtype)
    w00 = ((1 - ly) * (1 - lx) * ins)[..., None]
    w01 = ((1 - ly) * lx * ins)[..., None]
    w10 = (ly * (1 - lx) * ins)[..., None]
    w11 = (ly * lx * ins)[..., None]
    return (
        g[..., 0 * c : 1 * c] * w00
        + g[..., 1 * c : 2 * c] * w01
        + g[..., 2 * c : 3 * c] * w10
        + g[..., 3 * c : 4 * c] * w11
    )


def _bilinear_gather(feat_flat: Array, h: int, w: int, ys: Array, xs: Array) -> Array:
    """Sample (..., ) positions from (H*W, C) with zero padding outside.

    ys/xs: float arrays of identical shape S. Returns S + (C,).
    """
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(yi, xi, wgt):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take(feat_flat, idx.reshape(-1), axis=0).reshape(idx.shape + (feat_flat.shape[-1],))
        wgt = jnp.where(ok & inside, wgt, 0.0)
        return v * wgt[..., None].astype(v.dtype)

    return (
        corner(y0i, x0i, (1 - ly) * (1 - lx))
        + corner(y0i, x0i + 1, (1 - ly) * lx)
        + corner(y0i + 1, x0i, ly * (1 - lx))
        + corner(y0i + 1, x0i + 1, ly * lx)
    )


def deform_conv2d(
    x: Array,          # (N, H, W, Cin)
    offsets: Array,    # (N, Ho, Wo, dg*18) — [g, tap, (y, x)] channel layout
    weight: Array,     # (3, 3, Cin, Cout) HWIO
    stride: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
) -> Array:
    n, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    pad = (kh - 1) // 2 * dilation
    ho, wo = offsets.shape[1], offsets.shape[2]
    k = kh * kw
    f32 = jnp.float32

    if os.environ.get("HTD_DCN_FENCE", "0") == "1":
        # A/B: pin the input's layout before the flatten+gathers so layout
        # assignment can't flip the producing conv (see ops/fence.py)
        from htd_tpu.ops.fence import layout_fence

        x = layout_fence(x)

    off = offsets.astype(f32).reshape(n, ho, wo, deform_groups, k, 2)
    # base sampling grid
    oy = jnp.arange(ho, dtype=f32) * stride - pad
    ox = jnp.arange(wo, dtype=f32) * stride - pad
    ky = jnp.arange(kh, dtype=f32) * dilation
    kx = jnp.arange(kw, dtype=f32) * dilation
    base_y = oy[:, None, None] + ky[None, :, None]  # (Ho, kh, 1)
    base_x = ox[:, None, None] + kx[None, None, :]  # (Wo, 1, kw)
    base_y = jnp.broadcast_to(base_y[:, None, :, :], (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(base_x[None, :, :, :], (ho, wo, kh, kw)).reshape(ho, wo, k)

    ys = base_y[None, :, :, None, :] + off[..., 0]  # (N, Ho, Wo, dg, K)
    xs = base_x[None, :, :, None, :] + off[..., 1]

    # Quad-concat gather (one 4C-wide row per sample): on-chip A/B REGRESSED
    # the R-101-DCN backbone 42.2 -> 47.5 ms (2026-08-18) despite the
    # isolated row-gather microbenchmark favoring wide rows — the padded
    # quad build dominates. Stays opt-in.
    quad = os.environ.get("HTD_DCN_QUAD", "0") == "1"

    cg = cin // deform_groups
    outs = []
    for g in range(deform_groups):
        feat = x[..., g * cg : (g + 1) * cg]

        if quad:
            def sample_img(feat_i, ys_i, xs_i):
                return _bilinear_gather_quad(feat_i, ys_i, xs_i)
        else:
            def sample_img(feat_i, ys_i, xs_i):
                return _bilinear_gather(
                    feat_i.reshape(h * w, cg), h, w, ys_i, xs_i
                )

        sampled = jax.vmap(sample_img)(feat, ys[:, :, :, g, :], xs[:, :, :, g, :])
        outs.append(sampled)  # (N, Ho, Wo, K, cg)

    if deform_groups == 1:
        col = outs[0].reshape(n, ho, wo, k * cin)
        wmat = weight.transpose(0, 1, 2, 3).reshape(k * cin, cout)
        # weight HWIO flattened as (tap, cin) matches col's (tap, cin) order
        return jax.lax.dot_general(
            col, wmat.astype(col.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(x.dtype)
    else:
        # general case: contract per group then sum
        out = 0.0
        for g in range(deform_groups):
            col = outs[g].reshape(n, ho, wo, k * cg)
            wg = weight[:, :, g * cg : (g + 1) * cg, :].reshape(k * cg, cout)
            out = out + jax.lax.dot_general(
                col, wg.astype(col.dtype),
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        return out.astype(x.dtype)
