"""Windowed DCN sampling + conv contraction as a fused Pallas TPU kernel.

Behavioral spec: mmcv-full 1.2.1 DeformConv2d (DCNv1) forward, as exposed
through `htd_tpu.ops.dcn.deform_conv2d` (reference resnet.py:171-195 wires
it as conv2 of the DCN-stage bottlenecks). This kernel computes, for one
image and one deform group,

    out[i, j, :] = sum_k bilinear(feat, base(i,j,k) + off(i,j,k)) @ W[k]

with the bilinear sampling done by the *windowed select-MAC* scheme (see
`ops/dcn.py::_window_sample` — the XLA twin used as the test oracle):

  * a sample whose corners stay within the integer window [-m, m+1] of its
    tap's base position is a weighted sum of (2m+2)^2 statically shifted
    VMEM views of the zero-padded feature stripe; the data-dependence
    moves from the address stream (the ~136 GB/s XLA gather engine, the
    flagship's dominant extra cost) into VPU select weights;
  * the per-tap (R*Wo, C) @ (C, Cout) conv contraction runs on the MXU in
    the same kernel, so the (Ho, Wo, K, C) sampled tensor never exists;
  * in-image samples whose offsets escape the window set a per-pixel flag;
    the caller (`dcn_conv_windowed`) resolves up to `cap` flagged pixels
    per image EXACTLY via the gather path and scatter-ADDs the correction
    into the output (no lax.cond — with nothing flagged the correction is
    a zero add, which is the permanent state for mmcv's zero-initialized
    offset convs and the common state for trained detection backbones).

Scope guards (callers fall back to the gather path otherwise): stride in
(1, 2) — stride 2 covers the three stage-entry convs via parity-plane
(space-to-depth) stripes; deform_groups 1 (all HTD configs); weight small
enough to sit in VMEM. The asymmetric window (lo, hi) variant (e.g.
HTD_DCN_WIN=asym -> (-1, 0)) trades shift count for correction-pass load.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# test hook: run the kernel in interpret mode on CPU
_INTERPRET = False

# flagged-pixel capacity of the exact correction pass (per image, per conv)
FB_CAP = 128


def _dcn_kernel(pad0_ref, pad1_ref, off_ref, w_ref, out_ref, flag_ref,
                *, r, wo, c, cout, kh, kw, lo, hi, h, w, pad, dil,
                stride, out_dtype):
    # floor-displacement window [lo, hi] -> corner shifts lo .. hi+1
    win = hi - lo + 2
    f32 = jnp.float32
    i = pl.program_id(0)

    # stripe: rows [i*R, i*R + L) of the padded map (L <= 2R by the caller's
    # geometry checks), assembled from two consecutive R-row blocks.
    # stride 1: (L, Wp, C) padded map rows. stride 2: (L, Wp/2, 4C)
    # parity-plane (space-to-depth) rows — input row 2*i + U lives at plane
    # row i + (U>>1), channel slab (U&1, V&1): the slice arithmetic below
    # is shared, with U = k*dil + (a - lo) exactly as in the stride-1 form.
    stripe = jnp.concatenate([pad0_ref[...], pad1_ref[...]], axis=0)

    off = off_ref[...].astype(f32)  # (R, Wo, 2K)
    # base grid (global output coords)
    row0 = (i * r).astype(f32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (r, wo, 1), 0).astype(f32) + row0
    ix = jax.lax.broadcasted_iota(jnp.int32, (r, wo, 1), 1).astype(f32)

    acc = jnp.zeros((r * wo, cout), f32)
    flag = jnp.zeros((r, wo, 1), f32)
    for kyi in range(kh):
        for kxi in range(kw):
            t = kyi * kw + kxi
            by = iy * stride - pad + kyi * dil
            bx = ix * stride - pad + kxi * dil
            ys = by + off[:, :, 2 * t : 2 * t + 1]
            xs = bx + off[:, :, 2 * t + 1 : 2 * t + 2]
            y0 = jnp.floor(ys)
            x0 = jnp.floor(xs)
            ly = ys - y0
            lx = xs - x0
            dyc = y0 - by
            dxc = x0 - bx
            inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
            in_win = (
                (dyc >= lo) & (dyc <= hi) & (dxc >= lo) & (dxc <= hi)
            )
            live = (inside & in_win).astype(f32)
            flag += (inside & ~in_win).astype(f32)

            samp = jnp.zeros((r, wo, c), stripe.dtype)
            for ai in range(win):
                a = ai + lo
                wy = (
                    jnp.where(dyc == a, 1.0 - ly, 0.0)
                    + jnp.where(dyc == a - 1.0, ly, 0.0)
                ) * live
                u = kyi * dil + a - lo
                for bi in range(win):
                    b = bi + lo
                    wx = jnp.where(dxc == b, 1.0 - lx, 0.0) + jnp.where(
                        dxc == b - 1.0, lx, 0.0
                    )
                    v = kxi * dil + b - lo
                    if stride == 1:
                        start = (u, v, 0)
                    else:  # parity-plane addressing (stride 2)
                        plane = (u & 1) * 2 + (v & 1)
                        start = (u >> 1, v >> 1, plane * c)
                    sl = jax.lax.slice(
                        stripe,
                        start,
                        (start[0] + r, start[1] + wo, start[2] + c),
                    )
                    samp = samp + sl * (wy * wx).astype(stripe.dtype)
            acc = acc + jax.lax.dot_general(
                samp.reshape(r * wo, c),
                w_ref[pl.ds(t * c, c), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
    out_ref[...] = acc.reshape(r, wo, cout).astype(out_dtype)
    flag_ref[...] = jnp.minimum(flag, 1.0)


def dcn_sample_conv_pallas(
    feat: Array,     # (H, W, C) one image, one deform group
    offsets: Array,  # (Ho, Wo, 2K) f32, [tap, (y, x)] minor layout
    weight: Array,   # (K*C, Cout), tap-major rows
    kh: int,
    kw: int,
    pad: int,
    dilation: int,
    lo: int,
    hi: int,
    stride: int = 1,
):
    """Returns (out (Ho, Wo, Cout), flag (Ho, Wo) f32 0/1). stride 1 or 2.

    (lo, hi): floor-displacement window bounds (symmetric m -> (-m, m);
    the asym (-1, 0) window covers offsets in [-1, 1) with 9 shifts).

    stride 2 streams the padded map as 2x2 parity planes (space-to-depth,
    channel slabs ordered (row parity, col parity)): input row 2i + U
    lives at plane row i + (U>>1), so every select-MAC shift stays a
    static contiguous VMEM slice at the OUTPUT resolution — the kernel
    does the same work per output pixel as the stride-1 form."""
    h, w, c = (int(s) for s in feat.shape)
    ho, wo, _ = (int(s) for s in offsets.shape)
    cout = int(weight.shape[-1])
    r = 8
    n_blocks = -(-ho // r)
    # sublane-align the output width: the per-tap (R, Wop, C) -> (R*Wop, C)
    # flatten feeding the MXU dot merges the row dims, which is only a safe
    # retile when the merged dim is a multiple of the 8-row sublane tile
    wop = -(-wo // 8) * 8
    pb = pad - lo
    # largest padded-map offset the kernel slices at (U/V in kernel terms)
    umax = (kh - 1) * dilation + (hi + 1 - lo)
    vmax = (kw - 1) * dilation + (hi + 1 - lo)
    if stride == 1:
        # row geometry: stripe length per block L = (R-1) + (kh-1)*dil + win
        ell = (r - 1) + umax + 1
    elif stride == 2:
        ell = (r - 1) + (umax >> 1) + 1
    else:
        raise ValueError(f"stride {stride} unsupported (1 or 2)")
    if ell > 2 * r:
        raise ValueError(f"window ({lo},{hi}) too large for R={r} row blocks")
    rows_pad = (n_blocks + 1) * r
    off_p = jnp.pad(
        offsets, ((0, n_blocks * r - ho), (0, wop - wo), (0, 0))
    )

    if stride == 1:
        pa_y = rows_pad - pb - h
        pa_x = max(0, (wop - 1) + vmax + 1 - pb - w)
        padmap = jnp.pad(feat, ((pb, pa_y), (pb, pa_x), (0, 0)))
        wp = w + pb + pa_x
        ck = c
    else:
        # parity planes: plane row i + (U>>1) for output rows up to
        # rows_pad; plane col j + (V>>1) for output cols up to wop
        wp = -(-(wop + (vmax >> 1) + 1) // 8) * 8
        pa_y = 2 * rows_pad - pb - h
        pa_x = 2 * wp - pb - w
        if pa_y < 0 or pa_x < 0:
            raise ValueError(
                f"stride-2 geometry does not fit: pad_after=({pa_y},{pa_x}) "
                f"for H,W=({h},{w}), pad={pad}, window=({lo},{hi})"
            )
        padded = jnp.pad(feat, ((pb, pa_y), (pb, pa_x), (0, 0)))
        padmap = (
            padded.reshape(rows_pad, 2, wp, 2, c)
            .transpose(0, 2, 1, 3, 4)
            .reshape(rows_pad, wp, 4 * c)
        )
        ck = 4 * c

    kernel = functools.partial(
        _dcn_kernel,
        r=r, wo=wop, c=c, cout=cout, kh=kh, kw=kw, lo=lo, hi=hi,
        h=float(h), w=float(w), pad=pad, dil=dilation, stride=stride,
        out_dtype=feat.dtype,
    )
    out, flag = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r, wp, ck), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, wp, ck), lambda i: (i + 1, 0, 0)),
            pl.BlockSpec((r, wop, offsets.shape[-1]), lambda i: (i, 0, 0)),
            pl.BlockSpec((weight.shape[0], cout), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((r, wop, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, wop, 1), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * r, wop, cout), feat.dtype),
            jax.ShapeDtypeStruct((n_blocks * r, wop, 1), jnp.float32),
        ],
        compiler_params=None if _INTERPRET else pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024
        ),
        interpret=_INTERPRET,
    )(padmap, padmap, off_p, weight)
    return out[:ho, :wo], flag[:ho, :wo, 0]


def _dcn_dx_kernel(g0_ref, g1_ref, off0_ref, off1_ref, wT_ref, dx_ref,
                   *, r, wxp, wgp, c, cout, kh, kw, lo, hi, h, w, pad, dil,
                   s_hi, sx_hi, out_dtype):
    """d_x row-block via the select-MAC TRANSPOSE (stride 1).

    The forward writes out[oy] += w_shift * x[oy - pad + ky*dil + a ...];
    its transpose is d_x[rx] += w_shift(oy) * d_col(oy) at
    oy = rx + pad - ky*dil - a — for each static (tap, shift) pair a
    static slice of the g-derived stripe, weighted by the same select
    weights the forward builds from the offsets. No scatter anywhere.
    """
    f32 = jnp.float32
    i = pl.program_id(0)
    win = hi - lo + 2

    g_stripe = jnp.concatenate([g0_ref[...], g1_ref[...]], axis=0)
    off = jnp.concatenate(
        [off0_ref[...], off1_ref[...]], axis=0).astype(f32)  # (2R, Wgp, 2K)

    # global out coords of stripe-local (q, col): oy = i*R + q - s_hi,
    # ox = col - sx_hi
    row0 = (i * r - s_hi).astype(f32)
    oy = jax.lax.broadcasted_iota(jnp.int32, (2 * r, wgp, 1), 0
                                  ).astype(f32) + row0
    ox = jax.lax.broadcasted_iota(jnp.int32, (2 * r, wgp, 1), 1
                                  ).astype(f32) - sx_hi

    acc = jnp.zeros((r, wxp, c), f32)
    for kyi in range(kh):
        for kxi in range(kw):
            t = kyi * kw + kxi
            # d_col_t over the whole stripe (one MXU dot per tap)
            d_col = jax.lax.dot_general(
                g_stripe.reshape(2 * r * wgp, cout),
                wT_ref[pl.ds(t * cout, cout), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).reshape(2 * r, wgp, c).astype(g_stripe.dtype)

            by = oy - pad + kyi * dil
            bx = ox - pad + kxi * dil
            ys = by + off[:, :, 2 * t: 2 * t + 1]
            xs = bx + off[:, :, 2 * t + 1: 2 * t + 2]
            y0 = jnp.floor(ys)
            x0 = jnp.floor(xs)
            ly = ys - y0
            lx = xs - x0
            dyc = y0 - by
            dxc = x0 - bx
            inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
            in_win = (
                (dyc >= lo) & (dyc <= hi) & (dxc >= lo) & (dxc <= hi)
            )
            live = (inside & in_win).astype(f32)

            for ai in range(win):
                a = ai + lo
                wy = (
                    jnp.where(dyc == a, 1.0 - ly, 0.0)
                    + jnp.where(dyc == a - 1.0, ly, 0.0)
                ) * live
                du = s_hi - (kyi * dil + a - pad)
                for bi in range(win):
                    b = bi + lo
                    wx = jnp.where(dxc == b, 1.0 - lx, 0.0) + jnp.where(
                        dxc == b - 1.0, lx, 0.0
                    )
                    dv = sx_hi - (kxi * dil + b - pad)
                    wgt = (wy * wx).astype(g_stripe.dtype)
                    sl_w = jax.lax.slice(
                        wgt, (du, dv, 0), (du + r, dv + wxp, 1))
                    sl_d = jax.lax.slice(
                        d_col, (du, dv, 0), (du + r, dv + wxp, c))
                    acc = acc + (sl_w * sl_d).astype(f32)
    dx_ref[...] = acc.astype(out_dtype)


def dcn_dx_pallas(
    g: Array,        # (Ho, Wo, Cout) cotangent, one image
    offsets: Array,  # (Ho, Wo, 2K) f32
    weightT: Array,  # (K*Cout, C), tap-major rows of W transposed per tap
    kh: int,
    kw: int,
    pad: int,
    dilation: int,
    lo: int,
    hi: int,
    h: int,
    w: int,
    c: int,
    interpret: bool = False,
) -> Array:
    """d_x (H, W, C) for the stride-1 dg=1 windowed DCN (select-MAC
    transpose; out-of-window samples contribute 0 here and are resolved
    by the caller's exact capped correction)."""
    ho, wo = int(g.shape[0]), int(g.shape[1])
    cout = int(g.shape[-1])
    assert ho == h and wo == w, "stride-1 geometry"
    r = 8
    n_blocks = -(-h // r)
    # shift range: rx = oy + (kyi*dil + a - pad), a in [lo, hi+1]
    s_hi = (kh - 1) * dilation + hi + 1 - pad
    s_lo = lo - pad
    sx_hi = (kw - 1) * dilation + hi + 1 - pad
    sx_lo = lo - pad
    ell = r + (s_hi - s_lo)
    if ell > 2 * r:
        raise ValueError(f"window ({lo},{hi}) too large for R={r} blocks")
    wxp = -(-w // 8) * 8
    wgp = -(-(wxp + (sx_hi - sx_lo)) // 8) * 8
    rows_pad = (n_blocks + 1) * r

    # pad the stripes: leading s_hi rows / sx_hi cols of zeros so every
    # (tap, shift) slice is in-bounds; zero rows contribute zero weight
    g_p = jnp.pad(
        g, ((s_hi, rows_pad - ho - s_hi), (sx_hi, wgp - wo - sx_hi), (0, 0))
    )
    off_p = jnp.pad(
        offsets,
        ((s_hi, rows_pad - ho - s_hi), (sx_hi, wgp - wo - sx_hi), (0, 0)),
    )

    kernel = functools.partial(
        _dcn_dx_kernel,
        r=r, wxp=wxp, wgp=wgp, c=c, cout=cout, kh=kh, kw=kw, lo=lo, hi=hi,
        h=float(h), w=float(w), pad=pad, dil=dilation,
        s_hi=s_hi, sx_hi=sx_hi, out_dtype=g.dtype,
    )
    dx = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r, wgp, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, wgp, cout), lambda i: (i + 1, 0, 0)),
            pl.BlockSpec((r, wgp, offsets.shape[-1]), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, wgp, offsets.shape[-1]), lambda i: (i + 1, 0, 0)),
            pl.BlockSpec((weightT.shape[0], c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, wxp, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks * r, wxp, c), g.dtype),
        compiler_params=None if (interpret or _INTERPRET)
        else pltpu.CompilerParams(vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret or _INTERPRET,
    )(g_p, g_p, off_p, off_p, weightT)
    return dx[:h, :w]


def _dcn_dow_kernel(pad0_ref, pad1_ref, off_ref, g_ref, wT_ref,
                    doff_ref, dw_ref,
                    *, r, wo, c, cout, kh, kw, lo, hi, h, w, pad, dil,
                    out_dtype):
    """d_offsets (in-kernel reduced) + d_weight (cross-step accumulated)
    for the stride-1 dg=1 windowed DCN — the select-MAC RECOMPUTE kernel.

    Mirrors the forward kernel's stripes and shift weights; additionally
    forms the bilinear COORDINATE derivatives (dwy = [dyc==a-1]-[dyc==a],
    dwx analogously — ly/lx have unit slope inside a floor cell) so that

        d_off_y[p, t] = sum_c d_col_t[p, c] * (sum_shifts dwy*wx*x_shift)
        d_w[t]       += samp_t^T @ g        (MXU, accumulated over blocks)

    with d_col_t = g @ W_t^T (one MXU dot per tap). Out-of-window samples
    contribute zero here (live mask) and are resolved exactly by the
    caller's capped correction, the same contract as the forward.
    """
    f32 = jnp.float32
    win = hi - lo + 2
    i = pl.program_id(0)
    stripe = jnp.concatenate([pad0_ref[...], pad1_ref[...]], axis=0)
    off = off_ref[...].astype(f32)      # (R, Wo, 2K)
    g_blk = g_ref[...]                  # (R, Wo, Cout)
    g2 = g_blk.reshape(r * wo, cout)

    row0 = (i * r).astype(f32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (r, wo, 1), 0).astype(f32) + row0
    ix = jax.lax.broadcasted_iota(jnp.int32, (r, wo, 1), 1).astype(f32)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros((kh * kw * c, cout), f32)

    doffs = []
    for kyi in range(kh):
        for kxi in range(kw):
            t = kyi * kw + kxi
            d_col = jax.lax.dot_general(
                g2, wT_ref[pl.ds(t * cout, cout), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).reshape(r, wo, c).astype(stripe.dtype)

            by = iy - pad + kyi * dil
            bx = ix - pad + kxi * dil
            ys = by + off[:, :, 2 * t: 2 * t + 1]
            xs = bx + off[:, :, 2 * t + 1: 2 * t + 2]
            y0 = jnp.floor(ys)
            x0 = jnp.floor(xs)
            ly = ys - y0
            lx = xs - x0
            dyc = y0 - by
            dxc = x0 - bx
            inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
            in_win = (
                (dyc >= lo) & (dyc <= hi) & (dxc >= lo) & (dxc <= hi)
            )
            live = (inside & in_win).astype(f32)

            samp = jnp.zeros((r, wo, c), stripe.dtype)
            sdy = jnp.zeros((r, wo, c), stripe.dtype)
            sdx = jnp.zeros((r, wo, c), stripe.dtype)
            for ai in range(win):
                a = ai + lo
                is_a = (dyc == a).astype(f32)
                is_am = (dyc == a - 1.0).astype(f32)
                wy = (is_a * (1.0 - ly) + is_am * ly) * live
                dwy = (is_am - is_a) * live
                u = kyi * dil + a - lo
                for bi in range(win):
                    b = bi + lo
                    is_b = (dxc == b).astype(f32)
                    is_bm = (dxc == b - 1.0).astype(f32)
                    wx = is_b * (1.0 - lx) + is_bm * lx
                    dwx = is_bm - is_b
                    v = kxi * dil + b - lo
                    sl = jax.lax.slice(
                        stripe, (u, v, 0), (u + r, v + wo, c))
                    samp = samp + sl * (wy * wx).astype(stripe.dtype)
                    sdy = sdy + sl * (dwy * wx).astype(stripe.dtype)
                    sdx = sdx + sl * (wy * dwx).astype(stripe.dtype)

            doffs.append(jnp.sum(
                d_col.astype(f32) * sdy.astype(f32), axis=-1, keepdims=True))
            doffs.append(jnp.sum(
                d_col.astype(f32) * sdx.astype(f32), axis=-1, keepdims=True))
            dw_ref[pl.ds(t * c, c), :] += jax.lax.dot_general(
                samp.reshape(r * wo, c), g2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
    doff_ref[...] = jnp.concatenate(doffs, axis=-1).astype(out_dtype)


def dcn_dow_pallas(
    feat: Array,     # (H, W, C) one image
    offsets: Array,  # (Ho, Wo, 2K) f32
    g: Array,        # (Ho, Wo, Cout) cotangent
    weightT: Array,  # (K*Cout, C) tap-major W^T rows
    kh: int,
    kw: int,
    pad: int,
    dilation: int,
    lo: int,
    hi: int,
    interpret: bool = False,
):
    """Returns (d_off (Ho, Wo, 2K) f32, d_w (K*C, Cout) f32) for the
    windowed stride-1 dg=1 DCN (out-of-window samples excluded; caller
    corrects them exactly)."""
    h, w, c = (int(s) for s in feat.shape)
    ho, wo, _ = (int(s) for s in offsets.shape)
    cout = int(g.shape[-1])
    k = kh * kw
    r = 8
    n_blocks = -(-ho // r)
    wop = -(-wo // 8) * 8
    pb = pad - lo
    umax = (kh - 1) * dilation + (hi + 1 - lo)
    vmax = (kw - 1) * dilation + (hi + 1 - lo)
    ell = (r - 1) + umax + 1
    if ell > 2 * r:
        raise ValueError(f"window ({lo},{hi}) too large for R={r} blocks")
    rows_pad = (n_blocks + 1) * r
    off_p = jnp.pad(
        offsets, ((0, n_blocks * r - ho), (0, wop - wo), (0, 0)))
    g_p = jnp.pad(g, ((0, n_blocks * r - ho), (0, wop - wo), (0, 0)))
    pa_y = rows_pad - pb - h
    pa_x = max(0, (wop - 1) + vmax + 1 - pb - w)
    padmap = jnp.pad(feat, ((pb, pa_y), (pb, pa_x), (0, 0)))
    wp = w + pb + pa_x

    kernel = functools.partial(
        _dcn_dow_kernel,
        r=r, wo=wop, c=c, cout=cout, kh=kh, kw=kw, lo=lo, hi=hi,
        h=float(h), w=float(w), pad=pad, dil=dilation,
        out_dtype=jnp.float32,
    )
    d_off, d_w = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r, wp, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, wp, c), lambda i: (i + 1, 0, 0)),
            pl.BlockSpec((r, wop, offsets.shape[-1]), lambda i: (i, 0, 0)),
            pl.BlockSpec((r, wop, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((weightT.shape[0], c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((r, wop, 2 * k), lambda i: (i, 0, 0)),
            pl.BlockSpec((k * c, cout), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * r, wop, 2 * k), jnp.float32),
            jax.ShapeDtypeStruct((k * c, cout), jnp.float32),
        ],
        compiler_params=None if (interpret or _INTERPRET)
        else pltpu.CompilerParams(vmem_limit_bytes=80 * 1024 * 1024),
        interpret=interpret or _INTERPRET,
    )(padmap, padmap, off_p, g_p, weightT)
    return d_off[:ho, :wo], d_w


def dcn_conv_windowed(
    x: Array,        # (N, H, W, C)
    offsets: Array,  # (N, Ho, Wo, 2K) any float dtype
    weight: Array,   # (kh, kw, C, Cout) HWIO
    pad: int,
    dilation: int,
    m: int,
    cap: int = FB_CAP,
    lo: int | None = None,
    hi: int | None = None,
    stride: int = 1,
) -> Array:
    """Fused windowed DCN conv (stride 1 or 2, deform_groups 1) with the
    exact capped correction pass. Returns (N, Ho, Wo, Cout).

    Window: floor-displacement bounds (lo, hi), default the symmetric
    (-m, m). The asymmetric (-1, 0) window (HTD_DCN_WIN=asym) covers
    offsets in [-1, 1) with 9 select-MAC shifts instead of 16."""
    if (lo is None) != (hi is None):
        raise ValueError("lo and hi must be provided together")
    if lo is None:
        lo, hi = -m, m
    from htd_tpu.ops.dcn import _bilinear_gather

    n, h, w, c = (int(s) for s in x.shape)
    kh, kw = int(weight.shape[0]), int(weight.shape[1])
    cout = int(weight.shape[-1])
    k = kh * kw
    ho, wo = int(offsets.shape[1]), int(offsets.shape[2])
    f32 = jnp.float32
    wmat = weight.reshape(k * c, cout).astype(x.dtype)
    cap = max(1, min(cap, ho * wo))

    outs = []
    for img in range(n):
        off = offsets[img].astype(f32)
        out, flag = dcn_sample_conv_pallas(
            x[img], off, wmat, kh, kw, pad, dilation, lo, hi, stride
        )
        # exact correction for flagged pixels (top-cap compaction; zero add
        # when nothing is flagged — no cond, no windowed-value re-read)
        _, idx = jax.lax.top_k(flag.reshape(-1), cap)
        valid = jnp.take(flag.reshape(-1), idx) > 0.0

        off_px = jnp.take(off.reshape(ho * wo, 2 * k), idx, axis=0)
        py = (idx // wo).astype(f32)
        px = (idx % wo).astype(f32)
        ky = jnp.arange(kh, dtype=f32) * dilation
        kx = jnp.arange(kw, dtype=f32) * dilation
        base_y = py[:, None] * stride - pad + jnp.repeat(ky, kw)[None, :]
        base_x = px[:, None] * stride - pad + jnp.tile(kx, kh)[None, :]
        ys = base_y + off_px[:, 0::2]
        xs = base_x + off_px[:, 1::2]
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
        oow = ~(
            (y0 - base_y >= lo) & (y0 - base_y <= hi)
            & (x0 - base_x >= lo) & (x0 - base_x <= hi)
        )
        need = inside & oow & valid[:, None]
        fb = _bilinear_gather(x[img].reshape(h * w, c), h, w, ys, xs)
        fb = jnp.where(need[..., None], fb, 0.0).astype(x.dtype)
        corr = jax.lax.dot_general(
            fb.reshape(cap, k * c), wmat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        flat = out.reshape(ho * wo, cout).astype(f32)
        flat = flat.at[idx].add(corr)
        outs.append(flat.reshape(ho, wo, cout))
    return jnp.stack(outs).astype(x.dtype)
