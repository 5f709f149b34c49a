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

import functools
import os

import numpy as np

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


def _window_sample(
    feat: Array,       # (H, W, C) one image, one deform group
    ys: Array,         # (Ho, Wo, K) f32 sample rows
    xs: Array,         # (Ho, Wo, K) f32 sample cols
    base_y: Array,     # (Ho, Wo, K) f32 integer-valued tap base rows
    base_x: Array,     # (Ho, Wo, K) f32 integer-valued tap base cols
    kh: int,
    kw: int,
    stride: int,
    dilation: int,
    pad: int,
    m: int,
    cap: int,
) -> Array:
    """Windowed select-MAC bilinear sampling (TPU fast path for DCN).

    The XLA row-gather engine caps at ~136 GB/s for the 512 B rows this op
    needs (PERF.md "Known platform quirks"), making gather-based DCN
    sampling the flagship's dominant extra cost. This path exploits the
    *locality* of deformable-conv offsets instead: a sample whose bilinear
    corners fall within the integer window [-m, m+1] of its tap's base
    position is computed as a weighted sum of (2m+2)^2 statically *shifted
    views* of the zero-padded feature map — pure VPU multiply-adds on
    contiguous data, no gather at all. The data-dependent part moves from
    the address stream into the weights:

        w(a, b) = [floor(dy)==a](1-ly)·wx + [floor(dy)==a-1]ly·wx, ...

    Samples outside the window (|floor(y)-base| > m, likewise x) are
    flagged, compacted by top-k to a fixed `cap`, resolved EXACTLY by the
    row-gather path, and scattered back. With mmcv's zero-initialized
    offset convs nothing is ever flagged at init; trained offsets
    concentrate within a few pixels so the window catches almost all
    samples. Flagged samples beyond `cap` keep a zero contribution (same
    bounded-capacity contract as the v4 RoIAlign fallback).

    Exactness: for in-window samples the corner weights and their
    accumulation order match `_bilinear_gather` term-for-term (interleaved
    exact zeros do not perturb f32 or bf16 sums), so f32 results are
    bit-identical and bf16 results match the gather path's rounding.
    """
    h, w, c = feat.shape
    ho, wo, k = ys.shape
    f32 = jnp.float32
    win = 2 * m + 2  # corner displacements a, b in [-m, m+1]

    p_before = pad + m
    p_after_y = max(0, (ho - 1) * stride + (kh - 1) * dilation + m + 2 - pad - h)
    p_after_x = max(0, (wo - 1) * stride + (kw - 1) * dilation + m + 2 - pad - w)
    padmap = jnp.pad(
        feat, ((p_before, p_after_y), (p_before, p_after_x), (0, 0))
    )

    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0).astype(f32)
    lx = (xs - x0).astype(f32)
    dyc = y0 - base_y  # integer-valued float corner displacement
    dxc = x0 - base_x
    in_win = (dyc >= -m) & (dyc <= m) & (dxc >= -m) & (dxc <= m)
    live = inside & in_win

    # per-displacement weights (Ho, Wo, K, win); live-masked so partial
    # (out-of-window) corner sums never leak into the output
    disp = jnp.arange(-m, m + 2, dtype=f32)
    wy = jnp.where(dyc[..., None] == disp, (1.0 - ly)[..., None], 0.0)
    wy = wy + jnp.where((dyc + 1.0)[..., None] == disp, ly[..., None], 0.0)
    wx_ = jnp.where(dxc[..., None] == disp, (1.0 - lx)[..., None], 0.0)
    wx_ = wx_ + jnp.where((dxc + 1.0)[..., None] == disp, lx[..., None], 0.0)
    wy = jnp.where(live[..., None], wy, 0.0)

    def shifted(dy_shift: int, dx_shift: int) -> Array:
        # view of padmap at output-grid displacement (dy_shift, dx_shift)
        # relative to (i*stride - pad, j*stride - pad)
        oy = dy_shift + p_before - pad
        ox = dx_shift + p_before - pad
        return jax.lax.slice(
            padmap,
            (oy, ox, 0),
            (oy + (ho - 1) * stride + 1, ox + (wo - 1) * stride + 1, c),
            (stride, stride, 1),
        )

    cols = []
    for kyi in range(kh):
        for kxi in range(kw):
            t = kyi * kw + kxi
            acc = jnp.zeros((ho, wo, c), feat.dtype)
            for ai in range(win):
                a = ai - m
                wrow = wy[..., t, ai]
                for bi in range(win):
                    b = bi - m
                    wgt = (wrow * wx_[..., t, bi]).astype(feat.dtype)
                    sl = shifted(kyi * dilation + a, kxi * dilation + b)
                    acc = acc + sl * wgt[..., None]
            cols.append(acc)
    sampled = jnp.stack(cols, axis=-2)  # (Ho, Wo, K, C)

    # Exact gather fallback for flagged (inside but out-of-window) samples,
    # at PIXEL granularity (a flagged pixel recomputes all K taps): the
    # per-sample top-k compaction profiled at ~0.33 ms/conv (37800-element
    # sort) x 27 DCN convs; per-pixel flags cut the sort domain 9x and the
    # whole branch sits under a lax.cond — with mmcv's zero-initialized
    # offset convs (and any offsets within the window) it never runs.
    need_fb_px = (inside & ~in_win).any(axis=-1).reshape(-1)  # (Ho*Wo,)
    n_px = ho * wo
    cap_px = max(1, min(cap, n_px))

    def run_fallback(sampled_):
        score = need_fb_px.astype(f32)
        _, idx = jax.lax.top_k(score, cap_px)
        fb_valid = jnp.take(need_fb_px, idx)
        fb_ys = jnp.take(ys.reshape(n_px, k), idx, axis=0)  # (cap, K)
        fb_xs = jnp.take(xs.reshape(n_px, k), idx, axis=0)
        fb = _bilinear_gather(feat.reshape(h * w, c), h, w, fb_ys, fb_xs)
        flat = sampled_.reshape(n_px, k * c)
        cur = jnp.take(flat, idx, axis=0)
        new = jnp.where(fb_valid[:, None], fb.reshape(cap_px, k * c), cur)
        return flat.at[idx].set(new).reshape(ho, wo, k, c)

    return jax.lax.cond(
        jnp.any(need_fb_px), run_fallback, lambda s: s, sampled
    )


def deform_conv2d(
    x: Array,          # (N, H, W, Cin)
    offsets: Array,    # (N, Ho, Wo, dg*18) — [g, tap, (y, x)] channel layout
    weight: Array,     # (3, 3, Cin, Cout) HWIO
    stride: int = 1,
    dilation: int = 1,
    deform_groups: int = 1,
) -> Array:
    # Sampler impl dispatch (HTD_DCN_IMPL):
    #   pallas — fused windowed select-MAC Pallas kernel + exact capped
    #            correction (ops/dcn_pallas.py). Default on TPU where its
    #            scope guards hold (stride 1 or 2, dg 1, weight fits VMEM);
    #            training grads via custom_vjp over the gather formulation.
    #            NOTE stride-2 dispatch changed in round 3 (was gather):
    #            out-of-window samples beyond HTD_DCN_FB_CAP flagged pixels
    #            per image contribute zero; HTD_DCN_S2_GATHER=1 restores
    #            the exact gather path for the stage-entry stride-2 convs.
    #   window — the XLA twin of the kernel (shifted-view select-MAC).
    #            Measured SLOWER than gather end-to-end at the XLA graph
    #            level (per-tap materialization + sort-based compaction,
    #            2026-08-18 A/B) — kept as the kernel's bit-exact oracle.
    #   gather — 4 corner row-gathers per tap (reference formulation;
    #            default off-TPU, the grad oracle, and the fallback for
    #            shapes outside the kernel's scope).
    #   quad   — one 4C-wide row-gather per tap: on-chip A/B REGRESSED the
    #            R-101-DCN backbone 42.2 -> 47.5 ms (2026-08-18).
    kh, kw, _, cout = weight.shape
    cin = x.shape[-1]
    impl = os.environ.get("HTD_DCN_IMPL", "")
    if impl == "":
        impl = "pallas" if jax.default_backend() not in ("cpu",) else "gather"
    if os.environ.get("HTD_DCN_QUAD", "0") == "1":
        impl = "quad"
    if impl not in ("pallas", "window", "gather", "quad"):
        raise ValueError(f"unknown HTD_DCN_IMPL {impl!r}")
    win_m = int(os.environ.get("HTD_DCN_WINDOW_M", "1"))
    fb_cap = int(os.environ.get("HTD_DCN_FB_CAP", "128"))
    # floor-displacement window bounds: symmetric [-m, m] by default;
    # HTD_DCN_WIN=asym -> [-1, 0] (offsets in [-1,1)): 9 select-MAC shifts
    # instead of 16, larger offsets resolved by the exact correction pass
    if os.environ.get("HTD_DCN_WIN", "") == "asym":
        win_lo, win_hi = -1, 0
    else:
        win_lo, win_hi = -win_m, win_m
    if impl == "pallas":
        s2_ok = os.environ.get("HTD_DCN_S2_GATHER", "0") != "1"
        # stride-2 stripe VMEM guard: the parity-plane stripes are
        # (r, ~w/2, 4c) and Mosaic's scoped-vmem stack for the kernel
        # scales with that row width x channel product. Calibrated on-chip
        # 2026-08-20: X-101 c2-entry at 1664-wide input (w_eff*4c = 426k)
        # ran the 80 MB budget over at 95.3 MB -> fall back to the gather
        # path above ~350k (R-101's largest stride-2 conv is ~180k).
        if stride == 2:
            w_eff = (x.shape[-2] // 2 + 24) * 4 * cin
            s2_ok = s2_ok and w_eff <= 350_000
        kernel_ok = (
            deform_groups == 1
            and (stride == 1 or (stride == 2 and s2_ok))
            and kh * kw * cin * cout * x.dtype.itemsize <= 6 * 2**20
        )
        if kernel_ok:
            pad = (kh - 1) // 2 * dilation
            fn = _pallas_dcn_fn(
                dilation, pad, win_m, fb_cap, win_lo, win_hi, stride
            )
            return fn(x, offsets, weight)
        impl = "gather"
    return _dcn_xla_impl(
        x, offsets, weight, stride, dilation, deform_groups, impl,
        win_m, fb_cap,
    )


def _dcn_sample_coords(x, offsets, kh, kw, stride, dilation, pad):
    """(ys, xs) sample positions (N, Ho, Wo, K), dg=1 (mirrors
    _dcn_xla_impl's base grid + offset addition)."""
    n, h, w, cin = x.shape
    ho, wo = offsets.shape[1], offsets.shape[2]
    k = kh * kw
    f32 = jnp.float32
    off = offsets.astype(f32).reshape(n, ho, wo, k, 2)
    oy = jnp.arange(ho, dtype=f32) * stride - pad
    ox = jnp.arange(wo, dtype=f32) * stride - pad
    ky = jnp.arange(kh, dtype=f32) * dilation
    kx = jnp.arange(kw, dtype=f32) * dilation
    base_y = oy[:, None, None] + ky[None, :, None]
    base_x = ox[:, None, None] + kx[None, None, :]
    base_y = jnp.broadcast_to(
        base_y[:, None, :, :], (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(
        base_x[None, :, :, :], (ho, wo, kh, kw)).reshape(ho, wo, k)
    ys = base_y[None] + off[..., 0]
    xs = base_x[None] + off[..., 1]
    return ys, xs


def _dcn_dx_folded(x, offsets, weight, g, kh, kw, stride, dilation, pad):
    """d(loss)/d(x) for the dg=1 gather-formulation DCN — corner-folded.

    The autodiff d_x is a scatter-add of Ho*Wo*K*4 corner rows per conv
    (the dominant cost of the R-101-DCN train step: ~30 convs x ~4-16 ms
    of sort+segsum scatters). The 4 bilinear corners of a sample fold into
    one 4C-wide row at the base corner; a 1-px border on the scatter grid
    absorbs the y0/x0 = -1 edge case (those corners carry weight 0 by the
    per-corner bounds rule, matching _bilinear_gather), and three shifted
    adds un-stagger. Exact vs autodiff (tests/test_dcn.py).
    """
    n, h, w, cin = (int(s) for s in x.shape)
    cout = int(weight.shape[-1])
    k = kh * kw
    f32 = jnp.float32
    ho, wo = int(offsets.shape[1]), int(offsets.shape[2])

    ys, xs = _dcn_sample_coords(x, offsets, kh, kw, stride, dilation, pad)
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0).astype(f32)
    lx = (xs - x0).astype(f32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def okw(yi, xi, base_w):
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & inside
        return jnp.where(ok, base_w, 0.0)

    w00 = okw(y0i, x0i, (1 - ly) * (1 - lx))
    w01 = okw(y0i, x0i + 1, (1 - ly) * lx)
    w10 = okw(y0i + 1, x0i, ly * (1 - lx))
    w11 = okw(y0i + 1, x0i + 1, ly * lx)
    w4 = jnp.stack([w00, w01, w10, w11], axis=-1)  # (N, Ho, Wo, K, 4)

    # d_col[pix, k, cin] = g[pix, :] @ W[k,cin,:]^T
    wmat = weight.reshape(k * cin, cout)
    dcol = jax.lax.dot_general(
        g.astype(x.dtype), wmat.astype(x.dtype),
        dimension_numbers=(((3,), (1,)), ((), ())),
    ).reshape(n, ho, wo, k, cin)

    vals = (w4[..., None].astype(x.dtype) * dcol[..., None, :]
            ).reshape(-1, 4 * cin)
    wp = w + 2
    img = (h + 2) * wp
    img_idx = jnp.arange(n, dtype=jnp.int32)[:, None, None, None]
    p00 = (img_idx * img + (y0i + 1) * wp + (x0i + 1)).reshape(-1)
    buf = jnp.zeros((n * img + wp + 2, 4 * cin), x.dtype)
    buf = buf.at[p00].add(vals)

    d = buf[:, :cin]
    d = d + jnp.pad(buf[:-1, cin:2 * cin], ((1, 0), (0, 0)))
    d = d + jnp.pad(buf[:-wp, 2 * cin:3 * cin], ((wp, 0), (0, 0)))
    d = d + jnp.pad(buf[:-wp - 1, 3 * cin:], ((wp + 1, 0), (0, 0)))
    d = d[:n * img].reshape(n, h + 2, wp, cin)
    return d[:, 1:h + 1, 1:w + 1, :]


def _dcn_dx_window(x, offsets, weight, g, kh, kw, dilation, pad, lo, hi,
                   cap):
    """d_x via the select-MAC TRANSPOSE (stride 1, dg=1), opt-in
    HTD_DCN_DX=window.

    The windowed forward is out = sum_shifts sel_w * shifted(x), so its
    transpose is d_x = sum_shifts unshift(sel_w * d_col) — dense shifted
    adds with NO scatter for in-window samples. Samples whose floor
    displacement escapes [lo, hi] contribute through a capped exact
    folded-scatter correction, mirroring the forward's correction pass
    (so this computes the gradient of the windowed+corrected forward;
    beyond-cap truncation matches the forward's documented behavior,
    unlike the default 'fold' path which takes exact-DCN gradients).

    Mixed-semantics caveat: in window mode only d_x is windowed — the
    d_off/d_w cotangents still come from the vjp of the exact gather
    formulation (_pallas_dcn_fn.bwd), so the three gradients are not all
    derived from the same forward when offsets escape the window. With
    mmcv's zero-init offset convs nothing escapes and the three agree;
    deriving d_off/d_w from the windowed formulation too is deliberate
    future work if window mode ever becomes a training default.
    """
    n, h, w, cin = (int(s) for s in x.shape)
    cout = int(weight.shape[-1])
    k = kh * kw
    f32 = jnp.float32
    ho, wo = int(offsets.shape[1]), int(offsets.shape[2])

    ys, xs = _dcn_sample_coords(x, offsets, kh, kw, 1, dilation, pad)
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0).astype(f32)
    lx = (xs - x0).astype(f32)

    # per-tap integer base grid (matches _dcn_sample_coords); ky/kx stay
    # NUMPY so the per-tap shift offsets below are trace-time constants
    oy = jnp.arange(ho, dtype=f32) - pad
    ox = jnp.arange(wo, dtype=f32) - pad
    ky = np.repeat(np.arange(kh, dtype=np.float32) * dilation, kw)
    kx = np.tile(np.arange(kw, dtype=np.float32) * dilation, kh)
    base_y = oy[None, :, None, None] + jnp.asarray(ky)[None, None, None, :]
    base_x = ox[None, None, :, None] + jnp.asarray(kx)[None, None, None, :]
    dy = (y0 - base_y).astype(jnp.int32)     # floor displacement
    dx_ = (x0 - base_x).astype(jnp.int32)
    in_win = ((dy >= lo) & (dy <= hi) & (dx_ >= lo) & (dx_ <= hi)) & inside

    wmat = weight.reshape(k * cin, cout)
    dcol = jax.lax.dot_general(
        g.astype(x.dtype), wmat.astype(x.dtype),
        dimension_numbers=(((3,), (1,)), ((), ())),
    ).reshape(n, ho, wo, k, cin)

    # dense transpose over the static shift window. Accumulate into a
    # zero-padded (H + 2*marg, W + 2*marg) buffer so every shift is a
    # static slice-add.
    marg_lo = pad - lo              # most-negative x offset magnitude
    marg_hi = (kh - 1) * dilation + hi + 1 - pad
    hp = h + marg_lo + max(marg_hi, 0) + 2
    wp = w + marg_lo + max(marg_hi, 0) + 2
    acc = jnp.zeros((n, hp, wp, cin), f32)
    hy, hx_ = 1.0 - ly, 1.0 - lx
    for kk in range(k):
        sy0 = int(ky[kk]) - pad
        sx0 = int(kx[kk]) - pad
        for a in range(lo, hi + 2):
            wy_a = (hy[..., kk] * (dy[..., kk] == a)
                    + ly[..., kk] * (dy[..., kk] == a - 1))
            for bb in range(lo, hi + 2):
                wx_b = (hx_[..., kk] * (dx_[..., kk] == bb)
                        + lx[..., kk] * (dx_[..., kk] == bb - 1))
                w_ab = (wy_a * wx_b * in_win[..., kk]).astype(f32)
                term = w_ab[..., None] * dcol[..., kk, :].astype(f32)
                oy0 = marg_lo + sy0 + a
                ox0 = marg_lo + sx0 + bb
                acc = jax.lax.dynamic_update_slice(
                    acc,
                    jax.lax.dynamic_slice(
                        acc, (0, oy0, ox0, 0), (n, ho, wo, cin)
                    ) + term,
                    (0, oy0, ox0, 0),
                )
    d_x = acc[:, marg_lo:marg_lo + h, marg_lo:marg_lo + w, :]

    # capped exact correction for out-of-window samples (top-cap per
    # image, mirroring dcn_conv_windowed's forward correction)
    need = inside & ~in_win                       # (N, Ho, Wo, K)
    flag = jnp.any(need, axis=-1).astype(f32)     # (N, Ho, Wo)
    cap = max(1, min(cap, ho * wo))

    def corr_one(flag_i, ys_i, xs_i, need_i, dcol_i):
        _, idx = jax.lax.top_k(flag_i.reshape(-1), cap)
        sel = jnp.take(flag_i.reshape(-1), idx) > 0.0
        ysel = jnp.take(ys_i.reshape(-1, k), idx, axis=0)
        xsel = jnp.take(xs_i.reshape(-1, k), idx, axis=0)
        nsel = jnp.take(need_i.reshape(-1, k), idx, axis=0) & sel[:, None]
        dsel = jnp.take(dcol_i.reshape(-1, k, cin), idx, axis=0)
        y0s = jnp.floor(ysel)
        x0s = jnp.floor(xsel)
        lys = (ysel - y0s).astype(f32)
        lxs = (xsel - x0s).astype(f32)
        y0i = y0s.astype(jnp.int32)
        x0i = x0s.astype(jnp.int32)
        d = jnp.zeros((h * w + w + 2, cin), f32)
        for cy in range(2):
            for cx in range(2):
                yi = y0i + cy
                xi = x0i + cx
                ok = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & nsel)
                wgt = (jnp.where(cy, lys, 1 - lys)
                       * jnp.where(cx, lxs, 1 - lxs)
                       * ok.astype(f32))
                p = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
                d = d.at[p.reshape(-1)].add(
                    (wgt[..., None] * dsel.astype(f32)).reshape(-1, cin))
        return d[:h * w].reshape(h, w, cin)

    corr = jax.vmap(corr_one)(flag, ys, xs, need, dcol)
    return (d_x + corr).astype(x.dtype)


def _dcn_dx_pallas(x, offsets, weight, g, kh, kw, dilation, pad, lo, hi,
                   cap, interpret=False):
    """d_x via the Pallas select-MAC transpose kernel + exact capped
    correction (stride 1, dg=1) — the round-5 kernel from PERF.md's
    design note: the XLA-graph form of this transpose loses to the folded
    scatter (per-term materialization), but inside a Pallas kernel the
    shifts are static VMEM slices and no scatter exists at all.

    Semantics: the gradient of the windowed+corrected forward — identical
    to the exact gather d_x whenever the correction cap covers every
    out-of-window sample (the same fidelity contract as the forward
    kernel; `calibrate_dcn` picks the cap). d_off/d_w still come from the
    exact-gather vjp (see _dcn_dx_window's mixed-semantics note).
    """
    from htd_tpu.ops.dcn_pallas import dcn_dx_pallas

    n, h, w, cin = (int(s) for s in x.shape)
    cout = int(weight.shape[-1])
    k = kh * kw
    f32 = jnp.float32
    ho, wo = int(offsets.shape[1]), int(offsets.shape[2])

    # tap-major transposed weights: rows [t*Cout, (t+1)*Cout) = W_t^T
    wT = jnp.transpose(
        weight.reshape(k, cin, cout), (0, 2, 1)
    ).reshape(k * cout, cin).astype(g.dtype)

    dxs = []
    for img in range(n):
        dxs.append(dcn_dx_pallas(
            g[img], offsets[img].astype(f32), wT, kh, kw, pad, dilation,
            lo, hi, h, w, cin, interpret=interpret,
        ))
    d_x = jnp.stack(dxs).astype(f32)

    # exact capped correction for out-of-window samples (the transpose of
    # the forward's correction pass; d_col computed only at flagged px)
    ys, xs = _dcn_sample_coords(x, offsets, kh, kw, 1, dilation, pad)
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    oy = jnp.arange(ho, dtype=f32) - pad
    ox = jnp.arange(wo, dtype=f32) - pad
    ky = np.repeat(np.arange(kh, dtype=np.float32) * dilation, kw)
    kx = np.tile(np.arange(kw, dtype=np.float32) * dilation, kh)
    base_y = oy[None, :, None, None] + jnp.asarray(ky)[None, None, None, :]
    base_x = ox[None, None, :, None] + jnp.asarray(kx)[None, None, None, :]
    dy = y0 - base_y
    dx_d = x0 - base_x
    in_win = ((dy >= lo) & (dy <= hi) & (dx_d >= lo) & (dx_d <= hi))
    need = inside & ~in_win
    flag = jnp.any(need, axis=-1).astype(f32)
    cap = max(1, min(cap, ho * wo))
    wT3 = jnp.transpose(weight.reshape(k, cin, cout), (0, 2, 1))  # (k,co,ci)

    def corr_one(flag_i, ys_i, xs_i, need_i, g_i):
        _, idx = jax.lax.top_k(flag_i.reshape(-1), cap)
        sel = jnp.take(flag_i.reshape(-1), idx) > 0.0
        ysel = jnp.take(ys_i.reshape(-1, k), idx, axis=0)
        xsel = jnp.take(xs_i.reshape(-1, k), idx, axis=0)
        nsel = jnp.take(need_i.reshape(-1, k), idx, axis=0) & sel[:, None]
        gsel = jnp.take(g_i.reshape(-1, cout), idx, axis=0).astype(f32)
        dsel = jnp.einsum("pc,kcd->pkd", gsel, wT3.astype(f32))
        y0s = jnp.floor(ysel)
        x0s = jnp.floor(xsel)
        lys = (ysel - y0s).astype(f32)
        lxs = (xsel - x0s).astype(f32)
        y0i = y0s.astype(jnp.int32)
        x0i = x0s.astype(jnp.int32)
        d = jnp.zeros((h * w + w + 2, cin), f32)
        for cy in range(2):
            for cx in range(2):
                yi = y0i + cy
                xi = x0i + cx
                ok = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & nsel)
                wgt = (jnp.where(cy, lys, 1 - lys)
                       * jnp.where(cx, lxs, 1 - lxs)
                       * ok.astype(f32))
                p = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
                d = d.at[p.reshape(-1)].add(
                    (wgt[..., None] * dsel).reshape(-1, cin))
        return d[:h * w].reshape(h, w, cin)

    corr = jax.vmap(corr_one)(flag, ys, xs, need, g.astype(f32))
    return (d_x + corr).astype(x.dtype)


def _bilinear_gather_grad(feat_flat, h, w, ys, xs):
    """(d/dys, d/dxs) of `_bilinear_gather`'s samples: the bilinear
    weights have unit slope inside a floor cell (floor itself carries
    zero gradient), per-corner bounds zero both value and derivative —
    matches jax.vjp of the gather formulation exactly."""
    f32 = jnp.float32
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = (ys - y0).astype(f32)
    lx = (xs - x0).astype(f32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    vdy = None
    vdx = None
    for cy in range(2):
        for cx in range(2):
            yi = y0i + cy
            xi = x0i + cx
            ok = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & inside)
            p = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            v = jnp.take(feat_flat, p.reshape(-1), axis=0, mode="clip")
            v = v.reshape(p.shape + (feat_flat.shape[-1],)).astype(f32)
            okf = ok.astype(f32)[..., None]
            wy = jnp.where(cy, ly, 1 - ly)[..., None]
            wx = jnp.where(cx, lx, 1 - lx)[..., None]
            dy_t = ((1.0 if cy else -1.0) * wx) * v * okf
            dx_t = (wy * (1.0 if cx else -1.0)) * v * okf
            vdy = dy_t if vdy is None else vdy + dy_t
            vdx = dx_t if vdx is None else vdx + dx_t
    return vdy, vdx


def _dcn_dow_pallas(x, offsets, weight, g, kh, kw, dilation, pad, lo, hi,
                    cap, interpret=False):
    """(d_off, d_w) via the select-MAC recompute kernel + exact capped
    correction (stride 1, dg=1) — replaces the vjp-of-gather recompute
    whose corner gathers were the flagship train step's remaining DCN
    backward cost (round-4 profile: ~6 ms-class fusions per c3/c4 conv).

    Same fidelity contract as the forward/d_x kernels: the kernel covers
    in-window samples; out-of-window samples resolve exactly through a
    capped correction, beyond-cap samples contribute zero.
    """
    from htd_tpu.ops.dcn_pallas import dcn_dow_pallas

    n, h, w, cin = (int(s) for s in x.shape)
    cout = int(weight.shape[-1])
    k = kh * kw
    f32 = jnp.float32
    ho, wo = int(offsets.shape[1]), int(offsets.shape[2])
    wT = jnp.transpose(
        weight.reshape(k, cin, cout), (0, 2, 1)
    ).reshape(k * cout, cin).astype(g.dtype)

    # flag geometry (XLA, elementwise — shared with the d_x correction)
    ys, xs = _dcn_sample_coords(x, offsets, kh, kw, 1, dilation, pad)
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    oy = jnp.arange(ho, dtype=f32) - pad
    ox = jnp.arange(wo, dtype=f32) - pad
    kyv = np.repeat(np.arange(kh, dtype=np.float32) * dilation, kw)
    kxv = np.tile(np.arange(kw, dtype=np.float32) * dilation, kh)
    base_y = oy[None, :, None, None] + jnp.asarray(kyv)[None, None, None, :]
    base_x = ox[None, None, :, None] + jnp.asarray(kxv)[None, None, None, :]
    dy = jnp.floor(ys) - base_y
    dxd = jnp.floor(xs) - base_x
    in_win = ((dy >= lo) & (dy <= hi) & (dxd >= lo) & (dxd <= hi))
    need = inside & ~in_win                      # (N, Ho, Wo, K)
    flag = jnp.any(need, axis=-1).astype(f32)
    cap = max(1, min(cap, ho * wo))
    wT3 = jnp.transpose(weight.reshape(k, cin, cout), (0, 2, 1))  # k,co,ci

    d_offs = []
    d_w = jnp.zeros((k * cin, cout), f32)
    for img in range(n):
        do_i, dw_i = dcn_dow_pallas(
            x[img], offsets[img].astype(f32), g[img], wT,
            kh, kw, pad, dilation, lo, hi, interpret=interpret,
        )
        # exact correction at flagged pixels
        _, idx = jax.lax.top_k(flag[img].reshape(-1), cap)
        sel = jnp.take(flag[img].reshape(-1), idx) > 0.0
        ysel = jnp.take(ys[img].reshape(-1, k), idx, axis=0)
        xsel = jnp.take(xs[img].reshape(-1, k), idx, axis=0)
        nsel = (jnp.take(need[img].reshape(-1, k), idx, axis=0)
                & sel[:, None])
        gsel = jnp.take(
            g[img].reshape(-1, cout), idx, axis=0).astype(f32)
        dsel = jnp.einsum("pc,kcd->pkd", gsel, wT3.astype(f32))
        xflat = x[img].reshape(h * w, cin)
        fb = _bilinear_gather(xflat, h, w, ysel, xsel).astype(f32)
        vdy, vdx = _bilinear_gather_grad(xflat, h, w, ysel, xsel)
        nmask = nsel.astype(f32)[..., None]
        do_y = jnp.sum(dsel * vdy * nmask, axis=-1)   # (cap, K)
        do_x = jnp.sum(dsel * vdx * nmask, axis=-1)
        corr = jnp.stack([do_y, do_x], axis=-1).reshape(cap, 2 * k)
        do_i = do_i.reshape(ho * wo, 2 * k).at[idx].add(corr)
        d_offs.append(do_i.reshape(ho, wo, 2 * k))
        dw_corr = jnp.einsum("pkc,pd->kcd", fb * nmask, gsel)
        d_w = d_w + dw_i + dw_corr.reshape(k * cin, cout)

    d_off = jnp.stack(d_offs).astype(offsets.dtype)
    d_w_out = d_w.reshape(kh, kw, cin, cout).astype(weight.dtype)
    return d_off, d_w_out


@functools.lru_cache(maxsize=None)
def _pallas_dcn_fn(dilation: int, pad: int, m: int, cap: int,
                   lo: int | None = None, hi: int | None = None,
                   stride: int = 1):
    """custom_vjp wrapper: Pallas windowed forward, gather-formulation
    gradients (exact; recomputes the forward in bwd). d_x uses the
    corner-folded scatter (HTD_DCN_DX=vjp restores full autodiff)."""

    def ref(x, offsets, weight):
        return _dcn_xla_impl(
            x, offsets, weight, stride, dilation, 1, "gather", m, cap
        )

    @jax.custom_vjp
    def f(x, offsets, weight):
        from htd_tpu.ops.dcn_pallas import dcn_conv_windowed

        return dcn_conv_windowed(
            x, offsets, weight, pad, dilation, m, cap, lo, hi, stride
        )

    def fwd(x, offsets, weight):
        return f(x, offsets, weight), (x, offsets, weight)

    def bwd(res, g):
        mode = os.environ.get("HTD_DCN_DX", "")
        if mode == "":
            # Pallas select-MAC transpose d_x by default on TPU (stride 1;
            # the three stage-entry stride-2 convs keep the folded
            # scatter); HTD_DCN_DX=fold restores round-4 behavior
            mode = (
                "pallas"
                if stride == 1 and jax.default_backend() != "cpu"
                else "fold"
            )
        if mode in ("window", "pallas") and stride != 1:
            mode = "fold"
        if mode in ("fold", "window", "pallas"):
            x, offsets, weight = res
            kh, kw = int(weight.shape[0]), int(weight.shape[1])
            wlo, whi = (lo, hi) if lo is not None else (-m, m)
            use_dow = (
                mode == "pallas"
                and os.environ.get("HTD_DCN_DOW", "pallas") != "vjp"
            )
            if use_dow:
                # select-MAC recompute kernel for d_off/d_w — replaces
                # the vjp-of-gather recompute (HTD_DCN_DOW=vjp reverts)
                d_off, d_w = _dcn_dow_pallas(
                    x, offsets, weight, g, kh, kw, dilation, pad,
                    wlo, whi, cap,
                )
            else:
                _, vjp_ow = jax.vjp(
                    lambda o, wt: ref(x, o, wt), offsets, weight
                )
                d_off, d_w = vjp_ow(g)
            if mode == "pallas":
                d_x = _dcn_dx_pallas(
                    x, offsets, weight, g, kh, kw, dilation, pad,
                    wlo, whi, cap,
                )
            elif mode == "window":
                d_x = _dcn_dx_window(
                    x, offsets, weight, g.astype(jnp.float32),
                    kh, kw, dilation, pad, wlo, whi, cap,
                )
            else:
                d_x = _dcn_dx_folded(
                    x, offsets, weight, g.astype(jnp.float32),
                    kh, kw, stride, dilation, pad,
                )
            return d_x, d_off, d_w
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def _dcn_xla_impl(
    x: Array,
    offsets: Array,
    weight: Array,
    stride: int,
    dilation: int,
    deform_groups: int,
    impl: str,
    win_m: int,
    fb_cap: int,
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

    cg = cin // deform_groups
    outs = []
    for g in range(deform_groups):
        feat = x[..., g * cg : (g + 1) * cg]

        if impl == "quad":
            def sample_img(feat_i, ys_i, xs_i):
                return _bilinear_gather_quad(feat_i, ys_i, xs_i)
        elif impl == "window":
            def sample_img(feat_i, ys_i, xs_i):
                return _window_sample(
                    feat_i, ys_i, xs_i, base_y, base_x, kh, kw,
                    stride, dilation, pad, win_m, fb_cap,
                )
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
