"""RoIAlign for TPU (single fused gather pass; XLA composition).

Behavioral spec: mmcv-full 1.2.1 `RoIAlign` with `aligned=True`,
`sampling_ratio=0` (adaptive grid = ceil(roi_extent / out_size) samples per
bin), average pooling, as built per FPN level by the reference at
base_roi_extractor.py:48-55 and configured at configs/htd/htd_resnet50_1x.py:46.

Exactness contract: bit-matches mmcv for rois whose adaptive grid count is
<= `max_samples` per axis (after FPN level mapping the grid is 1-5; see
SURVEY.md §7 step 4). Larger rois are approximated by `max_samples` uniform
samples per bin — same estimator, lower sample density.

Layout: features are NHWC; a single-image call is (H, W, C); batch via vmap.
Static shapes: rois are a fixed-capacity (R, 4) array; invalid rois simply
produce garbage rows that callers mask out.

Performance note (measured on TPU v5e): the XLA row-gather sustains
~136 GB/s, so sample count is the knob that matters. `roi_align_pyramid`
dispatches each roi to its FPN level in ONE gather pass over a flattened
pyramid — 4x less traffic than the naive align-on-every-level-and-select.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _interp_acc_dtype(feat_dtype):
    """Accumulation dtype for the bilinear-interp contraction.

    f32 features (CPU tests, parity suites) always accumulate in f32 —
    bit-identical to the oracle. bf16 features accumulate in bf16 unless
    HTD_F32_INTERP=1: `preferred_element_type=f32` on the tiny (k*k)
    contraction makes XLA lower it as an f32 VPU multiply-reduce and
    MATERIALIZE an f32 copy of the entire gathered corner tensor
    (~200 MB and ~3.5 ms/img across the BA merge + v4 fallback paths in
    the 2026-08-18 xplane trace); bf16 accumulation of <=64 weighted
    terms costs ~2 bits on values that are already bf16."""
    if feat_dtype == jnp.float32 or os.environ.get("HTD_F32_INTERP", "0") == "1":
        return jnp.float32
    return feat_dtype


def _sample_geometry(rois, scale, fh, fw, out_size, sampling_ratio,
                     max_samples):
    """Per-roi adaptive sample positions + bilinear corner tables.

    The single source of the mmcv `aligned=True` sampling_ratio=0 border
    semantics, shared by the forward gather core and the corner-folded
    backward (`roi_align_pyramid_batched_grad_feats`). Returns, per axis,
    (low, high, l, h, sample_mask, inside) with shapes (R, out, S), plus
    the per-roi adaptive grid counts (R,).
    """
    r = rois.shape[0]
    oh = ow = out_size
    s = int(sampling_ratio) if sampling_ratio > 0 else int(max_samples)
    f32 = jnp.float32

    rois = rois.astype(f32)
    scale = scale.astype(f32)
    start_w = rois[:, 0] * scale - 0.5
    start_h = rois[:, 1] * scale - 0.5
    roi_w = (rois[:, 2] - rois[:, 0]) * scale
    roi_h = (rois[:, 3] - rois[:, 1]) * scale
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    if sampling_ratio > 0:
        grid_w = jnp.full((r,), sampling_ratio, jnp.int32)
        grid_h = jnp.full((r,), sampling_ratio, jnp.int32)
    else:
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, s).astype(jnp.int32)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, s).astype(jnp.int32)

    # Sample coordinates: x[r, px, ix] = start_w[r] + (px + (ix+.5)/grid_w)*bin_w
    px = jnp.arange(ow, dtype=f32)
    ix = jnp.arange(s, dtype=f32)
    gw = jnp.maximum(grid_w, 1).astype(f32)[:, None, None]
    gh = jnp.maximum(grid_h, 1).astype(f32)[:, None, None]
    x = start_w[:, None, None] + (px[None, :, None] + (ix[None, None, :] + 0.5) / gw) * bin_w[:, None, None]
    y = start_h[:, None, None] + (px[None, :, None] + (ix[None, None, :] + 0.5) / gh) * bin_h[:, None, None]
    mx = ix[None, None, :] < grid_w.astype(f32)[:, None, None]
    my = ix[None, None, :] < grid_h.astype(f32)[:, None, None]

    def axis_interp(coord, size):
        """mmcv aligned border rules; `size` is per-roi (R,1,1)."""
        inside = (coord >= -1.0) & (coord <= size)
        cc = jnp.maximum(coord, 0.0)
        low = jnp.minimum(jnp.floor(cc), size - 1.0)
        high = jnp.minimum(low + 1.0, size - 1.0)
        frac = jnp.where(cc >= size - 1.0, 0.0, cc - low)
        return low.astype(jnp.int32), high.astype(jnp.int32), frac, inside

    size_w = fw.astype(f32)[:, None, None]
    size_h = fh.astype(f32)[:, None, None]
    x_low, x_high, lx, x_in = axis_interp(x, size_w)
    y_low, y_high, ly, y_in = axis_interp(y, size_h)
    hx, hy = 1.0 - lx, 1.0 - ly
    return (x_low, x_high, lx, hx, mx, x_in,
            y_low, y_high, ly, hy, my, y_in,
            grid_w, grid_h)


def _roi_align_core(
    feat_flat: Array,       # (N, C) flattened feature rows
    rois: Array,            # (R, 4) xyxy in image coords
    scale: Array,           # (R,) spatial scale per roi
    fh: Array,              # (R,) feature height per roi (float32)
    fw: Array,              # (R,) feature width per roi (float32)
    row_offset: Array,      # (R,) int32 offset of the roi's level in feat_flat
    out_size: int,
    sampling_ratio: int,
    max_samples: int,
    row_stride: Array = None,  # (R,) flat-index stride between feature rows
                               # (defaults to fw: densely packed levels);
                               # pass the pyramid W_pad to gather straight
                               # from a width-padded pyramid buffer
    quad: bool = False,        # feat_flat is a quad-concat map (N, 4C):
                               # row i = [f[i], f[i+1], f[i+stride],
                               # f[i+stride+1]] — ONE wide gather fetches a
                               # sample's whole 2x2 corner neighborhood
) -> Array:
    r = rois.shape[0]
    c = feat_flat.shape[-1] // (4 if quad else 1)
    oh = ow = out_size
    s = int(sampling_ratio) if sampling_ratio > 0 else int(max_samples)
    f32 = jnp.float32

    (x_low, x_high, lx, hx, mx, x_in,
     y_low, y_high, ly, hy, my, y_in,
     grid_w, grid_h) = _sample_geometry(
        rois, scale, fh, fw, out_size, sampling_ratio, max_samples)

    w_row = (fw if row_stride is None else row_stride).astype(jnp.int32)
    base = row_offset.astype(jnp.int32)

    if quad:
        # One 4C-wide row-gather per SAMPLE instead of four C-wide corner
        # gathers: on this platform XLA row-gathers cap at ~136 GB/s for
        # 512 B rows and speed up substantially with row width (PERF.md
        # "Op-level measurements"), so same bytes in 1/4 the rows wins.
        # Clamped +1 neighbors (y_low = H-1 / x_low = W-1) carry weight 0
        # (mmcv frac=0 border rule), so whatever the quad map holds there
        # — zero padding or the next pyramid level's rows — contributes 0.
        wy_in = (my & y_in).astype(f32)
        wx_in = (mx & x_in).astype(f32)
        hy_, ly_ = hy * wy_in, ly * wy_in
        hx_, lx_ = hx * wx_in, lx * wx_in

        def oy(a):  # (R, oh, S) -> (R, oh, 1, S, 1)
            return a[:, :, None, :, None]

        def ox(a):  # (R, ow, S) -> (R, 1, ow, 1, S)
            return a[:, None, :, None, :]

        wgt = jnp.stack(
            [oy(hy_) * ox(hx_), oy(hy_) * ox(lx_),
             oy(ly_) * ox(hx_), oy(ly_) * ox(lx_)],
            axis=-1,
        ).reshape(r, oh, ow, s * s, 4)
        row = y_low * w_row[:, None, None] + base[:, None, None]  # (R, oh, S)
        idx = (row[:, :, None, :, None] + x_low[:, None, :, None, :]
               ).reshape(r, oh, ow, s * s)
        v = jnp.take(feat_flat, idx.reshape(-1), axis=0, mode="clip")
        v = v.reshape(r, oh, ow, s * s, 4, c)
        acc = _interp_acc_dtype(feat_flat.dtype)
        out = jax.lax.dot_general(
            wgt.astype(feat_flat.dtype), v,
            dimension_numbers=(((3, 4), (3, 4)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=acc,
        )  # (R, oh, ow, C) in acc dtype
        count = jnp.maximum((grid_h * grid_w).astype(f32), 1.0)
        return (out / count[:, None, None, None].astype(acc)).astype(feat_flat.dtype)

    # Fold the (sample, corner) structure into per-axis weight/index tables
    # of K = 2*S entries, then contract the K*K combinations against the
    # gathered rows with ONE batched dot — this runs on the MXU instead of
    # a channel-broadcast multiply on the VPU (measured ~1.9x faster).
    k = 2 * s
    wy = jnp.stack([hy, ly], axis=-1) * (my & y_in)[..., None].astype(f32)
    wx = jnp.stack([hx, lx], axis=-1) * (mx & x_in)[..., None].astype(f32)
    iy = jnp.stack([y_low, y_high], axis=-1).reshape(r, oh, k)
    ix_t = jnp.stack([x_low, x_high], axis=-1).reshape(r, ow, k)
    wy = wy.reshape(r, oh, k)
    wx = wx.reshape(r, ow, k)

    if s == 1 and os.environ.get("HTD_BA_S1_FAST", "0") == "1":
        # 1x1-grid corner-gather path (the BA extractor's off-target
        # levels): four separate corner gathers + an elementwise weighted
        # sum instead of the batched K*K dot, keeping every tensor in flat
        # (rows, C) T(8,128) form. Opt-in, default OFF: the trace showed a
        # 0.33 ms/level relayout on the dot path, but the on-chip A/B
        # (2026-08-19, PERF.md round 3d) measured the corner-gather form
        # 0.75 img/s SLOWER end-to-end — 4x the gather rows cost more than
        # the relayout (same lesson as the quad-gather experiments).
        # count == 1 here (grid_h = grid_w in {0, 1} => max(g*g, 1) == 1),
        # so no average divide is needed.
        acc = _interp_acc_dtype(feat_flat.dtype)
        row = iy * w_row[:, None, None] + base[:, None, None]  # (R, oh, 2)
        out = None
        for cy in range(2):
            for cx in range(2):
                w_c = (wy[:, :, cy][:, :, None] * wx[:, None, :, cx]).astype(acc)
                idx_c = row[:, :, cy][:, :, None] + ix_t[:, None, :, cx]
                v_c = jnp.take(
                    feat_flat, idx_c.reshape(-1), axis=0, mode="clip"
                ).astype(acc)
                term = v_c * w_c.reshape(-1, 1)
                out = term if out is None else out + term
        return out.reshape(r, oh, ow, c).astype(feat_flat.dtype)

    def by(a):  # (R, oh, K) -> (R, oh, 1, K, 1)
        return a[:, :, None, :, None]

    def bx(a):  # (R, ow, K) -> (R, 1, ow, 1, K)
        return a[:, None, :, None, :]

    wgt = (by(wy) * bx(wx)).reshape(r, oh, ow, k * k)
    row = iy * w_row[:, None, None] + base[:, None, None]  # (R, oh, K)
    idx = (by(row) + bx(ix_t)).reshape(r, oh, ow, k * k)

    # mode="clip": indices are in-bounds by construction (border-clamped
    # rows/cols + valid level offsets); the default "fill" mode emitted an
    # out-of-bounds select that materialized an f32 copy of the entire
    # gathered tensor (~0.7 ms per 300k-row gather, trace round 2)
    v = jnp.take(feat_flat, idx.reshape(-1), axis=0, mode="clip")
    v = v.reshape(r, oh, ow, k * k, c)
    acc = _interp_acc_dtype(feat_flat.dtype)
    out = jax.lax.dot_general(
        wgt.astype(feat_flat.dtype), v,
        dimension_numbers=(((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
        preferred_element_type=acc,
    )  # (R, oh, ow, C) in acc dtype
    count = jnp.maximum((grid_h * grid_w).astype(f32), 1.0)
    return (out / count[:, None, None, None].astype(acc)).astype(feat_flat.dtype)


def quad_concat_flat(flat: Array, row_stride: int) -> Array:
    """Build the quad-concat map for `_roi_align_core(quad=True)`.

    quad[i] = [f[i], f[i+1], f[i+row_stride], f[i+row_stride+1]] along
    channels; rows shifted past the end read zeros. Valid for buffers where
    a sample's (y+1, x+1) neighbors at flat index i+row_stride+1 are either
    real neighbors or zero-weighted (clamped borders) — true for the padded
    v4 pyramid (zeros-initialized, per-level width < w_pad).
    """
    n, c = flat.shape
    z = jnp.zeros((row_stride + 1, c), flat.dtype)
    f01 = jnp.concatenate([flat[1:], z[:1]], axis=0)
    f10 = jnp.concatenate([flat[row_stride:], z[:row_stride]], axis=0)
    f11 = jnp.concatenate([flat[row_stride + 1:], z], axis=0)
    return jnp.concatenate([flat, f01, f10, f11], axis=-1)


def roi_align(
    feat: Array,
    rois: Array,
    spatial_scale: float,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 2,
) -> Array:
    """Align (R, out, out, C) features for (R, 4) xyxy rois on one (H, W, C) map."""
    h, w, c = feat.shape
    r = rois.shape[0]
    return _roi_align_core(
        feat.reshape(h * w, c),
        rois,
        scale=jnp.full((r,), spatial_scale, jnp.float32),
        fh=jnp.full((r,), float(h), jnp.float32),
        fw=jnp.full((r,), float(w), jnp.float32),
        row_offset=jnp.zeros((r,), jnp.int32),
        out_size=out_size,
        sampling_ratio=sampling_ratio,
        max_samples=max_samples,
    )


def roi_align_pyramid(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
) -> Array:
    """Level-dispatched RoIAlign in ONE gather pass over a flat pyramid.

    Behavioral spec: reference single_level_roi_extractor.py:81-98 — each roi
    is aligned only on its mapped FPN level. Instead of aligning densely on
    every level and selecting (4x the gather traffic), all levels are
    flattened into one (sum H_l*W_l, C) buffer and each roi samples it with
    per-roi (scale, H, W, row-stride, offset) parameters. Bit-identical to
    the per-level computation.
    """
    c = feats[0].shape[-1]
    hs = np.array([f.shape[0] for f in feats], np.float32)
    ws = np.array([f.shape[1] for f in feats], np.float32)
    sizes = [int(f.shape[0] * f.shape[1]) for f in feats]
    offs = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(np.int32)
    scales = np.array([1.0 / s for s in strides], np.float32)
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)

    lv = target_lvls
    return _roi_align_core(
        flat,
        rois,
        scale=jnp.asarray(scales)[lv],
        fh=jnp.asarray(hs)[lv],
        fw=jnp.asarray(ws)[lv],
        row_offset=jnp.asarray(offs)[lv],
        out_size=out_size,
        sampling_ratio=sampling_ratio,
        max_samples=max_samples,
    )


def roi_align_pyramid_batched(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
) -> Array:
    """Batched level-dispatched RoIAlign in ONE gather pass.

    feats: per-level (B, H_l, W_l, C); rois (B, R, 4); target_lvls (B, R).
    Returns (B, R, out, out, C). Same math as vmap(roi_align_pyramid) but
    folds (image, level) into one flat buffer with per-roi row offsets —
    one gather kernel over B*R rois instead of B batched ones.
    """
    b = rois.shape[0]
    r = rois.shape[1]
    c = feats[0].shape[-1]
    hs = np.array([f.shape[1] for f in feats], np.float32)
    ws = np.array([f.shape[2] for f in feats], np.float32)
    sizes = [int(f.shape[1] * f.shape[2]) for f in feats]
    img_size = int(np.sum(sizes))
    lvl_offs = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(np.int32)
    scales = np.array([1.0 / s for s in strides], np.float32)
    # flat layout: image-major, level-minor
    flat = jnp.concatenate(
        [jnp.concatenate([f[i].reshape(-1, c) for f in feats], axis=0)
         for i in range(b)],
        axis=0,
    )

    lv = target_lvls.reshape(-1)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    out = _roi_align_core(
        flat,
        rois.reshape(-1, 4),
        scale=jnp.asarray(scales)[lv],
        fh=jnp.asarray(hs)[lv],
        fw=jnp.asarray(ws)[lv],
        row_offset=jnp.asarray(lvl_offs)[lv] + img_idx * img_size,
        out_size=out_size,
        sampling_ratio=sampling_ratio,
        max_samples=max_samples,
    )
    return out.reshape(b, r, out_size, out_size, c)


def roi_align_pyramid_batched_grad_feats(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    g: Array,                      # (B, R, out, out, C) cotangent
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
):
    """d(loss)/d(feats) for `roi_align_pyramid_batched` — corner-FOLDED.

    The autodiff backward of the gather formulation is a scatter-add of
    R*49*S^2*4 sample-corner rows, which XLA lowers as sort + segmented
    sum at a cost proportional to the ROW COUNT (~54 ms per extraction in
    the b2 768x1344 train step, 50% of the whole step — round-4 xplane).
    A sample's four bilinear corners sit at flat rows {p, p+1, p+W, p+W+1}
    of its level map, so they fold into ONE scatter row of 4C width at the
    base corner p; the staggered buffer is then un-staggered with three
    zero-padded shifted adds per (image, level) plane. 4x fewer scatter
    rows, identical math (border-clamped +1 corners carry frac=0 weight,
    so their misdirected rows add exact zeros — same rule the forward's
    clip-mode gather relies on).
    """
    b, r = rois.shape[0], rois.shape[1]
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    return roi_align_pyramid_flat_grad_feats(
        feats, rois.reshape(-1, 4), strides, target_lvls.reshape(-1),
        img_idx, g.reshape(-1, out_size, out_size, feats[0].shape[-1]),
        out_size=out_size, sampling_ratio=sampling_ratio,
        max_samples=max_samples,
    )


def roi_align_pyramid_flat_grad_feats(
    feats: Sequence[Array],
    rois_flat: Array,              # (N, 4)
    strides: Sequence[int],
    lv: Array,                     # (N,) level per roi
    img_idx: Array,                # (N,) image per roi
    g: Array,                      # (N, out, out, C) cotangent
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
):
    """Flat-roi-list variant of `roi_align_pyramid_batched_grad_feats`
    (explicit per-roi image indices instead of a (B, R) layout) — used
    directly by the Pallas backward kernel's overflow fallback, which
    routes an arbitrary cross-image roi subset through the folded
    scatter."""
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    oh = ow = out_size
    s = int(sampling_ratio) if sampling_ratio > 0 else int(max_samples)
    f32 = jnp.float32
    hs = np.array([f.shape[1] for f in feats], np.float32)
    ws = np.array([f.shape[2] for f in feats], np.float32)
    sizes = [int(f.shape[1] * f.shape[2]) for f in feats]
    img_size = int(np.sum(sizes))
    lvl_offs = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(np.int32)
    scales = np.array([1.0 / st for st in strides], np.float32)

    fh = jnp.asarray(hs)[lv]
    fw = jnp.asarray(ws)[lv]
    base = jnp.asarray(lvl_offs)[lv] + img_idx * img_size

    (x_low, _, lx, hx, mx, x_in,
     y_low, _, ly, hy, my, y_in,
     grid_w, grid_h) = _sample_geometry(
        rois_flat, jnp.asarray(scales)[lv], fh, fw,
        out_size, sampling_ratio, max_samples)

    wy = jnp.stack([hy, ly], axis=-1) * (my & y_in)[..., None].astype(f32)
    wx = jnp.stack([hx, lx], axis=-1) * (mx & x_in)[..., None].astype(f32)
    count = jnp.maximum((grid_h * grid_w).astype(f32), 1.0)
    gg = (g.reshape(-1, oh, ow, c).astype(f32)
          / count[:, None, None, None])

    # folded corner values: (N, oh, ow, Sy, Sx, 4, C) -> rows of 4C
    w4 = (wy[:, :, None, :, None, :, None]        # (N, oh, 1, Sy, 1, 2, 1)
          * wx[:, None, :, None, :, None, :])     # (N, 1, ow, 1, Sx, 1, 2)
    w4 = w4.reshape(-1, oh, ow, s, s, 4)
    dtype = feats[0].dtype
    vals = (w4[..., None] * gg[:, :, :, None, None, None, :]).astype(dtype)
    vals = vals.reshape(-1, 4 * c)

    w_row = fw.astype(jnp.int32)
    p00 = (base[:, None, None, None, None]
           + y_low[:, :, None, :, None] * w_row[:, None, None, None, None]
           + x_low[:, None, :, None, :])          # (N, oh, ow, Sy, Sx)
    rows4 = jnp.zeros((b * img_size, 4 * c), dtype)
    rows4 = rows4.at[p00.reshape(-1)].add(vals)

    # un-stagger per (image, level) plane: d[y, x] = c00[y, x] +
    # c01[y, x-1] + c10[y-1, x] + c11[y-1, x-1]
    dfeats = []
    for l, f in enumerate(feats):
        hl, wl = int(f.shape[1]), int(f.shape[2])
        per_img = []
        for i in range(b):
            start = i * img_size + int(lvl_offs[l])
            seg = rows4[start:start + hl * wl].reshape(hl, wl, 4, c)
            d = seg[:, :, 0]
            d = d + jnp.pad(seg[:, :-1, 1], ((0, 0), (1, 0), (0, 0)))
            d = d + jnp.pad(seg[:-1, :, 2], ((1, 0), (0, 0), (0, 0)))
            d = d + jnp.pad(seg[:-1, :-1, 3], ((1, 0), (1, 0), (0, 0)))
            per_img.append(d)
        dfeats.append(jnp.stack(per_img).astype(f.dtype))
    return dfeats


def levels_pyramid_grad_feats(
    feats: Sequence[Array],
    rois: Array,            # (B, R, 4)
    strides: Sequence[int],
    gs: Sequence[Array],    # per level (B, R, out, out, C) cotangents
    w_pad: int,
    offsets: Sequence[int],
    img_rows: int,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 1,
):
    """Corner-folded d(loss)/d(feats) for `roi_align_levels_pyramid` (the
    BA extractor's every-roi-at-every-level alignment).

    Same fold as `roi_align_pyramid_batched_grad_feats`, but the pyramid
    buffer has ONE uniform row stride (`w_pad`), so the un-stagger is
    three global shifted adds on the flat buffer instead of per-plane
    slicing; per-level cotangents scatter into one shared accumulator.
    Level/image cross-bleed rows all carry frac=0 weight (mmcv border
    rule), so they add exact zeros into the neighbouring segment.
    """
    b, r = rois.shape[0], rois.shape[1]
    c = feats[0].shape[-1]
    oh = ow = out_size
    s = int(sampling_ratio) if sampling_ratio > 0 else int(max_samples)
    f32 = jnp.float32
    dtype = feats[0].dtype

    flat_rois = rois.reshape(-1, 4)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    n_flat = b * img_rows * w_pad + w_pad + 1  # slack absorbs 0-wt bleed
    rows4 = jnp.zeros((n_flat, 4 * c), dtype)

    for lvl, stride in enumerate(strides):
        h = float(feats[lvl].shape[-3])
        w = float(feats[lvl].shape[-2])
        (x_low, _, lx, hx, mx, x_in,
         y_low, _, ly, hy, my, y_in,
         grid_w, grid_h) = _sample_geometry(
            flat_rois,
            jnp.full((b * r,), 1.0 / stride, f32),
            jnp.full((b * r,), h, f32),
            jnp.full((b * r,), w, f32),
            out_size, sampling_ratio, max_samples)
        wy = jnp.stack([hy, ly], axis=-1) * (my & y_in)[..., None].astype(f32)
        wx = jnp.stack([hx, lx], axis=-1) * (mx & x_in)[..., None].astype(f32)
        count = jnp.maximum((grid_h * grid_w).astype(f32), 1.0)
        gg = (gs[lvl].reshape(-1, oh, ow, c).astype(f32)
              / count[:, None, None, None])
        w4 = (wy[:, :, None, :, None, :, None]
              * wx[:, None, :, None, :, None, :]).reshape(-1, oh, ow, s, s, 4)
        vals = (w4[..., None] * gg[:, :, :, None, None, None, :]).astype(dtype)
        base = (img_idx * img_rows + int(offsets[lvl])) * w_pad
        p00 = (base[:, None, None, None, None]
               + y_low[:, :, None, :, None] * w_pad
               + x_low[:, None, :, None, :])
        rows4 = rows4.at[p00.reshape(-1)].add(vals.reshape(-1, 4 * c))

    # global un-stagger (uniform stride w_pad)
    d = rows4[:, :c]
    d = d + jnp.pad(rows4[:-1, c:2 * c], ((1, 0), (0, 0)))
    d = d + jnp.pad(rows4[:-w_pad, 2 * c:3 * c], ((w_pad, 0), (0, 0)))
    d = d + jnp.pad(rows4[:-w_pad - 1, 3 * c:], ((w_pad + 1, 0), (0, 0)))
    d = d[:b * img_rows * w_pad].reshape(b, img_rows, w_pad, c)

    dfeats = []
    for lvl, f in enumerate(feats):
        hl, wl = int(f.shape[-3]), int(f.shape[-2])
        off = int(offsets[lvl])
        dfeats.append(d[:, off:off + hl, :wl, :].astype(f.dtype))
    return dfeats


# kept as a cross-check implementation for tests (4x the gather traffic)
def roi_align_multilevel(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
) -> Array:
    """Dense-per-level variant of :func:`roi_align_pyramid`."""
    outs = []
    for lvl, (f, stride) in enumerate(zip(feats, strides)):
        aligned = roi_align(
            f,
            rois,
            spatial_scale=1.0 / stride,
            out_size=out_size,
            sampling_ratio=sampling_ratio,
            max_samples=max_samples,
        )
        outs.append(aligned)
    stacked = jnp.stack(outs, axis=0)  # (L, R, oh, ow, C)
    sel = jax.nn.one_hot(target_lvls, len(feats), dtype=stacked.dtype)  # (R, L)
    return jnp.einsum("lrhwc,rl->rhwc", stacked, sel)
