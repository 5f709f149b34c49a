"""Pallas TPU kernel for level-dispatched RoIAlign.

Replaces the XLA row-gather formulation (ops/roi_align.py) on the
SingleRoIExtractor path. Why: XLA's gather sustains only ~136 GB/s on this
part and touches 4 corners x S^2 samples x 49 bins per roi (~1.6 MB of
redundant traffic per roi at S=4), while a roi's sampled footprint on its
mapped FPN level is a small window.

Design (v2 — built around pipeline DMA, since this platform's Mosaic AOT
compiler crashes on manual dynamic-start `make_async_copy`):

  * the FPN levels are row-concatenated into one (rows, W, C) "pyramid"
    array (widths zero-padded to a common W);
  * grid = one step per roi; the roi's window is fetched as 5 x 2 pipeline
    blocks of (8, 64, C) whose indices come from scalar-prefetched per-roi
    block coordinates (PrefetchScalarGridSpec) — a 40 x 128 px window
    around the roi;
  * bilinear sampling + adaptive average pooling collapse into two small
    matmuls with per-roi interpolation matrices built in-kernel:
        out[7, 7, C] = (A_y @ window) contracted with A_x,
        A[bin, p] = sum over the bin's live samples of tent(coord - p),
    the tent function being exactly mmcv's aligned bilinear weight with
    border clamping to [0, size-1] and out-of-image masking.

Rois whose sampled extent exceeds the window (elongated boxes — the FPN
mapping bounds sqrt(wh), not max(w,h)) are routed through the XLA-gather
pyramid path by `roi_align_fused` on a fixed-capacity sub-batch.

Exactness contract matches ops.roi_align.roi_align_pyramid (same
max_samples clamp); verified bit-close in tests (interpret mode + TPU).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

Y_STRIPS = 7          # 7 x 8 rows = 56-row window (covers y extent <= 46)
X_BLOCKS = 2          # 2 x 64 cols = 128-col window (covers x extent <= 62)
Y_BLOCK = 8
X_BLOCK = 64
WIN_H = Y_STRIPS * Y_BLOCK
WIN_W = X_BLOCKS * X_BLOCK
FALLBACK_CAP = 96     # oversized rois routed through the XLA-gather path

# test hook: run the REAL v4 Pallas kernel bodies under pl.pallas_call
# interpret mode on CPU instead of the jnp emulation branch (the emulation
# validates binning math; this validates the kernel body itself)
_FORCE_KERNEL_INTERPRET = False


def _interp_matrix(start, bin_size, grid, size, origin, p_dim, out_size, s_max):
    """(out_size, p_dim) summed bilinear tent weights for one axis."""
    f32 = jnp.float32
    shp = (out_size, s_max, p_dim)
    px = jax.lax.broadcasted_iota(jnp.int32, shp, 0).astype(f32)
    ix = jax.lax.broadcasted_iota(jnp.int32, shp, 1).astype(f32)
    pp = jax.lax.broadcasted_iota(jnp.int32, shp, 2).astype(f32)

    g = jnp.maximum(grid.astype(f32), 1.0)
    coord = start + (px + (ix + 0.5) / g) * bin_size
    live = ix < grid.astype(f32)
    inside = (coord >= -1.0) & (coord <= size)
    cc = jnp.clip(coord, 0.0, size - 1.0)
    rel = cc - origin.astype(f32)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(rel - pp))
    tent = tent * (live & inside).astype(f32)
    return jnp.sum(tent, axis=1)  # (out_size, p_dim)


def _window_sort_order(feats, rois, strides, target_lvls):
    """Sort key = (yblk, xblk) of each roi's window — maximizes consecutive
    block reuse in the pipeline."""
    f32 = jnp.float32
    scales = jnp.asarray([1.0 / s for s in strides], f32)[target_lvls]
    start_h = rois[:, 1].astype(f32) * scales - 0.5
    start_w = rois[:, 0].astype(f32) * scales - 0.5
    hs = jnp.asarray([float(f.shape[0]) for f in feats], f32)[target_lvls]
    ws = jnp.asarray([float(f.shape[1]) for f in feats], f32)[target_lvls]
    offs = np.concatenate([[0], np.cumsum([int(f.shape[0]) for f in feats])])[:-1]
    row_off = jnp.asarray(offs.astype(np.float32))[target_lvls]
    y_lo = jnp.clip(jnp.floor(jnp.maximum(start_h, 0.0)), 0.0, jnp.maximum(hs - 1, 0.0))
    x_lo = jnp.clip(jnp.floor(jnp.maximum(start_w, 0.0)), 0.0, jnp.maximum(ws - 1, 0.0))
    yblk = jnp.floor((row_off + y_lo) / Y_BLOCK)
    xblk = jnp.floor(x_lo / X_BLOCK)
    key = yblk * 1024.0 + xblk
    return jnp.argsort(key)


def _build_pyramid(feats, win_h=None, win_w=None, x_block=None, y_block=None):
    """Dispatcher: Pallas copy-kernel build on TPU (no XLA pad/concat
    touching the level tensors — see _build_pyramid_pallas), XLA build on
    CPU or with HTD_XLA_PYRAMID=1 / HTD_V4_XLA_PYRAMID=1."""
    win_h = WIN_H if win_h is None else win_h
    win_w = WIN_W if win_w is None else win_w
    x_block = X_BLOCK if x_block is None else x_block
    y_block = Y_BLOCK if y_block is None else y_block
    use_pallas = (
        jax.default_backend() != "cpu"
        and os.environ.get("HTD_XLA_PYRAMID", "0") != "1"
        and os.environ.get("HTD_V4_XLA_PYRAMID", "0") != "1"
    )
    if use_pallas:
        return _build_pyramid_pallas(feats, win_h, win_w, x_block, y_block)
    return _build_pyramid_xla(feats, win_h, win_w, x_block, y_block)


def _build_pyramid_xla(feats, win_h=None, win_w=None, x_block=None, y_block=None):
    """Row-concatenate levels into (rows, W_pad, C); returns (pyr, offsets).

    Levels may be single-image (H, W, C) or batched (B, H, W, C); batched
    levels are laid out image-major / level-minor and `offsets` are the
    per-level row offsets WITHIN one image's segment (callers add
    img_idx * img_rows, the third return value's `rows` per image).
    """
    win_h = WIN_H if win_h is None else win_h
    win_w = WIN_W if win_w is None else win_w
    x_block = X_BLOCK if x_block is None else x_block
    y_block = Y_BLOCK if y_block is None else y_block
    batched = feats[0].ndim == 4
    c = feats[0].shape[-1]
    w_pad = max(win_w + x_block, max(int(f.shape[-2]) for f in feats))
    w_pad = (w_pad + x_block - 1) // x_block * x_block
    parts = []
    offsets = [0]
    for f in feats:
        h, w = int(f.shape[-3]), int(f.shape[-2])
        pad = ((0, 0), (0, w_pad - w), (0, 0))
        if batched:
            pad = ((0, 0),) + pad
        parts.append(jnp.pad(f, pad))
        offsets.append(offsets[-1] + h)
    img_rows = offsets[-1]
    if batched:
        b = int(feats[0].shape[0])
        pyr = jnp.concatenate(parts, axis=1)  # (B, img_rows, w_pad, C)
        pyr = pyr.reshape(b * img_rows, w_pad, c)
        rows = b * img_rows
    else:
        pyr = jnp.concatenate(parts, axis=0)
        rows = img_rows
    rows_pad = (rows + win_h + y_block - 1) // y_block * y_block
    pyr = jnp.pad(pyr, ((0, rows_pad - rows), (0, 0), (0, 0)))
    return pyr, offsets[:-1], w_pad, rows_pad, img_rows


def _build_pyramid_xmajor(feats, win_h, win_w, x_block, y_block):
    """X-major pyramid (w_pad, rows_pad, C): same row semantics as
    `swapaxes(_build_pyramid(...), 0, 1)` but built from per-LEVEL
    transposes.

    Rationale (profiled): the row-major concat chain of `_build_pyramid`
    back-propagates a slow layout into the producing FPN convs during XLA
    layout assignment (P2 3x3 conv 0.38 -> 2.66 ms in-program), and
    `optimization_barrier` does not stop layout negotiation. TPU conv
    outputs natively prefer an H-minor ({3,1,2,0}) layout, so per-level
    (H,W)->(W,H) transposes are near-free relayouts and the concat then
    happens in the layout everything already has.
    """
    batched = feats[0].ndim == 4
    c = feats[0].shape[-1]
    w_pad = max(win_w + x_block, max(int(f.shape[-2]) for f in feats))
    w_pad = (w_pad + x_block - 1) // x_block * x_block
    parts = []
    offsets = [0]
    for f in feats:
        h, w = int(f.shape[-3]), int(f.shape[-2])
        ft = jnp.swapaxes(f, -3, -2)  # (..., W, H, C)
        pad = ((0, w_pad - w), (0, 0), (0, 0))
        if batched:
            pad = ((0, 0),) + pad
        parts.append(jnp.pad(ft, pad))
        offsets.append(offsets[-1] + h)
    img_rows = offsets[-1]
    pyr = jnp.concatenate(parts, axis=-2)  # (..., w_pad, img_rows, C)
    if batched:
        b = int(feats[0].shape[0])
        pyr = jnp.swapaxes(pyr, 0, 1).reshape(w_pad, b * img_rows, c)
        rows = b * img_rows
    else:
        rows = img_rows
    rows_pad = (rows + win_h + y_block - 1) // y_block * y_block
    pyr = jnp.pad(pyr, ((0, 0), (0, rows_pad - rows), (0, 0)))
    return pyr, offsets[:-1], w_pad, rows_pad, img_rows


def _pyr_write_level(pyr, lvl, row_off, img_rows, interpret=False):
    """Copy one (B, H, W, C) level into its rows of the (rows_pad, w_pad, C)
    pyramid buffer via an io-aliased Pallas kernel (in-place in HBM).

    Image i's block lands at row i*img_rows + row_off; columns beyond W and
    rows never visited keep the buffer's prior contents (the zeros init).
    """
    b, h, w, c = (int(s) for s in lvl.shape)
    rows_pad, w_pad, _ = (int(s) for s in pyr.shape)
    stripe = 8
    # scoped-VMEM budget: (old + dst + src) blocks, double-buffered by the
    # pipeline — stripe=8 at f32/w_pad~480/C=256 allocates 20.25M > the 16M
    # scoped limit (caught by tools/train_smoke.py on-chip, f32 train path)
    itemsize = jnp.dtype(pyr.dtype).itemsize
    while stripe > 1 and 2 * itemsize * stripe * c * (2 * w_pad + w) > 14 * 2**20:
        stripe //= 2
    while stripe > 1 and (h % stripe or row_off % stripe or img_rows % stripe):
        stripe //= 2

    def kernel(old_ref, src_ref, dst_ref):
        del old_ref  # only present to alias the output buffer
        x = src_ref[0]
        dst_ref[...] = jnp.pad(x, ((0, 0), (0, w_pad - w), (0, 0)))

    out_map = lambda bi, i: ((bi * img_rows + row_off) // stripe + i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(b, h // stripe),
        in_specs=[
            pl.BlockSpec((stripe, w_pad, c), out_map),
            pl.BlockSpec((1, stripe, w, c), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((stripe, w_pad, c), out_map),
        out_shape=jax.ShapeDtypeStruct(pyr.shape, pyr.dtype),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(pyr, lvl)


def _build_pyramid_pallas(feats, win_h, win_w, x_block, y_block,
                          interpret=False):
    """`_build_pyramid` semantics (image-major/level-minor rows, zero pads)
    built WITHOUT any XLA pad/concat touching the level tensors: a zeroed
    pyramid buffer plus one io-aliased Pallas copy kernel per level.

    Why: XLA layout assignment propagates the row-major concat's preferred
    layout back into the producing FPN convolutions (P2 3x3 conv
    0.38 -> 2.69 ms in the 2026-08-17 xplane trace), and neither
    `optimization_barrier` nor per-level pre-transposes
    (`_build_pyramid_xmajor`) stop the negotiation. A Pallas custom call
    pins row-major layouts at ITS boundary only, so the convs keep their
    native layouts and XLA inserts one cheap relayout copy per level.
    Copy cost is DMA-bound: ~90 MB of traffic at 768x1344 ≈ 0.1 ms.

    Differentiable: the VJP is the exact inverse slicing (each level's
    cotangent is its row/column window of the pyramid cotangent), so
    consumers like the BA extractor's pyramid-backed gathers can autodiff
    straight through the Pallas build.
    """
    batched = feats[0].ndim == 4
    c = int(feats[0].shape[-1])
    w_pad = max(win_w + x_block, max(int(f.shape[-2]) for f in feats))
    w_pad = (w_pad + x_block - 1) // x_block * x_block
    offsets = [0]
    for f in feats:
        offsets.append(offsets[-1] + int(f.shape[-3]))
    img_rows = offsets[-1]
    b = int(feats[0].shape[0]) if batched else 1
    rows = b * img_rows
    rows_pad = (rows + win_h + y_block - 1) // y_block * y_block
    pyr = _pyr_build_vjp(
        tuple(feats), tuple(offsets[:-1]), img_rows, rows_pad, w_pad,
        batched, interpret,
    )
    return pyr, offsets[:-1], w_pad, rows_pad, img_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _pyr_build_vjp(feats, row_offs, img_rows, rows_pad, w_pad, batched,
                   interpret):
    c = int(feats[0].shape[-1])
    pyr = jnp.zeros((rows_pad, w_pad, c), feats[0].dtype)
    for f, row_off in zip(feats, row_offs):
        if not batched:
            f = f[None]
        pyr = _pyr_write_level(pyr, f, row_off, img_rows,
                               interpret=interpret)
    return pyr


def _pyr_build_fwd(feats, row_offs, img_rows, rows_pad, w_pad, batched,
                   interpret):
    shapes = tuple(tuple(int(s) for s in f.shape) for f in feats)
    return (
        _pyr_build_vjp(feats, row_offs, img_rows, rows_pad, w_pad, batched,
                       interpret),
        shapes,
    )


def _pyr_build_bwd(row_offs, img_rows, rows_pad, w_pad, batched, interpret,
                   shapes, g):
    b = shapes[0][0] if batched else 1
    c = g.shape[-1]
    g3 = g[: b * img_rows].reshape(b, img_rows, w_pad, c)
    grads = []
    for shape, off in zip(shapes, row_offs):
        h, w = (shape[-3], shape[-2])
        gl = g3[:, off:off + h, :w, :]
        grads.append(gl if batched else gl[0])
    return (tuple(grads),)


_pyr_build_vjp.defvjp(_pyr_build_fwd, _pyr_build_bwd)


def _v4_pyramid(feats, interpret=False):
    """The pyramid used by BOTH roi_align_pallas_v4 and the fused-batched
    fallback gather — one function so the two builds are identical jaxprs
    and XLA CSEs them into a single buffer.

    Returns `(pyr, offsets, w_pad, rows_pad, img_rows)` with `pyr`
    row-major `(rows_pad, w_pad, C)`.
    """
    max_w = max(int(f.shape[-2]) for f in feats)
    w_pad_target = ((max_w - 1) // V4_X_BLOCK + 2) * V4_X_BLOCK
    win_w = w_pad_target - V4_X_BLOCK
    del interpret  # dispatch (Pallas on TPU, XLA on CPU) is inside
    return _build_pyramid(feats, V4_RES_H, win_w, V4_X_BLOCK, V4_Y_STRIPE)


def roi_align_levels_pyramid(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    out_size: int,
    sampling_ratio: int,
    max_samples: int,
):
    """Batched RoIAlign of EVERY roi at EVERY level (the BA/Adpt extractor
    pattern, reference adaptative_roi_extractor.py:49-66), gathering from
    the shared v4 pyramid buffer.

    feats: per-level (B, H, W, C); rois (B, R, 4). Returns a list of L
    arrays (B, R, out, out, C). Bit-identical to per-level flat gathers
    (the padded pyramid columns/rows are never sampled: the core clamps to
    the level's true (H, W)); exists so conv outputs have NO direct
    reshape/gather consumers — the only consumers are Pallas custom calls
    (pyramid builder, upsample) and other convs, which ends the layout
    negotiation on every front. The build CSEs with the fused extraction
    kernel's pyramid; gradients flow through the builder's custom VJP.
    """
    from htd_tpu.ops import roi_align as _ra

    # Training backward: the autodiff VJP of the gather core scatters
    # per-sample-corner rows into the pyramid; the corner-folded custom
    # backward cuts the rows 4x but stages a pyramid-sized 4C buffer.
    # On-chip A/B (2026-08-20): at the BA extractor's S=1 the scatter is
    # only ~4 ms/step and the staggered buffer traffic LOSES (train b2
    # 11.15 vs 11.47 img/s), so the fold defaults on only for S >= 2
    # (where row count, not bytes, dominates). HTD_BA_BWD=fold|vjp forces.
    s_eff = sampling_ratio if sampling_ratio > 0 else max_samples
    ba_bwd = os.environ.get("HTD_BA_BWD", "auto")
    if ba_bwd == "auto":
        ba_bwd = "fold" if s_eff >= 2 else "vjp"
    if ba_bwd == "fold":
        fn = _trainable_levels_pyramid(
            tuple(strides), out_size, sampling_ratio, max_samples
        )
        return list(fn(tuple(feats), rois))
    return _levels_pyramid_impl(
        feats, rois, strides, out_size, sampling_ratio, max_samples
    )


def _levels_pyramid_impl(feats, rois, strides, out_size, sampling_ratio,
                         max_samples):
    from htd_tpu.ops import roi_align as _ra

    b, r = int(rois.shape[0]), int(rois.shape[1])
    c = int(feats[0].shape[-1])
    pyr, offsets, w_pad, rows_pad, img_rows = _v4_pyramid(list(feats))
    flat_buf = pyr.reshape(-1, c)
    # quad-concat gather: one 4C-wide row per sample instead of 4 C-wide
    # corner rows (see quad_concat_flat and _roi_align_core(quad=True) in
    # ops/roi_align.py). The isolated-gather microbenchmark suggested ~4x,
    # but the end-to-end on-chip A/B REGRESSED ~1 ms on R-50 (49.55 vs
    # 48.56 ms/img, 2026-08-18) — the quad-concat build itself costs more
    # than the gather saves in-program. Opt-in: HTD_QUAD_BA=1.
    quad = os.environ.get("HTD_QUAD_BA", "0") == "1"
    if quad:
        flat_buf = _ra.quad_concat_flat(flat_buf, w_pad)
    flat_rois = rois.reshape(b * r, 4).astype(jnp.float32)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    row_stride = jnp.full((b * r,), w_pad, jnp.float32)
    outs = []
    for lvl, stride in enumerate(strides):
        h = float(feats[lvl].shape[-3])
        w = float(feats[lvl].shape[-2])
        row_offset = (img_idx * img_rows + offsets[lvl]) * w_pad
        sub = _ra._roi_align_core(
            flat_buf,
            flat_rois,
            scale=jnp.full((b * r,), 1.0 / stride, jnp.float32),
            fh=jnp.full((b * r,), h, jnp.float32),
            fw=jnp.full((b * r,), w, jnp.float32),
            row_offset=row_offset,
            out_size=out_size,
            sampling_ratio=sampling_ratio,
            max_samples=max_samples,
            row_stride=row_stride,
            quad=quad,
        )
        outs.append(sub.reshape(b, r, out_size, out_size, c))
    return outs


@functools.lru_cache(maxsize=None)
def _trainable_levels_pyramid(strides, out_size, sampling_ratio, max_samples):
    """custom_vjp: gather forward, corner-folded scatter backward
    (levels_pyramid_grad_feats). Gradients flow into features only."""
    from htd_tpu.ops.roi_align import levels_pyramid_grad_feats

    @jax.custom_vjp
    def fn(feats, rois):
        return tuple(_levels_pyramid_impl(
            list(feats), rois, strides, out_size, sampling_ratio,
            max_samples))

    def fwd(feats, rois):
        return fn(feats, rois), (feats, rois)

    def bwd(res, gs):
        feats, rois = res
        # pyramid layout metadata (must match _v4_pyramid / _build_pyramid)
        max_w = max(int(f.shape[-2]) for f in feats)
        w_pad = ((max_w - 1) // V4_X_BLOCK + 2) * V4_X_BLOCK
        offsets = [0]
        for f in feats:
            offsets.append(offsets[-1] + int(f.shape[-3]))
        img_rows = offsets[-1]
        dfeats = levels_pyramid_grad_feats(
            list(feats), rois, strides, list(gs), w_pad, offsets[:-1],
            img_rows, out_size=out_size, sampling_ratio=sampling_ratio,
            max_samples=max_samples,
        )
        return tuple(dfeats), None

    fn.defvjp(fwd, bwd)
    return fn


def roi_align_pallas(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
    interpret: bool = False,
    sort_rois: bool = True,
) -> Array:
    """Level-dispatched RoIAlign over a 56x128 px window per roi.

    Same contract as roi_align_pyramid for rois whose sampled extent fits
    the window (y extent <= 46, x extent <= 62 px at the mapped level —
    always true for non-elongated level-mapped rois); use roi_align_fused
    for automatic fallback on the rest.

    sort_rois: process rois in window-block order so the pipeline's
    revolving buffers skip re-fetching identical consecutive blocks
    (rois cluster heavily on the fine levels); results are scattered back
    to the input order.
    """
    if sort_rois:
        order = _window_sort_order(feats, rois, strides, target_lvls)
        out = roi_align_pallas(
            [f for f in feats],
            rois[order],
            strides,
            target_lvls[order],
            out_size=out_size,
            sampling_ratio=sampling_ratio,
            max_samples=max_samples,
            interpret=interpret,
            sort_rois=False,
        )
        inv = jnp.argsort(order)
        return out[inv]
    c = feats[0].shape[-1]
    r = rois.shape[0]
    f32 = jnp.float32
    num_levels = len(feats)

    pyr, offsets, w_pad, rows_pad, _ = _build_pyramid(feats)

    scales = jnp.asarray([1.0 / s for s in strides], f32)[target_lvls]
    rois = rois.astype(f32)
    start_w = rois[:, 0] * scales - 0.5
    start_h = rois[:, 1] * scales - 0.5
    bin_w = (rois[:, 2] - rois[:, 0]) * scales / out_size
    bin_h = (rois[:, 3] - rois[:, 1]) * scales / out_size
    if sampling_ratio > 0:
        s_max = sampling_ratio
        grid_w = jnp.full((r,), sampling_ratio, f32)
        grid_h = jnp.full((r,), sampling_ratio, f32)
    else:
        s_max = max_samples
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, s_max)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, s_max)

    hs = jnp.asarray([float(f.shape[0]) for f in feats], f32)[target_lvls]
    ws = jnp.asarray([float(f.shape[1]) for f in feats], f32)[target_lvls]
    row_off = jnp.asarray(np.asarray(offsets, np.float32))[target_lvls]

    # window origin (absolute pyramid coords), block-quantized
    y_lo = jnp.clip(jnp.floor(jnp.maximum(start_h, 0.0)), 0.0, jnp.maximum(hs - 1, 0.0))
    x_lo = jnp.clip(jnp.floor(jnp.maximum(start_w, 0.0)), 0.0, jnp.maximum(ws - 1, 0.0))
    abs_y = row_off + y_lo
    yblk = jnp.clip(
        jnp.floor(abs_y / Y_BLOCK), 0.0, (rows_pad - WIN_H) / Y_BLOCK
    ).astype(jnp.int32)
    xblk = jnp.clip(
        jnp.floor(x_lo / X_BLOCK), 0.0, (w_pad - WIN_W) / X_BLOCK
    ).astype(jnp.int32)

    if interpret:
        # interpret mode doesn't support scalar-prefetch grids; emulate the
        # kernel math (same window + tent-matrix formulation) in pure jnp
        def one(yb, xb, st_h, st_w, b_h, b_w, g_h, g_w, s_h, s_w, ro):
            y_origin = yb.astype(f32) * Y_BLOCK
            x_origin = xb.astype(f32) * X_BLOCK
            win = jax.lax.dynamic_slice(
                pyr,
                (yb * Y_BLOCK, xb * X_BLOCK, 0),
                (WIN_H, WIN_W, c),
            )
            ay = _interp_matrix(st_h, b_h, g_h, s_h, y_origin - ro, WIN_H, out_size, s_max)
            ax = _interp_matrix(st_w, b_w, g_w, s_w, x_origin, WIN_W, out_size, s_max)
            count = jnp.maximum(g_h * g_w, 1.0)
            wf = win.reshape(WIN_H, WIN_W * c).astype(f32)
            tmp = jnp.dot(ay, wf).reshape(out_size, WIN_W, c)
            out = jnp.einsum("xp,ypc->yxc", ax, tmp) / count
            return out.astype(feats[0].dtype)

        return jax.lax.map(
            lambda t: one(*t),
            (yblk, xblk, start_h, start_w, bin_h, bin_w,
             grid_h, grid_w, hs, ws, row_off),
        )

    params = jnp.stack(
        [start_h, start_w, bin_h, bin_w, grid_h, grid_w, hs, ws, row_off],
        axis=1,
    )  # (R, 9) -> (R, 1, 128) for SMEM block tiling
    params = jnp.pad(params, ((0, 0), (0, 128 - params.shape[1])))[:, None, :]

    def kernel(yblk_ref, xblk_ref, params_ref, *refs):
        del yblk_ref, xblk_ref
        blocks = refs[: Y_STRIPS * X_BLOCKS]
        out_ref = refs[Y_STRIPS * X_BLOCKS]

        sth = params_ref[0, 0, 0]
        stw = params_ref[0, 0, 1]
        bh = params_ref[0, 0, 2]
        bw = params_ref[0, 0, 3]
        gh = params_ref[0, 0, 4]
        gw = params_ref[0, 0, 5]
        size_h = params_ref[0, 0, 6]
        size_w = params_ref[0, 0, 7]
        roff = params_ref[0, 0, 8]
        y_origin = params_ref[0, 0, 9]   # filled below via params2
        x_origin = params_ref[0, 0, 10]

        # assemble the (WIN_H, WIN_W, C) window from pipeline blocks
        rows = []
        for ky in range(Y_STRIPS):
            cols = [blocks[ky * X_BLOCKS + kx][:] for kx in range(X_BLOCKS)]
            rows.append(jnp.concatenate(cols, axis=1))
        win = jnp.concatenate(rows, axis=0)  # (WIN_H, WIN_W, C)

        # tents: computed in LEVEL coords (border clamping needs them); the
        # window origin in level coords is (y_origin - roff), which may be
        # negative when the 8-row quantization reaches into the previous
        # level's rows — those rows then get zero tent weight by construction
        ay = _interp_matrix(
            sth, bh, gh, size_h, y_origin - roff, WIN_H, out_size, s_max
        )
        ax = _interp_matrix(
            stw, bw, gw, size_w, x_origin, WIN_W, out_size, s_max
        )
        count = jnp.maximum(gh * gw, 1.0)

        wf = win.reshape(WIN_H, WIN_W * c).astype(jnp.float32)
        tmp = jnp.dot(ay, wf, preferred_element_type=jnp.float32)
        tmp = tmp.reshape(out_size, WIN_W, c)
        out = jax.lax.dot_general(
            ax, tmp,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (7_x, 7_y, C)
        out = jnp.swapaxes(out, 0, 1) / count
        out_ref[0] = out.astype(out_ref.dtype)

    # stash origins in the params row (slots 9, 10)
    params = params.at[:, 0, 9].set(yblk.astype(f32) * Y_BLOCK)
    params = params.at[:, 0, 10].set(xblk.astype(f32) * X_BLOCK)

    block_specs = []
    for ky in range(Y_STRIPS):
        for kx in range(X_BLOCKS):
            block_specs.append(
                pl.BlockSpec(
                    (Y_BLOCK, X_BLOCK, c),
                    functools.partial(
                        lambda i, yb, xb, ky, kx: (yb[i] + ky, xb[i] + kx, 0),
                        ky=ky, kx=kx,
                    ),
                    memory_space=pltpu.VMEM,
                )
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, yb, xb: (i, 0, 0), memory_space=pltpu.SMEM)
        ]
        + block_specs,
        out_specs=pl.BlockSpec(
            (1, out_size, out_size, c),
            lambda i, yb, xb: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, out_size, out_size, c), feats[0].dtype),
        interpret=interpret,
    )(yblk, xblk, params, *([pyr] * (Y_STRIPS * X_BLOCKS)))


def roi_align_pallas_v3(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
    interpret: bool = False,
    sort_rois: bool = True,
    y_block: int = 16,
    n_y: int = 4,
    x_block: int = 64,
    n_x: int = 2,
    pack: int = 2,
    img_idx: "Array | None" = None,
) -> Array:
    """v3 window kernel: multi-roi grid steps + strip accumulation.

    Differences vs `roi_align_pallas` (v2), both addressing measured limits:
      * `pack` rois per grid step — the v2 kernel was grid-step-overhead
        bound (~8 us/roi, PERF.md); packing halves/quarters the step count.
      * the (WIN_H, WIN_W, C) window is never materialized: each (ky, kx)
        pipeline block is contracted against its slice of the interpolation
        matrices and accumulated — scoped VMEM stays small enough for f32
        (v2 exceeded the 16 MB scoped limit in f32 and could not compile).
      * block geometry is caller-chosen (production uses V3_GEOM's 64x128
        window — 4x2 blocks of (16, 64); 64x96 was measured slower, see
        V3_GEOM's comment); coverage is y extent <= win_h - y_block - 2,
        x extent <= win_w - x_block - 2 (same fallback contract as v2,
        handled by roi_align_fused).
      * optional batching: levels may be (B, H, W, C) with `img_idx` (R,)
        giving each roi's image — one pyramid, one grid over all images'
        rois (vmap-free; the whole-batch roi population shares the grid).

    Spec-count budget: pack * n_y * n_x + 2 <= ~20 (platform Mosaic limit).
    """
    win_h, win_w = n_y * y_block, n_x * x_block
    c = feats[0].shape[-1]
    r = rois.shape[0]
    f32 = jnp.float32
    r_pad = (r + pack - 1) // pack * pack
    grid = r_pad // pack

    pyr, offsets, w_pad, rows_pad, img_rows = _build_pyramid(
        feats, win_h, win_w, x_block, y_block
    )

    scales = jnp.asarray([1.0 / s for s in strides], f32)[target_lvls]
    rois = rois.astype(f32)
    start_w = rois[:, 0] * scales - 0.5
    start_h = rois[:, 1] * scales - 0.5
    bin_w = (rois[:, 2] - rois[:, 0]) * scales / out_size
    bin_h = (rois[:, 3] - rois[:, 1]) * scales / out_size
    if sampling_ratio > 0:
        s_max = sampling_ratio
        grid_w = jnp.full((r,), sampling_ratio, f32)
        grid_h = jnp.full((r,), sampling_ratio, f32)
    else:
        s_max = max_samples
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, s_max)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, s_max)

    hs = jnp.asarray([float(f.shape[-3]) for f in feats], f32)[target_lvls]
    ws = jnp.asarray([float(f.shape[-2]) for f in feats], f32)[target_lvls]
    row_off = jnp.asarray(np.asarray(offsets, np.float32))[target_lvls]
    if img_idx is not None:
        row_off = row_off + img_idx.astype(f32) * float(img_rows)

    y_lo = jnp.clip(jnp.floor(jnp.maximum(start_h, 0.0)), 0.0, jnp.maximum(hs - 1, 0.0))
    x_lo = jnp.clip(jnp.floor(jnp.maximum(start_w, 0.0)), 0.0, jnp.maximum(ws - 1, 0.0))
    yblk = jnp.clip(
        jnp.floor((row_off + y_lo) / y_block), 0.0, (rows_pad - win_h) / y_block
    ).astype(jnp.int32)
    xblk = jnp.clip(
        jnp.floor(x_lo / x_block), 0.0, (w_pad - win_w) / x_block
    ).astype(jnp.int32)

    if sort_rois:
        # window-block-sorted processing lets the pipeline's revolving
        # buffers skip re-fetching identical consecutive blocks; results
        # are scattered back to input order at the end
        order = jnp.argsort(yblk * 1024 + xblk)
        inv = jnp.argsort(order)
        (start_h, start_w, bin_h, bin_w, grid_h, grid_w, hs, ws, row_off,
         yblk, xblk) = (
            a[order] for a in (start_h, start_w, bin_h, bin_w, grid_h,
                               grid_w, hs, ws, row_off, yblk, xblk)
        )
    else:
        inv = None

    params = jnp.stack(
        [start_h, start_w, bin_h, bin_w, grid_h, grid_w, hs, ws, row_off,
         yblk.astype(f32) * y_block, xblk.astype(f32) * x_block],
        axis=1,
    )  # (R, 11)
    params = jnp.pad(params, ((0, r_pad - r), (0, 128 - params.shape[1])))
    # (grid, pack, 128) so the SMEM block (1, pack, 128) EQUALS the trailing
    # dims — the Mosaic tiling rule requires the last two block dims to be
    # (8k, 128m) or equal to the array's dims
    params = params.reshape(grid, pack, 128)
    yblk = jnp.pad(yblk, (0, r_pad - r))
    xblk = jnp.pad(xblk, (0, r_pad - r))

    if interpret:
        # jnp emulation (interpret mode lacks scalar-prefetch support)
        def one(yb, xb, st_h, st_w, b_h, b_w, g_h, g_w, s_h, s_w, ro):
            win = jax.lax.dynamic_slice(
                pyr, (yb * y_block, xb * x_block, 0), (win_h, win_w, c)
            )
            ay = _interp_matrix(
                st_h, b_h, g_h, s_h,
                yb.astype(f32) * y_block - ro, win_h, out_size, s_max)
            ax = _interp_matrix(
                st_w, b_w, g_w, s_w,
                xb.astype(f32) * x_block, win_w, out_size, s_max)
            count = jnp.maximum(g_h * g_w, 1.0)
            wf = win.reshape(win_h, win_w * c).astype(f32)
            tmp = jnp.dot(ay, wf).reshape(out_size, win_w, c)
            out = jnp.einsum("xp,ypc->yxc", ax, tmp) / count
            return out.astype(feats[0].dtype)

        out = jax.lax.map(
            lambda t: one(*t),
            (yblk[:r], xblk[:r], start_h, start_w, bin_h, bin_w,
             grid_h, grid_w, hs, ws, row_off),
        )
        return out if inv is None else out[inv]

    def kernel(yblk_ref, xblk_ref, params_ref, *refs):
        del yblk_ref, xblk_ref
        blocks = refs[: pack * n_y * n_x]
        out_ref = refs[pack * n_y * n_x]
        for j in range(pack):
            sth = params_ref[0, j, 0]
            stw = params_ref[0, j, 1]
            bh = params_ref[0, j, 2]
            bw = params_ref[0, j, 3]
            gh = params_ref[0, j, 4]
            gw = params_ref[0, j, 5]
            size_h = params_ref[0, j, 6]
            size_w = params_ref[0, j, 7]
            roff = params_ref[0, j, 8]
            y_origin = params_ref[0, j, 9]
            x_origin = params_ref[0, j, 10]

            ay = _interp_matrix(
                sth, bh, gh, size_h, y_origin - roff, win_h, out_size, s_max)
            ax = _interp_matrix(
                stw, bw, gw, size_w, x_origin, win_w, out_size, s_max)
            count = jnp.maximum(gh * gw, 1.0)

            acc = jnp.zeros((out_size, out_size, c), f32)
            for kx in range(n_x):
                m = jnp.zeros((out_size, x_block * c), f32)
                for ky in range(n_y):
                    blk = blocks[(j * n_y + ky) * n_x + kx][:]
                    m = m + jnp.dot(
                        ay[:, ky * y_block:(ky + 1) * y_block],
                        blk.reshape(y_block, x_block * c).astype(f32),
                        preferred_element_type=f32,
                    )
                part = jax.lax.dot_general(
                    ax[:, kx * x_block:(kx + 1) * x_block],
                    m.reshape(out_size, x_block, c),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )  # (7_x, 7_y, C)
                acc = acc + jnp.swapaxes(part, 0, 1)
            out_ref[j] = (acc / count).astype(out_ref.dtype)

    block_specs = []
    for j in range(pack):
        for ky in range(n_y):
            for kx in range(n_x):
                block_specs.append(
                    pl.BlockSpec(
                        (y_block, x_block, c),
                        functools.partial(
                            lambda i, yb, xb, j, ky, kx: (
                                yb[i * pack + j] + ky, xb[i * pack + j] + kx, 0
                            ),
                            j=j, ky=ky, kx=kx,
                        ),
                        memory_space=pltpu.VMEM,
                    )
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, pack, 128), lambda i, yb, xb: (i, 0, 0),
                         memory_space=pltpu.SMEM)
        ]
        + block_specs,
        out_specs=pl.BlockSpec(
            (pack, out_size, out_size, c),
            lambda i, yb, xb: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (r_pad, out_size, out_size, c), feats[0].dtype
        ),
        # NOTE: no vmem_limit_bytes override — the reservation applies to
        # the whole executable and a 100 MB limit measured ~2.4x slowdown
        # of the SURROUNDING graph (backbone convs spilled; PERF.md r2).
        # The kernel's scoped VMEM is small: pack*n_y*n_x blocks of
        # (y_block, x_block, C) + the (pack, 7, 7, C) out block.
        interpret=interpret,
    )(yblk, xblk, params, *([pyr] * (pack * n_y * n_x)))
    out = out[:r]
    return out if inv is None else out[inv]


def adpt_align_pallas(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 2,
    interpret: bool = False,
    fallback_cap: int = 384,
    y_strips: int = 5,
    x_blocks: int = 2,
) -> Array:
    """EXPERIMENTAL — measured no-win for the BA extractor (kept for study).

    Every-roi-on-every-level alignment cannot be window-bounded: a large roi
    sampling a finer level intrinsically exceeds any fixed window, so the
    fallback volume (~20% of pairs at COCO distributions) cancels the
    kernel's gains (22.7 ms kernel + ~7 ms fallback vs 26-35 ms pure gather).
    The production path (models/roi_extract.AdptRoIExtractor) uses the XLA
    pyramid gather at S=2. See PERF.md.

    Every-roi-on-every-level RoIAlign (the BA/Adpt extractor's pattern).

    One grid step per roi fetches ALL levels' windows (L x Y_STRIPS x
    X_BLOCKS pipeline blocks) and emits (L, 7, 7, C) — replacing L separate
    gather passes. (roi, level) pairs whose extent exceeds the window
    (common when sampling a large roi on a finer level) are recomputed by
    the XLA pyramid gather on a fixed-capacity sub-batch and scattered in.

    Returns (R, L, 7, 7, C).
    """
    from htd_tpu.ops.roi_align import roi_align_pyramid

    Y_STRIPS, X_BLOCKS = y_strips, x_blocks  # noqa: N806 (shadow module consts)
    WIN_H, WIN_W = Y_STRIPS * Y_BLOCK, X_BLOCKS * X_BLOCK  # noqa: N806

    c = feats[0].shape[-1]
    r = rois.shape[0]
    L = len(feats)
    f32 = jnp.float32
    pyr, offsets, w_pad, rows_pad, _ = _build_pyramid(feats, WIN_H, WIN_W)

    rois = rois.astype(f32)
    if sampling_ratio > 0:
        s_max = sampling_ratio
    else:
        s_max = max_samples

    # per (roi, level) params
    scl = jnp.asarray([1.0 / s for s in strides], f32)  # (L,)
    start_w = rois[:, 0:1] * scl[None, :] - 0.5   # (R, L)
    start_h = rois[:, 1:2] * scl[None, :] - 0.5
    bin_w = (rois[:, 2:3] - rois[:, 0:1]) * scl[None, :] / out_size
    bin_h = (rois[:, 3:4] - rois[:, 1:2]) * scl[None, :] / out_size
    if sampling_ratio > 0:
        grid_w = jnp.full((r, L), sampling_ratio, f32)
        grid_h = jnp.full((r, L), sampling_ratio, f32)
    else:
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, s_max)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, s_max)
    hs = jnp.asarray([float(f.shape[0]) for f in feats], f32)[None, :]
    ws = jnp.asarray([float(f.shape[1]) for f in feats], f32)[None, :]
    row_off = jnp.asarray(
        np.asarray(offsets, np.float32)
    )[None, :]

    y_lo = jnp.clip(jnp.floor(jnp.maximum(start_h, 0.0)), 0.0, jnp.maximum(hs - 1, 0.0))
    x_lo = jnp.clip(jnp.floor(jnp.maximum(start_w, 0.0)), 0.0, jnp.maximum(ws - 1, 0.0))
    yblk = jnp.clip(
        jnp.floor((row_off + y_lo) / Y_BLOCK), 0.0, (rows_pad - WIN_H) / Y_BLOCK
    ).astype(jnp.int32)   # (R, L)
    xblk = jnp.clip(
        jnp.floor(x_lo / X_BLOCK), 0.0, (w_pad - WIN_W) / X_BLOCK
    ).astype(jnp.int32)

    # params row: per level 9 values, L*9 <= 128 for L <= 14
    per_level = jnp.stack(
        [start_h, start_w, bin_h, bin_w, grid_h, grid_w, hs * jnp.ones((r, L)),
         ws * jnp.ones((r, L)),
         (yblk.astype(f32) * Y_BLOCK) - row_off,  # window origin in level coords
         ],
        axis=2,
    )  # (R, L, 9)
    params = per_level.reshape(r, L * 9)
    params = jnp.concatenate(
        [params, xblk.astype(f32) * X_BLOCK], axis=1
    )  # (R, L*9 + L)
    params = jnp.pad(params, ((0, 0), (0, 128 - params.shape[1])))[:, None, :]

    def kernel(yblk_ref, xblk_ref, params_ref, *refs):
        del yblk_ref, xblk_ref
        blocks = refs[: L * Y_STRIPS * X_BLOCKS]
        out_ref = refs[L * Y_STRIPS * X_BLOCKS]
        for l in range(L):
            base = l * 9
            sth = params_ref[0, 0, base + 0]
            stw = params_ref[0, 0, base + 1]
            bh = params_ref[0, 0, base + 2]
            bw = params_ref[0, 0, base + 3]
            gh = params_ref[0, 0, base + 4]
            gw = params_ref[0, 0, base + 5]
            size_h = params_ref[0, 0, base + 6]
            size_w = params_ref[0, 0, base + 7]
            y_origin_lvl = params_ref[0, 0, base + 8]
            x_origin = params_ref[0, 0, L * 9 + l]

            rows = []
            for ky in range(Y_STRIPS):
                cols = [
                    blocks[(l * Y_STRIPS + ky) * X_BLOCKS + kx][:]
                    for kx in range(X_BLOCKS)
                ]
                rows.append(jnp.concatenate(cols, axis=1))
            win = jnp.concatenate(rows, axis=0)

            ay = _interp_matrix(sth, bh, gh, size_h, y_origin_lvl, WIN_H, out_size, s_max)
            ax = _interp_matrix(stw, bw, gw, size_w, x_origin, WIN_W, out_size, s_max)
            count = jnp.maximum(gh * gw, 1.0)
            wf = win.reshape(WIN_H, WIN_W * c).astype(f32)
            tmp = jnp.dot(ay, wf, preferred_element_type=f32)
            tmp = tmp.reshape(out_size, WIN_W, c)
            out = jax.lax.dot_general(
                ax, tmp,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
            out_ref[0, l] = (jnp.swapaxes(out, 0, 1) / count).astype(out_ref.dtype)

    block_specs = []
    for l in range(L):
        for ky in range(Y_STRIPS):
            for kx in range(X_BLOCKS):
                block_specs.append(
                    pl.BlockSpec(
                        (Y_BLOCK, X_BLOCK, c),
                        functools.partial(
                            lambda i, yb, xb, l, ky, kx: (
                                yb[i * L + l] + ky, xb[i * L + l] + kx, 0
                            ),
                            l=l, ky=ky, kx=kx,
                        ),
                        memory_space=pltpu.VMEM,
                    )
                )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, yb, xb: (i, 0, 0), memory_space=pltpu.SMEM)
        ]
        + block_specs,
        out_specs=pl.BlockSpec(
            (1, L, out_size, out_size, c),
            lambda i, yb, xb: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    if interpret:
        # jnp emulation (interpret mode lacks scalar-prefetch support)
        def one(t):
            (yb, xb, st_h, st_w, b_h, b_w, g_h, g_w, s_h, s_w, yo, xo) = t
            outs = []
            for l in range(L):
                win = jax.lax.dynamic_slice(
                    pyr, (yb[l] * Y_BLOCK, xb[l] * X_BLOCK, 0), (WIN_H, WIN_W, c)
                )
                ay = _interp_matrix(st_h[l], b_h[l], g_h[l], s_h[l], yo[l], WIN_H, out_size, s_max)
                ax = _interp_matrix(st_w[l], b_w[l], g_w[l], s_w[l], xo[l], WIN_W, out_size, s_max)
                count = jnp.maximum(g_h[l] * g_w[l], 1.0)
                wf = win.reshape(WIN_H, WIN_W * c).astype(f32)
                tmp = jnp.dot(ay, wf).reshape(out_size, WIN_W, c)
                o = jnp.einsum("xp,ypc->yxc", ax, tmp) / count
                outs.append(o.astype(feats[0].dtype))
            return jnp.stack(outs)

        out = jax.lax.map(
            one,
            (yblk, xblk, start_h, start_w, bin_h, bin_w, grid_h, grid_w,
             hs * jnp.ones((r, L)), ws * jnp.ones((r, L)),
             yblk.astype(f32) * Y_BLOCK - row_off, xblk.astype(f32) * X_BLOCK),
        )
    else:
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (r, L, out_size, out_size, c), feats[0].dtype
            ),
        )(yblk.reshape(-1), xblk.reshape(-1), params,
          *([pyr] * (L * Y_STRIPS * X_BLOCKS)))

    # fallback for (roi, level) pairs exceeding the window
    ext_w = (rois[:, 2:3] - rois[:, 0:1]) * scl[None, :]
    ext_h = (rois[:, 3:4] - rois[:, 1:2]) * scl[None, :]
    overflow = (ext_w + X_BLOCK + 2 > WIN_W) | (ext_h + Y_BLOCK + 2 > WIN_H)
    flat_overflow = overflow.reshape(-1)  # (R*L,)
    cap = min(fallback_cap, r * L)
    top, idx = jax.lax.top_k(jnp.where(flat_overflow, 1.0, 0.0), cap)
    sel_valid = top > 0.0
    roi_idx = idx // L
    lvl_idx = (idx % L).astype(jnp.int32)
    sub = roi_align_pyramid(
        feats, rois[roi_idx], strides, lvl_idx,
        out_size=out_size, sampling_ratio=sampling_ratio, max_samples=max_samples,
    )
    flat = out.reshape(r * L, out_size, out_size, c)
    patched = jnp.where(sel_valid[:, None, None, None], sub, flat[idx])
    flat = flat.at[idx].set(patched.astype(flat.dtype))
    return flat.reshape(r, L, out_size, out_size, c)


@functools.lru_cache(maxsize=None)
def _trainable_adpt(strides, out_size, sampling_ratio, max_samples, interpret):
    # NOTE: levels are aligned in 2-level groups (the platform's Mosaic
    # compiler handles ~20 pipeline block specs per kernel; 4 levels x 10
    # specs would exceed it)
    """custom_vjp: Pallas forward, per-level pyramid-gather backward."""
    from htd_tpu.ops.roi_align import roi_align_pyramid as pyramid

    L = len(strides)

    def ref_impl(feats, rois, r):
        outs = []
        for l in range(L):
            lv = jnp.full((r,), l, jnp.int32)
            outs.append(
                pyramid(
                    list(feats), rois, strides, lv,
                    out_size=out_size, sampling_ratio=sampling_ratio,
                    max_samples=max_samples,
                )
            )
        return jnp.stack(outs, axis=1)  # (R, L, 7, 7, C)

    @jax.custom_vjp
    def fn(feats, rois):
        outs = []
        for g in range(0, L, 2):
            outs.append(
                adpt_align_pallas(
                    list(feats[g : g + 2]), rois, strides[g : g + 2],
                    out_size=out_size, sampling_ratio=sampling_ratio,
                    max_samples=max_samples, interpret=interpret,
                )
            )
        return jnp.concatenate(outs, axis=1)

    def fwd(feats, rois):
        return fn(feats, rois), (feats, rois)

    def bwd(res, g):
        feats, rois = res
        r = rois.shape[0]
        _, vjp = jax.vjp(lambda fs: ref_impl(fs, rois, r), feats)
        (dfeats,) = vjp(g.astype(feats[0].dtype))
        return dfeats, None

    fn.defvjp(fwd, bwd)
    return fn


def adpt_align_trainable(
    feats, rois, strides, out_size=7, sampling_ratio=0, max_samples=2,
    interpret=False,
):
    """Differentiable (w.r.t. features) all-level aligner. (R, L, 7, 7, C)."""
    fn = _trainable_adpt(
        tuple(strides), out_size, sampling_ratio, max_samples, interpret
    )
    return fn(tuple(feats), rois)


# production v3 geometry: 64x128 px window of 4x2 (16, 64, C) blocks.
# On artificially clustered rois the 12-block 64x96 window benches faster
# (4.5 vs 5.7 ms — less traffic), but real NMS proposals are anti-clustered
# and the kernel is then per-block-DMA bound, where FEWER blocks win.
V3_GEOM = dict(y_block=16, n_y=4, x_block=64, n_x=2, pack=1)


def roi_align_fused(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
    interpret: bool = False,
    fallback_cap: int = FALLBACK_CAP,
) -> Array:
    """Pallas window kernel (v3 strip-accumulation) + XLA-gather fallback.

    The FPN mapping bounds sqrt(w*h), not max(w, h): elongated rois can
    exceed the window on one axis. Those (rare) rois are recomputed
    by roi_align_pyramid on a fixed-capacity sub-batch and scattered back;
    rois beyond `fallback_cap` keep the truncated-average window result.
    """
    from htd_tpu.ops.roi_align import roi_align_pyramid

    g = V3_GEOM
    win_h, win_w = g["n_y"] * g["y_block"], g["n_x"] * g["x_block"]
    r = rois.shape[0]
    f32 = jnp.float32
    scales = jnp.asarray([1.0 / s for s in strides], f32)[target_lvls]
    ext_w = (rois[:, 2] - rois[:, 0]).astype(f32) * scales
    ext_h = (rois[:, 3] - rois[:, 1]).astype(f32) * scales
    # window slack: origin starts at floor(start) quantized down by a block
    overflow = (ext_w + g["x_block"] + 2 > win_w) | (ext_h + g["y_block"] + 2 > win_h)

    out = roi_align_pallas_v3(
        feats, rois, strides, target_lvls,
        out_size=out_size, sampling_ratio=sampling_ratio,
        max_samples=max_samples, interpret=interpret, **g,
    )

    cap = min(fallback_cap, r)
    score = jnp.where(overflow, 1.0, 0.0)
    top, idx = jax.lax.top_k(score, cap)
    sel_valid = top > 0.0
    sub = roi_align_pyramid(
        feats, rois[idx], strides, target_lvls[idx],
        out_size=out_size, sampling_ratio=sampling_ratio,
        max_samples=max_samples,
    )
    patched = jnp.where(sel_valid[:, None, None, None], sub, out[idx])
    return out.at[idx].set(patched.astype(out.dtype))


def _interp_matrix_k(start, bin_size, grid, size, origin, p_dim, out_size,
                     s_max, valid):
    """(K, out_size, p_dim) summed bilinear tent weights for one axis.

    Vectorized-over-slots version of `_interp_matrix`: every param is (K,).
    Invalid slots produce all-zero rows.
    """
    f32 = jnp.float32
    k = start.shape[0]
    shp = (k, out_size, s_max, p_dim)
    px = jax.lax.broadcasted_iota(jnp.int32, shp, 1).astype(f32)
    ix = jax.lax.broadcasted_iota(jnp.int32, shp, 2).astype(f32)
    pp = jax.lax.broadcasted_iota(jnp.int32, shp, 3).astype(f32)

    def b(a):  # (K,) -> (K, 1, 1, 1)
        return a.astype(f32)[:, None, None, None]

    g = jnp.maximum(b(grid), 1.0)
    coord = b(start) + (px + (ix + 0.5) / g) * b(bin_size)
    live = ix < b(grid)
    inside = (coord >= -1.0) & (coord <= b(size))
    cc = jnp.clip(coord, 0.0, b(size) - 1.0)
    rel = cc - b(origin)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(rel - pp))
    tent = tent * (live & inside & b(valid).astype(bool)).astype(f32)
    return jnp.sum(tent, axis=2)  # (K, out_size, p_dim)


# v4 geometry: resident region of 5x2 (16, 96, C) blocks = (80, 192, C)
V4_Y_STRIPE = 16
V4_N_Y = 5
V4_X_BLOCK = 96
V4_N_X = 2
V4_RES_H = V4_Y_STRIPE * V4_N_Y   # 80
V4_RES_W = V4_X_BLOCK * V4_N_X    # 192


def _v4_call_packed(pyr_t, ay, ax, ybin_b, xbin_b, occ_i, roi_slot, slot_ovf,
                    *, n_bins, slots, out_size, c, dt, w_pad, rows_pad,
                    interpret):
    """Packed-2D variant of the v4 bin-tile kernel (HTD_V4_PACKED=1).

    The default kernel is VPU-relayout-bound (xplane 2026-08-17: kernel
    ~4.95 ms/1000 rois vs ~1.2 ms of DMA): per step it concatenates ten
    (96,16,C) blocks into a (192,80,C) window (~12 MB of copies), merges
    sublane+lane dims with a reshape, and materializes a 13.7 MB f32
    stage-A product. This variant streams the pyramid as a PACKED 2-D
    array (w_pad, rows_pad*C) so each block arrives as (96, 16*C) with
    the (h, c) lane merge already done by the block slicing:

      * stage A runs per (kx, ky) sub-block — no window assembly at all;
      * the one unavoidable mid-pipeline relayout (rows (k,x) -> (k,h))
        happens per 16-row h-chunk;
      * stage B accumulates the five h-chunk block-diag products in f32.

    Math identical to the default kernel (same ay/ax matrices).
    """
    f32 = jnp.float32

    # per-h-chunk block-diagonal y matrices: [n, ky, (k, y), (k', hh)]
    a5 = ay.reshape(n_bins, slots, out_size, V4_N_Y, V4_Y_STRIPE).astype(dt)
    eye = jnp.eye(slots, dtype=dt)
    ay_p = jnp.einsum("nkyjh,kq->njkyqh", a5, eye).reshape(
        n_bins, V4_N_Y, slots * out_size, slots * V4_Y_STRIPE
    )
    pyr_p = pyr_t.reshape(w_pad, rows_pad * c)

    def kernel(ybin_ref, xbin_ref, occ_ref, ay_ref, ax_ref, *refs):
        del ybin_ref, xbin_ref
        blocks = refs[: V4_N_Y * V4_N_X]
        out_ref = refs[V4_N_Y * V4_N_X]

        @pl.when(occ_ref[pl.program_id(0)] > 0)
        def _process():
            ax_m = ax_ref[0]  # (K*7, 192)
            acc = jnp.zeros((slots * out_size, out_size * c), f32)
            for ky in range(V4_N_Y):
                u = None
                for kx in range(V4_N_X):
                    axk = ax_m[:, kx * V4_X_BLOCK:(kx + 1) * V4_X_BLOCK]
                    t = jnp.dot(
                        axk, blocks[kx * V4_N_Y + ky][:],
                        preferred_element_type=f32,
                    )  # (K*7x, 16*C)
                    u = t if u is None else u + t
                # rows (k, x), lanes (h, c) -> rows (k, h), lanes (x, c)
                v = u.astype(dt).reshape(slots, out_size, V4_Y_STRIPE, c)
                v = jnp.swapaxes(v, 1, 2).reshape(
                    slots * V4_Y_STRIPE, out_size * c
                )
                acc = acc + jnp.dot(
                    ay_ref[0, ky], v, preferred_element_type=f32
                )
            out_ref[0] = acc.reshape(
                slots, out_size, out_size, c
            ).astype(out_ref.dtype)

    block_specs = []
    for kx in range(V4_N_X):
        for ky in range(V4_N_Y):
            block_specs.append(
                pl.BlockSpec(
                    (V4_X_BLOCK, V4_Y_STRIPE * c),
                    functools.partial(
                        lambda i, yb, xb, occ, ky, kx:
                            (xb[i] + kx, yb[i] + ky),
                        ky=ky, kx=kx,
                    ),
                    memory_space=pltpu.VMEM,
                )
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_bins,),
        in_specs=[
            pl.BlockSpec(
                (1, V4_N_Y, slots * out_size, slots * V4_Y_STRIPE),
                lambda i, yb, xb, occ: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, slots * out_size, V4_RES_W),
                lambda i, yb, xb, occ: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + block_specs,
        out_specs=pl.BlockSpec(
            (1, slots, out_size, out_size, c),
            lambda i, yb, xb, occ: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    slot_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_bins, slots, out_size, out_size, c), dt
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024
        ),
        interpret=interpret,
    )(ybin_b, xbin_b, occ_i, ay_p, ax, *([pyr_p] * (V4_N_Y * V4_N_X)))

    flat = slot_out.reshape(n_bins * slots, out_size, out_size, c)
    flat = jnp.concatenate(
        [flat, jnp.zeros((1, out_size, out_size, c), dt)], axis=0
    )
    return flat[roi_slot], slot_ovf
# coverage (worst-case origin quantization): y extent <= 80-16-2, x <= 192-96-2
V4_COVER_H = V4_RES_H - V4_Y_STRIPE - 2
V4_COVER_W = V4_RES_W - V4_X_BLOCK - 2


def _v4_bin_rois(start_h, start_w, hs, ws, row_off, n_ybins, n_xbins, slots,
                 roi_valid=None, n_spill=0):
    """Assign each roi to a spatial bin and a slot within it.

    Returns (ybin, xbin, roi_slot, slot_roi, slot_overflow, spill_parent):
      * roi_slot (R,): each roi's flat slot in [0, (n_bins+n_spill)*slots]
        (== trash when the roi overflowed every capacity);
      * slot_roi ((n_bins+n_spill)*slots + 1,): each slot's roi index
        (R = empty);
      * slot_overflow (R,) bool;
      * spill_parent (n_spill,) int32: the REAL bin id each spill bin
        duplicates (0 for unused spill bins).

    Spill bins (n_spill > 0): a roi ranked beyond `slots` in its bin is
    assigned to a virtual duplicate of that bin appended after the real
    ones — same DMA window coordinates, fresh slot rows. Spill bins are
    allocated densely in sorted order, one per (bin, round) pair, so with
    n_spill >= ceil(R/slots) slot overflow is IMPOSSIBLE (each spill round
    holds >= 1 roi). This keeps crowded-proposal images (e.g. >24 NMS
    proposals landing in one 56x128 px window — 274/995 rois on the noise
    bench input) inside the kernel instead of the per-roi gather fallback,
    which silently zero-filled rois beyond its fixed cap.

    roi_valid (R,) bool, optional: invalid rois (e.g. the zero-box padding
    of a fixed-capacity proposal array) go straight to the trash slot — they
    consume no bin capacity and are never reported as overflow, so they
    cannot crowd valid rois out of the caller's fallback budget.
    """
    f32 = jnp.float32
    r = start_h.shape[0]
    y_lo = jnp.clip(jnp.floor(jnp.maximum(start_h, 0.0)), 0.0,
                    jnp.maximum(hs - 1, 0.0))
    x_lo = jnp.clip(jnp.floor(jnp.maximum(start_w, 0.0)), 0.0,
                    jnp.maximum(ws - 1, 0.0))
    abs_y = row_off + y_lo
    ybin = jnp.clip(jnp.floor(abs_y / V4_Y_STRIPE), 0, n_ybins - 1
                    ).astype(jnp.int32)
    xbin = jnp.clip(jnp.floor(x_lo / V4_X_BLOCK), 0, n_xbins - 1
                    ).astype(jnp.int32)
    bin_id = ybin * n_xbins + xbin
    n_bins = n_ybins * n_xbins
    if roi_valid is not None:
        # invalid rois sort into a virtual bin past every real one
        bin_id = jnp.where(roi_valid, bin_id, n_bins)

    n_all = n_bins + n_spill
    order = jnp.argsort(bin_id)          # stable
    sb = bin_id[order]
    first = jnp.searchsorted(sb, sb, side="left")
    rank = jnp.arange(r, dtype=jnp.int32) - first.astype(jnp.int32)
    real = sb < n_bins
    ok = (rank < slots) & real
    flat_slot = jnp.where(ok, sb * slots + rank, n_all * slots)
    if n_spill > 0:
        # dense spill-bin allocation in sorted order: one spill bin per
        # (bin, round>0) pair; a spill roi's round start is the most
        # recent start before it (same contiguous bin group), so the
        # running count of starts indexes its spill bin directly.
        is_spill = (rank >= slots) & real
        is_start = is_spill & (rank % slots == 0)
        sp_idx = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        ok_spill = is_spill & (sp_idx < n_spill)
        flat_slot = jnp.where(
            ok_spill, (n_bins + sp_idx) * slots + rank % slots, flat_slot
        )
        # parent bin id of each spill bin (scatter from the round starts;
        # out-of-capacity starts land on a discarded extra row)
        scatter_to = jnp.where(
            is_start & (sp_idx < n_spill), sp_idx, n_spill
        )
        spill_parent = (
            jnp.zeros((n_spill + 1,), jnp.int32)
            .at[scatter_to].set(sb.astype(jnp.int32))[:n_spill]
        )
        ovf_sorted = is_spill & ~ok_spill
    else:
        spill_parent = jnp.zeros((0,), jnp.int32)
        ovf_sorted = ~ok & real
    slot_roi = jnp.full((n_all * slots + 1,), r, jnp.int32)
    slot_roi = slot_roi.at[flat_slot].set(order.astype(jnp.int32))
    # trash slot may have been claimed by an overflowed roi; reset it
    slot_roi = slot_roi.at[n_all * slots].set(r)
    roi_slot = jnp.zeros((r,), jnp.int32).at[order].set(
        flat_slot.astype(jnp.int32)
    )
    overflow = jnp.zeros((r,), bool).at[order].set(ovf_sorted)
    return ybin, xbin, roi_slot, slot_roi, overflow, spill_parent


def roi_align_pallas_v4(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
    interpret: bool = False,
    img_idx: "Array | None" = None,
    slots: int = 24,
    roi_valid: "Array | None" = None,
    spill_bins: "int | None" = None,
):
    """v4 'bin-tile' kernel: grid over SPATIAL BINS, not rois.

    Motivation (measured, PERF.md round 2): v3 issues ~12 HBM block DMAs
    per roi; real NMS proposals are spatially ANTI-clustered (NMS suppresses
    neighbours), so the pipeline's consecutive-block-reuse never fires and
    the kernel is per-DMA-overhead bound (~10 ms/1000 rois in-model vs
    4.5 ms on artificially clustered benchmarks).

    v4 inverts the loop: the grid walks (y_bin, x_bin) tiles of the level
    pyramid; each step holds a (80, 192, C) resident region in VMEM (10
    pipeline blocks) and evaluates up to `slots` rois binned to that
    region by two stacked interpolation matmuls over the WHOLE resident
    patch (tent weights are zero outside each roi's sampled span, so no
    window slicing is needed). Total DMA = bins x 10 blocks (~1k) instead
    of rois x 12 (~12k); compute runs on the MXU in bf16 with f32
    accumulation.

    Rois whose bin already holds `slots` rois overflow to the caller's
    fallback (returned mask), as do rois whose sampled extent exceeds the
    coverage (V4_COVER_H/W at the mapped level).

    Returns (out (R, out, out, C), overflow (R,) bool).
    """
    f32 = jnp.float32
    c = feats[0].shape[-1]
    r = rois.shape[0]
    dt = feats[0].dtype

    # pyramid with v4 row/width padding:
    # w_pad large enough that xbin+1 block indices stay in range
    max_w = max(int(f.shape[-2]) for f in feats)
    w_pad_target = ((max_w - 1) // V4_X_BLOCK + 2) * V4_X_BLOCK
    use_xmajor = (
        not interpret
        and jax.default_backend() != "cpu"
        and os.environ.get("HTD_V4_XMAJOR", "0") == "1"
    )
    if use_xmajor:
        pyr_t, offsets, w_pad, rows_pad, img_rows = _build_pyramid_xmajor(
            feats, V4_RES_H, w_pad_target - V4_X_BLOCK, V4_X_BLOCK,
            V4_Y_STRIPE,
        )
        pyr = None
    else:
        pyr, offsets, w_pad, rows_pad, img_rows = _v4_pyramid(
            feats, interpret=interpret
        )
        pyr_t = None
    n_ybins = rows_pad // V4_Y_STRIPE - (V4_N_Y - 1)
    n_xbins = w_pad // V4_X_BLOCK - (V4_N_X - 1)
    n_bins = n_ybins * n_xbins

    scales = jnp.asarray([1.0 / s for s in strides], f32)[target_lvls]
    rois = rois.astype(f32)
    start_w = rois[:, 0] * scales - 0.5
    start_h = rois[:, 1] * scales - 0.5
    bin_w = (rois[:, 2] - rois[:, 0]) * scales / out_size
    bin_h = (rois[:, 3] - rois[:, 1]) * scales / out_size
    if sampling_ratio > 0:
        s_max = sampling_ratio
        grid_w = jnp.full((r,), sampling_ratio, f32)
        grid_h = jnp.full((r,), sampling_ratio, f32)
    else:
        s_max = max_samples
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, s_max)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, s_max)

    hs = jnp.asarray([float(f.shape[-3]) for f in feats], f32)[target_lvls]
    ws = jnp.asarray([float(f.shape[-2]) for f in feats], f32)[target_lvls]
    row_off = jnp.asarray(np.asarray(offsets, np.float32))[target_lvls]
    if img_idx is not None:
        row_off = row_off + img_idx.astype(f32) * float(img_rows)

    # Spill bins (HTD_V4_SPILL): virtual duplicate bins that absorb slot
    # overflow in-kernel (see _v4_bin_rois). "1" (exhaustive) appends
    # ceil(R/slots) bins — overflow becomes IMPOSSIBLE, but at 1000
    # proposals that is ~42 extra bins (~45% more interp-matrix build and
    # grid steps; measured −1.2 img/s at b1). An integer k >= 2 caps the
    # budget at k bins total (callers with batched rois pass
    # `spill_bins` = k * n_images instead, so the budget scales with
    # batch): realistic crowding needs only a few spill rounds, and the
    # residual still exits through the exact gather fallback
    # (`ovf_sorted` -> overflow scoring), so correctness is unchanged —
    # only the slow path gets rarer. "0" disables.
    spill_full = (r + slots - 1) // slots
    if spill_bins is not None:
        n_spill = min(int(spill_bins), spill_full)
    else:
        spill_mode = os.environ.get("HTD_V4_SPILL", "1")
        if spill_mode == "0":
            n_spill = 0
        elif spill_mode == "1":
            n_spill = spill_full
        else:
            n_spill = min(int(spill_mode), spill_full)
    n_all = n_bins + n_spill

    ybin_r, xbin_r, roi_slot, slot_roi, slot_ovf, spill_parent = _v4_bin_rois(
        start_h, start_w, hs, ws, row_off, n_ybins, n_xbins, slots,
        roi_valid=roi_valid, n_spill=n_spill,
    )

    # per-bin block coordinates for the index maps (spill bins duplicate
    # their parent's window coordinates)
    bins = jnp.arange(n_bins, dtype=jnp.int32)
    ybin_b = jnp.concatenate([bins // n_xbins, spill_parent // n_xbins])
    xbin_b = jnp.concatenate([bins % n_xbins, spill_parent % n_xbins])

    # per-slot params, gathered in slot order
    take = jnp.minimum(slot_roi[: n_all * slots], r - 1)
    valid = (slot_roi[: n_all * slots] < r).astype(f32)
    y_origin = (jnp.repeat(ybin_b, slots) * V4_Y_STRIPE).astype(f32) - row_off[take]
    x_origin = (jnp.repeat(xbin_b, slots) * V4_X_BLOCK).astype(f32)

    # Interpolation matrices are PRECOMPUTED here (vectorized XLA) and
    # streamed to the kernel as pipeline inputs: building them in-kernel
    # (iota tents unrolled over K slots) made Mosaic compilation take
    # ~20 MINUTES; with them as inputs the kernel body is two matmuls.
    ay = _interp_matrix_k(
        start_h[take], bin_h[take], grid_h[take], hs[take], y_origin,
        V4_RES_H, out_size, s_max, valid,
    )  # (n_bins*slots, 7, RES_H)
    ax = _interp_matrix_k(
        start_w[take], bin_w[take], grid_w[take], ws[take], x_origin,
        V4_RES_W, out_size, s_max, valid,
    )  # (n_bins*slots, 7, RES_W)
    count = jnp.maximum(grid_h[take] * grid_w[take], 1.0)
    ay = ay / count[:, None, None]  # fold the adaptive-grid average in
    # y matrices ship BLOCK-DIAGONAL (K*7, K*RES_H): the second contraction
    # is per-slot, and a batched dot_general lowers to the VPU (~150 us/
    # step measured); a block-diagonal 2-D matmul keeps it on the MXU.
    # The K x zero-padding costs (K-1)/K of the stage-B FLOPs but stage B
    # is only ~2 GFLOP/step — still ~5x cheaper than the VPU path.
    # Memory note: ay_bd is (n_bins, slots*7, slots*80) — ~0.25 GB bf16 at
    # batch 8 x 800x1344 (n_bins~750, K=24), linear in batch and image area.
    # Built in the compute dtype directly (multiplying by a 0/1 eye tile is
    # exact in bf16) so no same-shaped f32 intermediate is materialized.
    eye = jnp.eye(slots, dtype=dt)
    ay_bd = jnp.einsum(
        "nyh,nk->nykh",
        ay.reshape(n_all * slots, out_size, V4_RES_H).astype(dt),
        jnp.tile(eye, (n_all, 1)),
    ).reshape(n_all, slots, out_size, slots, V4_RES_H)
    ay_bd = ay_bd.reshape(
        n_all, slots * out_size, slots * V4_RES_H
    )
    ax = ax.reshape(n_all, slots * out_size, V4_RES_W).astype(dt)

    if (interpret or jax.default_backend() == "cpu") and not _FORCE_KERNEL_INTERPRET:
        # jnp emulation with identical binning/origin math (validates the
        # bin assignment and coverage logic exactly, in f32)
        def one(t):
            (yb, xb, st_h, st_w, b_h, b_w, g_h, g_w, s_h, s_w, ro) = t
            res = jax.lax.dynamic_slice(
                pyr, (yb * V4_Y_STRIPE, xb * V4_X_BLOCK, 0),
                (V4_RES_H, V4_RES_W, c),
            )
            ay = _interp_matrix(
                st_h, b_h, g_h, s_h,
                yb.astype(f32) * V4_Y_STRIPE - ro, V4_RES_H, out_size, s_max)
            ax = _interp_matrix(
                st_w, b_w, g_w, s_w,
                xb.astype(f32) * V4_X_BLOCK, V4_RES_W, out_size, s_max)
            count = jnp.maximum(g_h * g_w, 1.0)
            wf = res.reshape(V4_RES_H, V4_RES_W * c).astype(f32)
            tmp = jnp.dot(ay, wf).reshape(out_size, V4_RES_W, c)
            o = jnp.einsum("xp,ypc->yxc", ax, tmp) / count
            return o.astype(dt)

        out = jax.lax.map(
            one,
            (ybin_r, xbin_r, start_h, start_w, bin_h, bin_w,
             grid_h, grid_w, hs, ws, row_off),
        )
        return out, slot_ovf

    # the kernel streams the pyramid X-MAJOR ((w_pad, rows_pad, C)): stage
    # A contracts over w, and an in-kernel (80,192,C) transpose measured
    # ~33 us/step of VPU row copies — transposing ONCE in XLA is ~free.
    # HTD_V4_XMAJOR=1 builds the pyramid x-major from per-level transposes
    # instead (see _build_pyramid_xmajor); A/B-able, off by default.
    if pyr_t is None:
        pyr_t = jnp.swapaxes(pyr, 0, 1)

    # EMPTY-BIN SKIP: bins holding no valid roi (pad rows, sparsely
    # populated levels — invalid rois go to the trash slot and never claim
    # bins) skip both compute (@pl.when on a prefetched occupancy flag) and
    # DMA (their block coords are remapped to the PREVIOUS active bin's, so
    # consecutive index-map outputs repeat and the pipeline refetches
    # nothing). Their output block keeps stale/uninitialized VMEM content —
    # harmless: slot_roi never points into an empty bin, so those rows are
    # never gathered. HTD_V4_SKIP_EMPTY=0 reverts.
    skip_empty = os.environ.get("HTD_V4_SKIP_EMPTY", "1") == "1"
    occ_b = (slot_roi[: n_all * slots].reshape(n_all, slots) < r).any(axis=1)
    if skip_empty:
        idxs = jnp.arange(n_all, dtype=jnp.int32)
        last_act = jax.lax.cummax(jnp.where(occ_b, idxs, -1))
        binsel = jnp.maximum(last_act, 0)
        ybin_k = ybin_b[binsel]
        xbin_k = xbin_b[binsel]
        occ_i = occ_b.astype(jnp.int32)
    else:
        ybin_k, xbin_k = ybin_b, xbin_b
        occ_i = jnp.ones((n_all,), jnp.int32)

    use_packed = os.environ.get("HTD_V4_PACKED", "0") == "1"
    run_interp = interpret or _FORCE_KERNEL_INTERPRET
    if use_packed:
        return _v4_call_packed(
            pyr_t, ay, ax, ybin_k, xbin_k, occ_i, roi_slot, slot_ovf,
            n_bins=n_all, slots=slots, out_size=out_size, c=c, dt=dt,
            w_pad=w_pad, rows_pad=rows_pad, interpret=run_interp,
        )

    def kernel(ybin_ref, xbin_ref, occ_ref, ay_ref, ax_ref, *refs):
        del ybin_ref, xbin_ref
        blocks = refs[: V4_N_Y * V4_N_X]
        out_ref = refs[V4_N_Y * V4_N_X]

        @pl.when(occ_ref[pl.program_id(0)] > 0)
        def _process():
            ay_bd = ay_ref[0]  # (K*7, K*RES_H) block-diagonal
            ax_m = ax_ref[0]   # (K*7, RES_W)

            # assemble the x-major (RES_W, RES_H, C) resident region
            cols = []
            for kx in range(V4_N_X):
                cols.append(jnp.concatenate(
                    [blocks[kx * V4_N_Y + ky][:] for ky in range(V4_N_Y)],
                    axis=1,
                ))
            wt = jnp.concatenate(cols, axis=0)  # (192, 80, C)

            # stage A (x contract, shared resident): (K*7x, W) @ (W, H*C)
            u = jnp.dot(
                ax_m, wt.reshape(V4_RES_W, V4_RES_H * c),
                preferred_element_type=f32,
            ).astype(dt)  # (K*7x, H*C)
            # stage B (y contract, per-slot): block-diag (K*7y, K*H) @
            # (K*H, 7x*C)
            u4 = u.reshape(slots, out_size, V4_RES_H, c)
            u4 = jnp.swapaxes(u4, 1, 2)  # (K, H, 7x, C)
            out = jnp.dot(
                ay_bd, u4.reshape(slots * V4_RES_H, out_size * c),
                preferred_element_type=f32,
            )  # (K*7y, 7x*C) — rows (k, y), cols (x, c): final order directly
            out_ref[0] = out.reshape(
                slots, out_size, out_size, c
            ).astype(out_ref.dtype)

    block_specs = []
    for kx in range(V4_N_X):
        for ky in range(V4_N_Y):
            block_specs.append(
                pl.BlockSpec(
                    (V4_X_BLOCK, V4_Y_STRIPE, c),
                    functools.partial(
                        lambda i, yb, xb, occ, ky, kx:
                            (xb[i] + kx, yb[i] + ky, 0),
                        ky=ky, kx=kx,
                    ),
                    memory_space=pltpu.VMEM,
                )
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_all,),
        in_specs=[
            pl.BlockSpec((1, slots * out_size, slots * V4_RES_H),
                         lambda i, yb, xb, occ: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slots * out_size, V4_RES_W),
                         lambda i, yb, xb, occ: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + block_specs,
        out_specs=pl.BlockSpec(
            (1, slots, out_size, out_size, c),
            lambda i, yb, xb, occ: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    slot_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_all, slots, out_size, out_size, c), dt
        ),
        # scoped VMEM ~35 MB at the default K=24 slots: 10 double-buffered
        # (16, 96, C) bf16 blocks (15.7 MB) + ay/ax blocks + the (K*7, 96C)
        # f32 y-contract intermediate (16.5 MB) + assembled strip + out
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024
        ),
        interpret=run_interp,
    )(ybin_k, xbin_k, occ_i, ay_bd, ax, *([pyr_t] * (V4_N_Y * V4_N_X)))

    flat = slot_out.reshape(n_all * slots, out_size, out_size, c)
    flat = jnp.concatenate(
        [flat, jnp.zeros((1, out_size, out_size, c), dt)], axis=0
    )
    return flat[roi_slot], slot_ovf


def roi_align_fused_batched(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
    interpret: bool = False,
    fallback_cap: int = None,
    kernel: str = "v4",
) -> Array:
    """Batched fused RoIAlign: levels (B, H, W, C), rois (B, R, 4).

    Returns (B, R, out, out, C). One pyramid (image-major row layout) and
    ONE Pallas grid over all B*R rois — no vmap over the kernel (the
    batching rule's per-image expansion measured ~2.6x slower in-model),
    and per-roi window sorting now amortizes ACROSS images.
    """
    b, r = rois.shape[0], rois.shape[1]
    f32 = jnp.float32
    flat_rois = rois.reshape(b * r, 4)
    flat_lvls = target_lvls.reshape(b * r)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)

    # Degenerate rois (the zero-box padding of fixed-capacity proposal
    # arrays) must not consume kernel bin slots OR fallback budget: with
    # hundreds of padded rois per image all binned to level-0 (0,0), they
    # would otherwise slot-overflow at score 2.0 and exhaust the fallback
    # cap, leaving VALID slot-overflow rois of later images with the
    # kernel's zero rows.
    roi_ok = ((flat_rois[:, 2] - flat_rois[:, 0]) > 0.0) & (
        (flat_rois[:, 3] - flat_rois[:, 1]) > 0.0
    )

    scales = jnp.asarray([1.0 / s for s in strides], f32)[flat_lvls]
    ext_w = (flat_rois[:, 2] - flat_rois[:, 0]).astype(f32) * scales
    ext_h = (flat_rois[:, 3] - flat_rois[:, 1]).astype(f32) * scales
    # Spill / conditional-fallback defaults are BATCH-AWARE. Round-3f A/B
    # (slots=24): b1 spill-off + unconditional cap-96 gather; b>1
    # exhaustive spill + tiered cond fallback. Round-4 re-A/B at the new
    # slots=8 default (PERF.md "Round 4: v4 slot-count A/B"): b1 now takes
    # a 16-bins/img spill BUDGET on top of the unconditional gather
    # (34.3 ms vs old default 38.1; capacity 8/window + 128 spill rois +
    # 96 fallback rois strictly exceeds the old 24/window + 96, so the
    # faster default is also the more exact one). Budget spill only loses
    # when paired with the cond's serializing full-cap branch — with the
    # UNCOND gather it is nearly free.
    spill_mode = os.environ.get("HTD_V4_SPILL", "auto")
    if spill_mode == "auto":
        spill_mode = "1" if b > 1 else "16"
    fb_cond = os.environ.get("HTD_FB_COND", "auto")
    fb_cond = (b > 1) if fb_cond == "auto" else fb_cond == "1"
    if kernel == "v4":
        size_ovf = (ext_w > V4_COVER_W) | (ext_h > V4_COVER_H)
        if spill_mode == "0":
            spill_arg = 0
        elif spill_mode == "1":
            spill_arg = b * r  # >= ceil(B*R/slots): exhaustive
        else:
            # explicit k>=2: PER-IMAGE budget (crowding is per-image; a
            # fixed total budget starves later images at batch>1)
            spill_arg = int(spill_mode) * b
        # slot count trades per-group interp cost (the block-diag interp
        # matrices waste FLOPs proportional to `slots`) against spill-bin
        # count / fallback pressure. Round-4 on-chip ladder (PERF.md):
        # 24 / 16 / 12 / 8 / 6 slots -> b1 38.1 / 35.6 / 35.1 / 33.8 /
        # 33.7 ms, b4 41.1 / 39.6 / 39.5 / 38.1 / 38.5 ms per image —
        # slots=8 is the knee at both batch sizes.
        slots = int(os.environ.get("HTD_V4_SLOTS", "8"))
        flat_out, slot_ovf = roi_align_pallas_v4(
            list(feats), flat_rois, strides, flat_lvls,
            out_size=out_size, sampling_ratio=sampling_ratio,
            max_samples=max_samples, interpret=interpret, img_idx=img_idx,
            roi_valid=roi_ok, spill_bins=spill_arg, slots=slots,
        )
        overflow = size_ovf | slot_ovf
    else:
        g = V3_GEOM
        win_h, win_w = g["n_y"] * g["y_block"], g["n_x"] * g["x_block"]
        size_ovf = (ext_w + g["x_block"] + 2 > win_w) | (
            ext_h + g["y_block"] + 2 > win_h
        )
        slot_ovf = jnp.zeros_like(size_ovf)
        if interpret or jax.default_backend() == "cpu":
            flat_out = jnp.concatenate([
                roi_align_pallas_v3(
                    [f[i] for f in feats], rois[i], strides, target_lvls[i],
                    out_size=out_size, sampling_ratio=sampling_ratio,
                    max_samples=max_samples, interpret=True, **g,
                )
                for i in range(b)
            ])
        else:
            flat_out = roi_align_pallas_v3(
                list(feats), flat_rois, strides, flat_lvls,
                out_size=out_size, sampling_ratio=sampling_ratio,
                max_samples=max_samples, img_idx=img_idx, **g,
            )
        overflow = size_ovf

    if fallback_cap is not None:
        cap_full = fallback_cap
    elif kernel == "v4" and spill_mode == "1":
        # EXHAUSTIVE spill bins make slot overflow impossible, so the
        # fallback only serves SIZE-overflow (elongated) rois — rare, and
        # their kernel value is a truncated-coverage approximation rather
        # than zeros, so a smaller per-image budget degrades gracefully.
        # (A capped spill budget HTD_V4_SPILL=k>=2 keeps the full cap:
        # slot overflow is possible again, merely rare.)
        cap_full = int(os.environ.get("HTD_FB_CAP", "32")) * b
    else:
        cap_full = FALLBACK_CAP * b
    cap_full = min(cap_full, b * r)
    # slot-overflow rois carry a ZERO row from the kernel (their bin was
    # full) — they MUST win fallback capacity over size-overflow rois,
    # whose kernel value is merely a truncated-coverage approximation;
    # degenerate (padding) rois never compete at all
    score = jnp.where(slot_ovf, 2.0, 0.0) + jnp.where(size_ovf, 1.0, 0.0)
    score = jnp.where(roi_ok, score, 0.0)
    # fallback must respect each roi's image: flat row gather with explicit
    # per-roi (image, level) row offsets
    from htd_tpu.ops import roi_align as _ra

    c = feats[0].shape[-1]
    hs = np.array([f.shape[1] for f in feats], np.float32)
    ws = np.array([f.shape[2] for f in feats], np.float32)
    sc = np.array([1.0 / s for s in strides], np.float32)
    if kernel == "v4":
        # gather straight from the SAME width-padded pyramid the v4 kernel
        # streams — the _v4_pyramid call is identical to the one inside
        # roi_align_pallas_v4, so XLA CSEs the two builds into one. The
        # previous per-image flat concat materialized a second full copy of
        # all levels (~44 MB/img at 768x1344) purely for <=FALLBACK_CAP
        # fallback rois.
        pyr_fb, offs_fb, w_pad_fb, _, img_rows_fb = _v4_pyramid(
            list(feats), interpret=interpret
        )
        flat_buf = pyr_fb.reshape(-1, c)
        lvl_row_offs = np.concatenate(
            [[0], np.cumsum([int(f.shape[1]) for f in feats])]
        )[:-1].astype(np.int32)

        def make_offsets(idx, lv_sub):
            base_rows = (
                img_idx[idx] * img_rows_fb
                + jnp.asarray(lvl_row_offs)[lv_sub]
            )
            row_offset = base_rows * w_pad_fb
            return row_offset, jnp.full_like(row_offset, w_pad_fb)
    else:
        sizes = [int(f.shape[1] * f.shape[2]) for f in feats]
        img_size = int(np.sum(sizes))
        lvl_offs = np.concatenate([[0], np.cumsum(sizes)])[:-1].astype(
            np.int32
        )
        flat_buf = jnp.concatenate(
            [jnp.concatenate([f[i].reshape(-1, c) for f in feats], axis=0)
             for i in range(b)],
            axis=0,
        )

        def make_offsets(idx, lv_sub):
            row_offset = (
                jnp.asarray(lvl_offs)[lv_sub] + img_idx[idx] * img_size
            )
            return row_offset, None

    def _fb_apply(cap, flat_out):
        """Patch the top-`cap` scored rois with the exact gather result."""
        top, idx = jax.lax.top_k(score, cap)
        sel_valid = top > 0.0
        lv_sub = flat_lvls[idx]
        row_offset, row_stride = make_offsets(idx, lv_sub)
        sub = _ra._roi_align_core(
            flat_buf,
            flat_rois[idx],
            scale=jnp.asarray(sc)[lv_sub],
            fh=jnp.asarray(hs)[lv_sub],
            fw=jnp.asarray(ws)[lv_sub],
            row_offset=row_offset,
            out_size=out_size,
            sampling_ratio=sampling_ratio,
            max_samples=max_samples,
            row_stride=row_stride,
        )
        patched = jnp.where(
            sel_valid[:, None, None, None], sub, flat_out[idx]
        )
        return flat_out.at[idx].set(patched.astype(flat_out.dtype))

    # fb_cond (HTD_FB_COND, default on at batch>1): the fallback gather
    # runs at full capacity every step (96 rois/img x 49 bins x 64 rows =
    # the single most expensive op at batch 4, 14.5 ms/iter) even when no
    # roi actually overflowed. Tier it on the RUNTIME overflow count with
    # lax.cond (TPU executes only the taken branch): 0 -> skip entirely,
    # <= 16/img -> small-cap gather, else full cap. Identical outputs in
    # all cases (same score/top_k/mask-patch semantics). Only worthwhile
    # when the skip/small branches are the common case (i.e. with
    # exhaustive spill); the full-cap branch costs MORE than the
    # unconditional gather (serialized, 27.1 -> 23.0 img/s at b1).
    if fb_cond and cap_full > 0:
        n_need = jnp.sum((score > 0.0).astype(jnp.int32))
        cap_small = min(16 * b, cap_full)
        if cap_small < cap_full:
            flat_out = jax.lax.cond(
                n_need == 0,
                lambda fo: fo,
                lambda fo: jax.lax.cond(
                    n_need <= cap_small,
                    lambda f2: _fb_apply(cap_small, f2),
                    lambda f2: _fb_apply(cap_full, f2),
                    fo,
                ),
                flat_out,
            )
        else:
            flat_out = jax.lax.cond(
                n_need == 0,
                lambda fo: fo,
                lambda fo: _fb_apply(cap_full, fo),
                flat_out,
            )
    else:
        flat_out = _fb_apply(cap_full, flat_out)
    return flat_out.reshape(b, r, out_size, out_size, c)


def roi_align_pallas_v4_bwd(
    feats: Sequence[Array],
    rois: Array,             # (B, R, 4)
    strides: Sequence[int],
    target_lvls: Array,      # (B, R)
    g: Array,                # (B, R, out, out, C) cotangent
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
    slots: "int | None" = None,
    interpret: bool = False,
):
    """Pallas window-accumulation backward for the fused batched extractor
    (the round-5 design from PERF.md: the corner-folded XLA scatter runs
    at the measured ~44 GB/s scatter ceiling — 31 ms per extraction, the
    top op of BOTH train steps).

    Structure = the TRANSPOSE of the v4 forward, re-gridded over OUTPUT
    blocks so every d_pyramid block is written exactly once (no scatter,
    no read-modify-write):

      * rois are binned to (y_stripe, x_block)-origin windows exactly like
        the forward (`_v4_bin_rois`, no spill) and their per-slot interp
        matrices Ay (count-folded) / Ax are built by the SAME
        `_interp_matrix_k` — so the contribution of roi r to window pixel
        (h, w) is Ay[r, y, h] * Ax[r, x, w] * g[r, y, x], the exact
        gradient of the forward's two-matmul formulation (== the gather
        formulation's gradient, mmcv semantics incl. border clamps);
      * the kernel grid walks the (16, 96)-blocked x-major d_pyramid;
        each step accumulates in f32 the contributions of the <= 10
        windows covering its block (relative positions ky in [0,5) x kx
        in [0,2)), each computed as two MXU contractions:
            t  = AyT_stripe_bd (K*16, K*7) @ g_bin (K*7y, 7x*C)
            d += AxT_chunk       (96, K*7) @ t'   (K*7x, 16*C)
        (t' is t with the per-slot (h, x) dims swapped);
      * per-(ky) inputs arrive as whole bin-ROWS (all x-bins of stripe
        row by-ky) so sweeping bx refetches nothing, and the x-bin is
        dynamic-sliced in VMEM; out-of-range / empty neighbours skip via
        @pl.when on program-id arithmetic + a prefetched occupancy table.

    Rois that overflow their bin's `slots` capacity or the window
    coverage return in the `overflow` mask; the caller routes them
    through the capped folded-scatter fallback. Returns
    (d_pyr (w_pad, rows_pad, C) x-major, geometry dict, overflow (B*R,)).
    """
    f32 = jnp.float32
    b, r = rois.shape[0], rois.shape[1]
    c = feats[0].shape[-1]
    dt = feats[0].dtype
    if slots is None:
        # 16 by default: training rois crowd (positives cluster around
        # GTs) — the clustered stress test overflows 326/1024 at K=8 but
        # 138 at K=16, inside the fallback cap; the on-chip ladder
        # (2026-08-21, R-50 train b2) measured K=8 with the (since
        # removed) tiered fallback taking its full-fold branch every
        # step (183 ms/iter, worse than fold's 170)
        slots = int(os.environ.get("HTD_RA_BWD_SLOTS", "16"))
    k_sl = slots

    # pyramid GEOMETRY only (no data build — the backward never reads
    # features); must match _v4_pyramid / _build_pyramid exactly
    max_w = max(int(f.shape[-2]) for f in feats)
    w_pad = ((max_w - 1) // V4_X_BLOCK + 2) * V4_X_BLOCK
    offsets = [0]
    for f in feats:
        offsets.append(offsets[-1] + int(f.shape[-3]))
    img_rows = offsets[-1]
    offsets = offsets[:-1]
    rows = b * img_rows
    rows_pad = ((rows + V4_RES_H + V4_Y_STRIPE - 1)
                // V4_Y_STRIPE * V4_Y_STRIPE)
    n_ybins = rows_pad // V4_Y_STRIPE - (V4_N_Y - 1)
    n_xbins = w_pad // V4_X_BLOCK - (V4_N_X - 1)
    n_bins = n_ybins * n_xbins

    flat_rois = rois.reshape(b * r, 4).astype(f32)
    flat_lvls = target_lvls.reshape(b * r)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    scales = jnp.asarray([1.0 / s for s in strides], f32)[flat_lvls]
    start_w = flat_rois[:, 0] * scales - 0.5
    start_h = flat_rois[:, 1] * scales - 0.5
    bin_w = (flat_rois[:, 2] - flat_rois[:, 0]) * scales / out_size
    bin_h = (flat_rois[:, 3] - flat_rois[:, 1]) * scales / out_size
    if sampling_ratio > 0:
        s_max = sampling_ratio
        grid_w = jnp.full((b * r,), sampling_ratio, f32)
        grid_h = jnp.full((b * r,), sampling_ratio, f32)
    else:
        s_max = max_samples
        grid_w = jnp.clip(jnp.ceil(bin_w), 0, s_max)
        grid_h = jnp.clip(jnp.ceil(bin_h), 0, s_max)
    hs = jnp.asarray([float(f.shape[-3]) for f in feats], f32)[flat_lvls]
    ws = jnp.asarray([float(f.shape[-2]) for f in feats], f32)[flat_lvls]
    row_off = jnp.asarray(np.asarray(offsets, np.float32))[flat_lvls]
    row_off = row_off + img_idx.astype(f32) * float(img_rows)

    roi_ok = ((flat_rois[:, 2] - flat_rois[:, 0]) > 0.0) & (
        (flat_rois[:, 3] - flat_rois[:, 1]) > 0.0
    )
    ext_w = (flat_rois[:, 2] - flat_rois[:, 0]) * scales
    ext_h = (flat_rois[:, 3] - flat_rois[:, 1]) * scales
    size_ovf = (ext_w > V4_COVER_W) | (ext_h > V4_COVER_H)

    _, _, _, slot_roi, slot_ovf, _ = _v4_bin_rois(
        start_h, start_w, hs, ws, row_off, n_ybins, n_xbins, k_sl,
        roi_valid=roi_ok & ~size_ovf, n_spill=0,
    )
    # size-overflow rois were excluded from binning (roi_valid) so they
    # cannot claim slots; they exit purely via the fallback mask
    overflow = (slot_ovf | size_ovf) & roi_ok

    bins = jnp.arange(n_bins, dtype=jnp.int32)
    ybin_b = bins // n_xbins
    xbin_b = bins % n_xbins
    take = jnp.minimum(slot_roi[: n_bins * k_sl], b * r - 1)
    valid = (slot_roi[: n_bins * k_sl] < b * r).astype(f32)
    y_origin = (jnp.repeat(ybin_b, k_sl) * V4_Y_STRIPE).astype(f32) \
        - row_off[take]
    x_origin = (jnp.repeat(xbin_b, k_sl) * V4_X_BLOCK).astype(f32)

    ay = _interp_matrix_k(
        start_h[take], bin_h[take], grid_h[take], hs[take], y_origin,
        V4_RES_H, out_size, s_max, valid,
    )  # (n_bins*K, 7, RES_H)
    ax = _interp_matrix_k(
        start_w[take], bin_w[take], grid_w[take], ws[take], x_origin,
        V4_RES_W, out_size, s_max, valid,
    )  # (n_bins*K, 7, RES_W)
    count = jnp.maximum(grid_h[take] * grid_w[take], 1.0)
    ay = ay / count[:, None, None]

    # AyT block-diagonal (rows (k, h), cols (k, y)); built in dt directly
    eye = jnp.eye(k_sl, dtype=dt)
    ay_t = jnp.swapaxes(
        ay.reshape(n_bins, k_sl, out_size, V4_RES_H), 2, 3
    ).astype(dt)  # (n, K, H, 7)
    ayT_bd = jnp.einsum("nkhy,kq->nkhqy", ay_t, eye).reshape(
        n_ybins, n_xbins, k_sl * V4_RES_H, k_sl * out_size
    )
    # AxT chunks: (n, kx, 96, (k, x))
    axT = jnp.transpose(
        ax.reshape(n_bins, k_sl, out_size, V4_N_X, V4_X_BLOCK).astype(dt),
        (0, 3, 4, 1, 2),
    ).reshape(n_ybins, n_xbins, V4_N_X, V4_X_BLOCK, k_sl * out_size)

    # slot-ordered cotangents, rows (k, y), cols (x, c); empty slots pull
    # the appended zero row
    g_flat = g.reshape(b * r, out_size, out_size, c).astype(dt)
    g_pad = jnp.concatenate(
        [g_flat, jnp.zeros((1, out_size, out_size, c), dt)], axis=0
    )
    g_take = jnp.where(slot_roi[: n_bins * k_sl] < b * r,
                       slot_roi[: n_bins * k_sl], b * r)
    g_tab = g_pad[g_take].reshape(
        n_ybins, n_xbins, k_sl * out_size, out_size * c
    )

    occ = (slot_roi[: n_bins * k_sl].reshape(n_bins, k_sl) < b * r
           ).any(axis=1).astype(jnp.int32)

    geom = dict(w_pad=w_pad, rows_pad=rows_pad, img_rows=img_rows,
                offsets=offsets, b=b)

    n_by = rows_pad // V4_Y_STRIPE
    n_bx = w_pad // V4_X_BLOCK

    if (interpret or jax.default_backend() == "cpu") \
            and not _FORCE_KERNEL_INTERPRET:
        # jnp emulation with identical math (validates tables/binning)
        d = jnp.zeros((w_pad, rows_pad, c), f32)
        ayT_f = ayT_bd.reshape(n_bins, k_sl * V4_RES_H, k_sl * out_size)
        axT_f = axT.reshape(n_bins, V4_N_X, V4_X_BLOCK, k_sl * out_size)
        g_f = g_tab.reshape(n_bins, k_sl * out_size, out_size * c)

        def win_of(nb, dwin):
            # t rows (k, h), cols (x, c)
            t = jnp.dot(ayT_f[nb].astype(f32), g_f[nb].astype(f32))
            t = t.reshape(k_sl, V4_RES_H, out_size, c)
            t = jnp.swapaxes(t, 1, 2).reshape(
                k_sl * out_size, V4_RES_H * c)
            for kx in range(V4_N_X):
                dwin = dwin.at[kx].set(jnp.dot(
                    axT_f[nb, kx].astype(f32), t
                ).reshape(V4_X_BLOCK, V4_RES_H, c))
            return dwin

        for nb in range(n_bins):
            yb, xb = nb // n_xbins, nb % n_xbins
            dwin = jnp.zeros((V4_N_X, V4_X_BLOCK, V4_RES_H, c), f32)
            dwin = jax.lax.cond(
                occ[nb] > 0, lambda dw, i=nb: win_of(i, dw),
                lambda dw: dw, dwin)
            d = jax.lax.dynamic_update_slice(
                d,
                jax.lax.dynamic_slice(
                    d, (xb * V4_X_BLOCK, yb * V4_Y_STRIPE, 0),
                    (V4_RES_W, V4_RES_H, c),
                ) + dwin.reshape(V4_RES_W, V4_RES_H, c),
                (xb * V4_X_BLOCK, yb * V4_Y_STRIPE, 0),
            )
        return d.astype(dt), geom, overflow

    def kernel(occ_ref, *refs):
        ay_refs = refs[0:V4_N_Y]
        ax_refs = refs[V4_N_Y:2 * V4_N_Y]
        g_refs = refs[2 * V4_N_Y:3 * V4_N_Y]
        out_ref = refs[3 * V4_N_Y]
        acc_ref = refs[3 * V4_N_Y + 1]
        t_scr = refs[3 * V4_N_Y + 2: 3 * V4_N_Y + 2 + V4_N_Y]
        by = pl.program_id(0)
        bx = pl.program_id(1)
        acc_ref[...] = jnp.zeros((V4_X_BLOCK, V4_Y_STRIPE, c), f32)

        # Per ky: the kx=1 arm's bin (col = bx-1) is exactly the bin whose
        # t the kx=0 arm computed at the PREVIOUS bx step (grid iterates bx
        # minor), so t is cached in a per-ky scratch across steps — halves
        # the block-diagonal dot count. Consume the scratch BEFORE
        # overwriting it with this step's kx=0 t.
        for ky in range(V4_N_Y):
            row = by - ky
            rok = jnp.logical_and(row >= 0, row < n_ybins)
            rc = jnp.clip(row, 0, n_ybins - 1)

            # kx = 1: consume the previous step's t (bin col = bx-1)
            col1 = bx - 1
            c1ok = jnp.logical_and(col1 >= 0, col1 < n_xbins)
            cc1 = jnp.clip(col1, 0, n_xbins - 1)
            occ1 = occ_ref[rc * n_xbins + cc1] > 0

            @pl.when(jnp.logical_and(jnp.logical_and(rok, c1ok), occ1))
            def _consume(ky=ky, cc1=cc1):
                s2 = t_scr[ky][...]
                axc = ax_refs[ky][0, cc1, 1]  # (96, K*7)
                acc_ref[...] += jnp.dot(
                    axc, s2, preferred_element_type=f32
                ).reshape(V4_X_BLOCK, V4_Y_STRIPE, c)

            # kx = 0: compute this step's t, contribute, store to scratch
            c0ok = jnp.logical_and(bx >= 0, bx < n_xbins)
            cc0 = jnp.clip(bx, 0, n_xbins - 1)
            occ0 = occ_ref[rc * n_xbins + cc0] > 0

            @pl.when(jnp.logical_and(jnp.logical_and(rok, c0ok), occ0))
            def _compute(ky=ky, cc0=cc0):
                ayT = ay_refs[ky][0, cc0]    # (K*RES_H, K*7)
                gb = g_refs[ky][0, cc0]      # (K*7, 7*c)
                # stripe ky of the window: rows k*RES_H + ky*16 + h
                ay_s = ayT.reshape(k_sl, V4_RES_H, k_sl * out_size)[
                    :, ky * V4_Y_STRIPE:(ky + 1) * V4_Y_STRIPE, :
                ].reshape(k_sl * V4_Y_STRIPE, k_sl * out_size)
                t = jnp.dot(ay_s, gb,
                            preferred_element_type=f32).astype(dt)
                # rows (k, h), cols (x, c) -> rows (k, x), cols (h, c)
                t4 = t.reshape(k_sl, V4_Y_STRIPE, out_size, c)
                t4 = jnp.swapaxes(t4, 1, 2)  # (K, 7x, 16, C)
                s2 = t4.reshape(k_sl * out_size, V4_Y_STRIPE * c)
                t_scr[ky][...] = s2
                axc = ax_refs[ky][0, cc0, 0]  # (96, K*7)
                acc_ref[...] += jnp.dot(
                    axc, s2, preferred_element_type=f32
                ).reshape(V4_X_BLOCK, V4_Y_STRIPE, c)

        out_ref[0] = acc_ref[...].astype(out_ref.dtype)

    def row_spec(shape, ky):
        return pl.BlockSpec(
            (1,) + shape,
            functools.partial(
                lambda by, bx, occ, ky, nd:
                    (jnp.clip(by - ky, 0, n_ybins - 1),) + (0,) * nd,
                ky=ky, nd=len(shape),
            ),
            memory_space=pltpu.VMEM,
        )

    in_specs = (
        [row_spec((n_xbins, k_sl * V4_RES_H, k_sl * out_size), ky)
         for ky in range(V4_N_Y)]
        + [row_spec((n_xbins, V4_N_X, V4_X_BLOCK, k_sl * out_size), ky)
           for ky in range(V4_N_Y)]
        + [row_spec((n_xbins, k_sl * out_size, out_size * c), ky)
           for ky in range(V4_N_Y)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_by, n_bx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, V4_X_BLOCK, V4_Y_STRIPE, c),
            lambda by, bx, occ: (bx, 0, by, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((V4_X_BLOCK, V4_Y_STRIPE, c), f32)]
        + [pltpu.VMEM((k_sl * out_size, V4_Y_STRIPE * c), dt)
           for _ in range(V4_N_Y)],
    )

    d_pyr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_bx, V4_X_BLOCK, rows_pad, c), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret or _FORCE_KERNEL_INTERPRET,
    )(occ, *([ayT_bd] * V4_N_Y + [axT] * V4_N_Y + [g_tab] * V4_N_Y))

    d_pyr = d_pyr.reshape(w_pad, rows_pad, c)
    return d_pyr, geom, overflow


def roi_align_fused_batched_grad_feats(
    feats, rois, strides, target_lvls, g,
    out_size=7, sampling_ratio=0, max_samples=4, interpret=False,
):
    """d(loss)/d(feats) via the Pallas window-accumulation kernel +
    UNCONDITIONAL capped folded-scatter fallback for overflow rois
    (HTD_RA_BWD=pallas).

    Exactness contract: kernel-covered rois get the exact gather
    -formulation gradient (same tent matrices as the forward); overflow
    rois (bin capacity / window coverage) go through the exact
    corner-folded scatter up to HTD_RA_BWD_FB(=128) * B rois. Beyond-cap
    rois (pathological crowding far past anything measured: the worst
    clustered stress test overflows 138/1024 at the default 16 slots)
    lose their feature gradient — the same capped-fallback philosophy as
    the forward kernel. A lax.cond-tiered fallback (skip/small/full) was
    built first and REJECTED by measurement: the cond machinery cost
    ~18 ms/extraction on the real train step (2026-08-21 ladder — K=24
    tiered 146.2 ms/iter vs kernel-only 90.3; the unconditional subset
    is ~5 ms), the same serialization lesson as the forward's fb_cond
    full-cap branch.
    """
    from htd_tpu.ops.roi_align import roi_align_pyramid_flat_grad_feats

    b, r = rois.shape[0], rois.shape[1]
    c = feats[0].shape[-1]
    d_pyr, geom, overflow = roi_align_pallas_v4_bwd(
        feats, rois, strides, target_lvls, g,
        out_size=out_size, sampling_ratio=sampling_ratio,
        max_samples=max_samples, interpret=interpret,
    )
    # x-major pyramid -> per-level planes
    d3 = jnp.swapaxes(d_pyr, 0, 1)[: geom["b"] * geom["img_rows"]]
    d3 = d3.reshape(geom["b"], geom["img_rows"], geom["w_pad"], c)
    dfeats = []
    for lvl, f in enumerate(feats):
        hl, wl = int(f.shape[-3]), int(f.shape[-2])
        off = geom["offsets"][lvl]
        dfeats.append(d3[:, off:off + hl, :wl, :].astype(f.dtype))

    cap = min(int(os.environ.get("HTD_RA_BWD_FB", "128")) * b, b * r)
    if cap <= 0:
        return dfeats
    flat_rois = rois.reshape(b * r, 4)
    flat_lvls = target_lvls.reshape(b * r)
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
    g_flat = g.reshape(b * r, out_size, out_size, c)
    top, idx = jax.lax.top_k(overflow.astype(jnp.float32), cap)
    g_sub = jnp.where(top[:, None, None, None] > 0.0,
                      g_flat[idx], 0.0).astype(g_flat.dtype)
    d_fb = roi_align_pyramid_flat_grad_feats(
        feats, flat_rois[idx], strides, flat_lvls[idx], img_idx[idx],
        g_sub, out_size=out_size, sampling_ratio=sampling_ratio,
        max_samples=max_samples,
    )
    return [a + fb.astype(a.dtype) for a, fb in zip(dfeats, d_fb)]


@functools.lru_cache(maxsize=None)
def _trainable_fused_batched(strides, out_size, sampling_ratio, max_samples,
                             interpret, kernel="v4"):
    """custom_vjp wrapper for the batched fused extractor: Pallas forward,
    Pallas window-accumulation backward on TPU (gradients flow into
    features only).

    HTD_RA_BWD selects the backward:
      * pallas (default on TPU) — `roi_align_fused_batched_grad_feats`:
        the transpose-of-forward kernel + capped folded-scatter fallback
        (PERF.md round-5: the folded scatter was the top op of both train
        steps at the ~44 GB/s XLA scatter ceiling);
      * fold (default off-TPU) — corner-folded XLA scatter;
      * vjp — autodiff-of-gather (4x the scatter rows; numerics oracle).
    """
    from htd_tpu.ops.roi_align import (
        roi_align_pyramid_batched as pyramid,
        roi_align_pyramid_batched_grad_feats as grad_feats,
    )

    @jax.custom_vjp
    def fn(feats, rois, target_lvls):
        return roi_align_fused_batched(
            list(feats), rois, strides, target_lvls,
            out_size=out_size, sampling_ratio=sampling_ratio,
            max_samples=max_samples, interpret=interpret, kernel=kernel,
        )

    def fwd(feats, rois, target_lvls):
        return fn(feats, rois, target_lvls), (feats, rois, target_lvls)

    def bwd(res, g):
        feats, rois, target_lvls = res
        mode = os.environ.get("HTD_RA_BWD", "")
        if mode == "":
            mode = "pallas" if jax.default_backend() != "cpu" else "fold"
        if mode == "vjp":
            _, vjp = jax.vjp(
                lambda fs: pyramid(
                    list(fs), rois, strides, target_lvls,
                    out_size=out_size, sampling_ratio=sampling_ratio,
                    max_samples=max_samples,
                ),
                feats,
            )
            (dfeats,) = vjp(g.astype(feats[0].dtype))
            return dfeats, None, None
        if mode == "pallas":
            dfeats = roi_align_fused_batched_grad_feats(
                list(feats), rois, strides, target_lvls, g,
                out_size=out_size, sampling_ratio=sampling_ratio,
                max_samples=max_samples, interpret=interpret,
            )
            return tuple(dfeats), None, None
        dfeats = grad_feats(
            list(feats), rois, strides, target_lvls, g,
            out_size=out_size, sampling_ratio=sampling_ratio,
            max_samples=max_samples,
        )
        return tuple(dfeats), None, None

    fn.defvjp(fwd, bwd)
    return fn


def roi_align_fused_batched_trainable(
    feats, rois, strides, target_lvls,
    out_size=7, sampling_ratio=0, max_samples=4, interpret=False,
    kernel="v4",
):
    """Differentiable (w.r.t. features) batched fused RoIAlign."""
    fn = _trainable_fused_batched(
        tuple(strides), out_size, sampling_ratio, max_samples, interpret,
        kernel,
    )
    return fn(tuple(feats), rois, target_lvls)


@functools.lru_cache(maxsize=None)
def _trainable_fused(strides, out_size, sampling_ratio, max_samples, interpret):
    """custom_vjp wrapper: Pallas forward, XLA-pyramid backward.

    The Pallas kernel has no autodiff rule; gradients only flow into the
    FEATURES (rois are index-like, matching mmcv RoIAlign which defines no
    roi gradient), so the backward pass reuses the mathematically identical
    gather formulation's VJP.
    """
    from htd_tpu.ops.roi_align import roi_align_pyramid as pyramid

    @jax.custom_vjp
    def fn(feats, rois, target_lvls):
        return roi_align_fused(
            list(feats), rois, strides, target_lvls,
            out_size=out_size, sampling_ratio=sampling_ratio,
            max_samples=max_samples, interpret=interpret,
        )

    def fwd(feats, rois, target_lvls):
        return fn(feats, rois, target_lvls), (feats, rois, target_lvls)

    def bwd(res, g):
        feats, rois, target_lvls = res
        _, vjp = jax.vjp(
            lambda fs: pyramid(
                list(fs), rois, strides, target_lvls,
                out_size=out_size, sampling_ratio=sampling_ratio,
                max_samples=max_samples,
            ),
            feats,
        )
        (dfeats,) = vjp(g.astype(feats[0].dtype))
        return dfeats, None, None

    fn.defvjp(fwd, bwd)
    return fn


def roi_align_fused_trainable(
    feats, rois, strides, target_lvls,
    out_size=7, sampling_ratio=0, max_samples=4, interpret=False,
):
    """Differentiable (w.r.t. features) fused RoIAlign."""
    fn = _trainable_fused(
        tuple(strides), out_size, sampling_ratio, max_samples, interpret
    )
    return fn(tuple(feats), rois, target_lvls)
