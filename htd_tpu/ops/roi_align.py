"""RoIAlign for TPU (XLA gather composition; Pallas variant later).

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
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def roi_align(
    feat: Array,
    rois: Array,
    spatial_scale: float,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 2,
) -> Array:
    """Align (R, out, out, C) features for (R, 4) xyxy rois on one (H, W, C) map.

    `sampling_ratio > 0` uses exactly that many samples per bin per axis
    (then `max_samples` must equal it); `sampling_ratio == 0` uses the
    mmcv adaptive rule clamped to `max_samples`.
    """
    h, w, c = feat.shape
    r = rois.shape[0]
    oh = ow = out_size
    s = int(sampling_ratio) if sampling_ratio > 0 else int(max_samples)
    f32 = jnp.float32

    rois = rois.astype(f32)
    start_w = rois[:, 0] * spatial_scale - 0.5
    start_h = rois[:, 1] * spatial_scale - 0.5
    roi_w = (rois[:, 2] - rois[:, 0]) * spatial_scale
    roi_h = (rois[:, 3] - rois[:, 1]) * spatial_scale
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
    # masks of live samples along each axis: (R, out, S)
    mx = ix[None, None, :] < grid_w.astype(f32)[:, None, None]
    my = ix[None, None, :] < grid_h.astype(f32)[:, None, None]

    # Bilinear interpolation weights + indices with mmcv border rules.
    def axis_interp(coord, size):
        """Returns (low_idx, high_idx, l_frac) per coordinate."""
        inside = (coord >= -1.0) & (coord <= size)
        cc = jnp.maximum(coord, 0.0)
        low = jnp.floor(cc).astype(jnp.int32)
        low = jnp.minimum(low, size - 1)
        high = jnp.minimum(low + 1, size - 1)
        frac = jnp.where(cc >= size - 1, 0.0, cc - low.astype(f32))
        return low, high, frac, inside

    x_low, x_high, lx, x_in = axis_interp(x, w)
    y_low, y_high, ly, y_in = axis_interp(y, h)
    hx, hy = 1.0 - lx, 1.0 - ly

    feat_flat = feat.reshape(h * w, c)

    # Combine everything into flattened sample tables of shape
    # (R, oh, S, ow, S) by broadcasting y-(bins,samples) against x-(bins,samples).
    def bcast_y(a):  # (R, oh, S) -> (R, oh, S, 1, 1)
        return a[:, :, :, None, None]

    def bcast_x(a):  # (R, ow, S) -> (R, 1, 1, ow, S)
        return a[:, None, None, :, :]

    sample_valid = bcast_y(y_in & my) & bcast_x(x_in & mx)

    w_ll = bcast_y(hy) * bcast_x(hx)
    w_lh = bcast_y(hy) * bcast_x(lx)
    w_hl = bcast_y(ly) * bcast_x(hx)
    w_hh = bcast_y(ly) * bcast_x(lx)

    i_ll = bcast_y(y_low) * w + bcast_x(x_low)
    i_lh = bcast_y(y_low) * w + bcast_x(x_high)
    i_hl = bcast_y(y_high) * w + bcast_x(x_low)
    i_hh = bcast_y(y_high) * w + bcast_x(x_high)

    zero = jnp.zeros((), f32)

    def gather_weighted(idx, wgt):
        v = jnp.take(feat_flat, idx.reshape(-1), axis=0)
        v = v.reshape(idx.shape + (c,))
        wm = jnp.where(sample_valid, wgt, zero)
        return v * wm[..., None].astype(feat.dtype)

    acc = (
        gather_weighted(i_ll, w_ll)
        + gather_weighted(i_lh, w_lh)
        + gather_weighted(i_hl, w_hl)
        + gather_weighted(i_hh, w_hh)
    )
    # Sum over the sample axes -> (R, oh, ow, C), divide by live-sample count.
    summed = acc.sum(axis=(2, 4))
    count = jnp.maximum((grid_h * grid_w).astype(f32), 1.0)
    out = summed / count[:, None, None, None].astype(feat.dtype)
    return out


def roi_align_multilevel(
    feats: Sequence[Array],
    rois: Array,
    strides: Sequence[int],
    target_lvls: Array,
    out_size: int = 7,
    sampling_ratio: int = 0,
    max_samples: int = 4,
) -> Array:
    """SingleRoIExtractor-style level-dispatched RoIAlign.

    Behavioral spec: reference single_level_roi_extractor.py:81-98 — each roi
    is aligned only on its mapped FPN level. On TPU we compute the alignment
    densely on every level and select per roi, keeping shapes static.

    Args:
      feats: per-level (H_l, W_l, C) features.
      rois: (R, 4); target_lvls: (R,) int32 level per roi.
    Returns (R, out, out, C).
    """
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
