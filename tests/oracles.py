"""Slow, independent numpy oracles for op parity tests.

These re-derive the mathematical definitions (greedy NMS, aligned RoIAlign,
delta coding, anchor grids) with explicit loops so the jnp implementations
are checked against straight-line math, not against themselves.
"""

import math

import numpy as np


def np_iou(a, b, eps=1e-6):
    """Pairwise IoU, (M,4) x (N,4) -> (M,N)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = np.maximum(area_a[:, None] + area_b[None, :] - inter, eps)
    return inter / union


def np_greedy_nms(boxes, scores, iou_thr):
    """Classic greedy NMS. Returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        iou = np_iou(boxes[i : i + 1], boxes)[0]
        suppressed |= iou > iou_thr
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def np_soft_nms(boxes, scores, iou_thr, min_score, method="linear", sigma=0.5):
    """Soft-NMS; returns (indices, decayed-at-selection scores)."""
    scores = scores.astype(np.float64).copy()
    live = scores >= min_score
    keep, kept_scores = [], []
    while live.any():
        i = int(np.argmax(np.where(live, scores, -np.inf)))
        keep.append(i)
        kept_scores.append(scores[i])
        live[i] = False
        iou = np_iou(boxes[i : i + 1], boxes)[0]
        if method == "linear":
            decay = np.where(iou > iou_thr, 1.0 - iou, 1.0)
        else:
            decay = np.exp(-(iou ** 2) / sigma)
        scores = np.where(live, scores * decay, scores)
        live &= scores >= min_score
    return np.asarray(keep, np.int64), np.asarray(kept_scores)


def np_roi_align(feat_hwc, rois, spatial_scale, out_size, sampling_ratio):
    """Exact mmcv aligned=True RoIAlign (adaptive grid when ratio==0)."""
    h, w, c = feat_hwc.shape
    r = rois.shape[0]
    out = np.zeros((r, out_size, out_size, c), np.float64)
    feat = feat_hwc.astype(np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = max(y, 0.0)
        x = max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= h - 1:
            y_high = y_low = h - 1
            y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= w - 1:
            x_high = x_low = w - 1
            x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        return (
            hy * hx * feat[y_low, x_low]
            + hy * lx * feat[y_low, x_high]
            + ly * hx * feat[y_high, x_low]
            + ly * lx * feat[y_high, x_high]
        )

    for ri in range(r):
        x1, y1, x2, y2 = rois[ri]
        start_w = x1 * spatial_scale - 0.5
        start_h = y1 * spatial_scale - 0.5
        roi_w = (x2 - x1) * spatial_scale
        roi_h = (y2 - y1) * spatial_scale
        bin_w = roi_w / out_size
        bin_h = roi_h / out_size
        if sampling_ratio > 0:
            gw = gh = sampling_ratio
        else:
            gw = int(np.ceil(roi_w / out_size))
            gh = int(np.ceil(roi_h / out_size))
        count = max(gw * gh, 1)
        for py in range(out_size):
            for px in range(out_size):
                acc = np.zeros(c)
                for iy in range(gh):
                    y = start_h + py * bin_h + (iy + 0.5) * bin_h / max(gh, 1)
                    for ix in range(gw):
                        x = start_w + px * bin_w + (ix + 0.5) * bin_w / max(gw, 1)
                        acc += bilinear(y, x)
                out[ri, py, px] = acc / count
    return out


def np_base_anchors(stride, ratios, scales, center_offset=0.0):
    """(A, 4) base anchors, ratio-major ordering."""
    anchors = []
    for r in ratios:
        for s in scales:
            w = stride * s / math.sqrt(r)
            h = stride * s * math.sqrt(r)
            xc = center_offset * stride
            yc = center_offset * stride
            anchors.append([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2])
    return np.asarray(anchors, np.float32)


def np_delta2bbox(rois, deltas, means, stds, max_shape=None, wh_clip=16 / 1000):
    means = np.asarray(means)
    stds = np.asarray(stds)
    d = deltas * stds + means
    dx, dy, dw, dh = d[:, 0], d[:, 1], d[:, 2], d[:, 3]
    mr = abs(math.log(wh_clip))
    dw, dh = np.clip(dw, -mr, mr), np.clip(dh, -mr, mr)
    px = (rois[:, 0] + rois[:, 2]) / 2
    py = (rois[:, 1] + rois[:, 3]) / 2
    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    gw, gh = pw * np.exp(dw), ph * np.exp(dh)
    gx, gy = px + pw * dx, py + ph * dy
    boxes = np.stack(
        [gx - gw / 2, gy - gh / 2, gx + gw / 2, gy + gh / 2], axis=-1
    )
    if max_shape is not None:
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, max_shape[1])
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, max_shape[0])
    return boxes


def np_roi_align_fast(feat_hwc, rois, spatial_scale, out_size, sampling_ratio):
    """Vectorized np_roi_align (separable bilinear per roi).

    Numerically identical to the loop version (tested in
    test_roi_align.py::test_fast_oracle_matches_loop); used by the torch
    mirror so the e2e parity suite stays fast.
    """
    h, w, c = feat_hwc.shape
    feat = feat_hwc.astype(np.float64)
    out = np.zeros((rois.shape[0], out_size, out_size, c), np.float64)

    def axis_samples(start, bin_sz, grid, size):
        # coords (out_size * grid,)
        p = np.arange(out_size)[:, None]
        i = np.arange(grid)[None, :]
        coord = start + (p + (i + 0.5) / grid) * bin_sz
        coord = coord.reshape(-1)
        inside = (coord >= -1.0) & (coord <= size)
        cc = np.maximum(coord, 0.0)
        low = np.minimum(np.floor(cc), size - 1).astype(np.int64)
        high = np.minimum(low + 1, size - 1)
        frac = np.where(cc >= size - 1, 0.0, cc - low)
        return low, high, frac, inside

    for ri in range(rois.shape[0]):
        x1, y1, x2, y2 = rois[ri]
        start_w = x1 * spatial_scale - 0.5
        start_h = y1 * spatial_scale - 0.5
        roi_w = (x2 - x1) * spatial_scale
        roi_h = (y2 - y1) * spatial_scale
        bin_w, bin_h = roi_w / out_size, roi_h / out_size
        if sampling_ratio > 0:
            gw = gh = sampling_ratio
        else:
            gw = max(int(np.ceil(roi_w / out_size)), 1)
            gh = max(int(np.ceil(roi_h / out_size)), 1)
        yl, yh, fy, iny = axis_samples(start_h, bin_h, gh, h)
        xl, xh, fx, inx = axis_samples(start_w, bin_w, gw, w)
        # separable bilinear: rows first, then cols
        rowv = (1 - fy)[:, None, None] * feat[yl] + fy[:, None, None] * feat[yh]
        rowv = np.where(iny[:, None, None], rowv, 0.0)
        vals = (
            (1 - fx)[None, :, None] * rowv[:, xl]
            + fx[None, :, None] * rowv[:, xh]
        )
        vals = np.where(inx[None, :, None], vals, 0.0)
        vals = vals.reshape(out_size, gh, out_size, gw, c)
        out[ri] = vals.sum(axis=(1, 3)) / (gh * gw)
    return out
