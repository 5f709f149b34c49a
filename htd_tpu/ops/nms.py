"""Static-shape NMS family for TPU.

Behavioral spec (greedy hard-NMS, score-descending, suppress IoU > thr):
mmcv-full 1.2.1 `nms` / `batched_nms` / `soft_nms` as used by the reference
at rpn_head.py:167 (level-offset batched NMS), bbox_nms.py:7-71
(multiclass NMS) and the R-101 configs' soft-NMS test cfg.

Everything here is jittable with static output capacities. "Absent" slots
are encoded as score = -inf; callers carry validity masks alongside.

The implementation is an iterative argmax loop (exactly equivalent to
sorted greedy NMS, including tie-breaking by first index, which matches
torch's stable descending sort). A Pallas blocked-bitmask kernel can later
replace the inner loop; the public contract stays the same.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

NEG_INF = jnp.float32(-jnp.inf)


def _pairwise_iou_single(box: Array, boxes: Array, eps: float = 1e-6) -> Array:
    """IoU of one (4,) box against (N, 4) boxes."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = jnp.maximum(area1 + area2 - inter, eps)
    return inter / union


def nms(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    tile: int = 256,
) -> Tuple[Array, Array, Array]:
    """Greedy hard NMS over padded inputs (exact, TPU-friendly).

    Dispatches to the blocked algorithm (sort + tile-wise suppression,
    O(N/tile) sequential steps) for large inputs, or the simple iterative
    argmax loop for small ones. Both are exactly equivalent to sorted
    greedy NMS including tie-breaking by original index.

    Args:
      boxes: (N, 4). scores: (N,) with -inf marking invalid/padded entries.
      iou_threshold: suppress j when IoU(i, j) > thr for an earlier-kept i.
      max_out: static output capacity.

    Returns:
      keep_idx: (max_out,) int32 indices into the input (0 where invalid),
      keep_score: (max_out,) scores of kept boxes (-inf where invalid),
      keep_valid: (max_out,) bool.
    """
    if boxes.shape[0] > 2 * tile:
        return nms_blocked(boxes, scores, iou_threshold, max_out, tile)
    return nms_argmax(boxes, scores, iou_threshold, max_out)


def nms_argmax(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
) -> Tuple[Array, Array, Array]:
    """Iterative-argmax greedy NMS (one sequential step per output)."""
    n = boxes.shape[0]
    scores = scores.astype(jnp.float32)

    def body(i, state):
        live, keep_idx, keep_score = state
        j = jnp.argmax(live)
        s = live[j]
        valid = s > NEG_INF
        iou = _pairwise_iou_single(boxes[j], boxes)
        suppress = iou > iou_threshold
        live = jnp.where(valid & suppress, NEG_INF, live)
        live = live.at[j].set(NEG_INF)
        keep_idx = keep_idx.at[i].set(jnp.where(valid, j, 0).astype(jnp.int32))
        keep_score = keep_score.at[i].set(s)
        return live, keep_idx, keep_score

    live0 = scores
    keep_idx0 = jnp.zeros((max_out,), jnp.int32)
    keep_score0 = jnp.full((max_out,), NEG_INF, jnp.float32)
    _, keep_idx, keep_score = jax.lax.fori_loop(
        0, min(max_out, n), body, (live0, keep_idx0, keep_score0)
    )
    return keep_idx, keep_score, keep_score > NEG_INF


def nms_blocked(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    max_out: int,
    tile: int = 256,
) -> Tuple[Array, Array, Array]:
    """Exact greedy NMS via score-sorted tiles.

    Algorithm (the classic TPU NMS decomposition): sort by score descending;
    march over tiles of `tile` boxes. Each tile is first suppressed by all
    surviving earlier boxes (one masked (tile x N) IoU test), then resolved
    internally by iterating live' = init & ~(upper_adj^T live) to its unique
    fixpoint (= greedy), which a while_loop reaches in a handful of steps.
    Sequential depth is O(N/tile + fixpoint iters) instead of O(max_out).
    """
    n = boxes.shape[0]
    num_tiles = (n + tile - 1) // tile
    pad = num_tiles * tile - n
    f32 = jnp.float32

    scores = scores.astype(f32)
    order = jnp.argsort(-scores)  # stable: ties keep original index order
    sboxes = boxes[order].astype(f32)
    sscores = scores[order]
    if pad:
        sboxes = jnp.concatenate([sboxes, jnp.zeros((pad, 4), f32)], axis=0)
        sscores = jnp.concatenate([sscores, jnp.full((pad,), NEG_INF, f32)], axis=0)
        order = jnp.concatenate([order, jnp.zeros((pad,), order.dtype)], axis=0)
    nn = num_tiles * tile
    live0 = sscores > NEG_INF

    area = (sboxes[:, 2] - sboxes[:, 0]) * (sboxes[:, 3] - sboxes[:, 1])

    def tile_iou(tb, ta):
        """(tile, 4) vs (N, 4) IoU."""
        lt = jnp.maximum(tb[:, None, :2], sboxes[None, :, :2])
        rb = jnp.minimum(tb[:, None, 2:], sboxes[None, :, 2:])
        wh = jnp.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        union = jnp.maximum(ta[:, None] + area[None, :] - inter, 1e-6)
        return inter / union

    pos = jnp.arange(nn)

    def body(i, live):
        s = i * tile
        tb = jax.lax.dynamic_slice(sboxes, (s, 0), (tile, 4))
        ta = jax.lax.dynamic_slice(area, (s,), (tile,))
        tl0 = jax.lax.dynamic_slice(live0, (s,), (tile,))
        iou = tile_iou(tb, ta)  # (tile, N)
        adj = iou > iou_threshold

        # cross-suppression by surviving earlier boxes
        earlier = live & (pos < s)
        sup = jnp.any(adj & earlier[None, :], axis=1)
        init = tl0 & ~sup

        # within-tile resolution to the greedy fixpoint
        tpos = jnp.arange(tile)
        adj_tile = jax.lax.dynamic_slice(adj, (0, s), (tile, tile))
        upper = adj_tile & (tpos[:, None] < tpos[None, :])  # k suppresses j>k

        def cond(st):
            prev, cur = st
            return jnp.any(prev != cur)

        def step(st):
            _, cur = st
            nxt = init & ~jnp.any(upper & cur[:, None], axis=0)
            return cur, nxt

        _, resolved = jax.lax.while_loop(cond, step, (~init, init))
        return jax.lax.dynamic_update_slice(live, resolved, (s,))

    live = jax.lax.fori_loop(0, num_tiles, body, live0)

    keep_key = jnp.where(live, sscores, NEG_INF)
    top_s, top_i = jax.lax.top_k(keep_key, max_out)
    keep_valid = top_s > NEG_INF
    keep_idx = jnp.where(keep_valid, order[top_i], 0).astype(jnp.int32)
    return keep_idx, top_s, keep_valid


def batched_nms(
    boxes: Array,
    scores: Array,
    ids: Array,
    iou_threshold: float,
    max_out: int,
) -> Tuple[Array, Array, Array]:
    """Category/level-aware NMS via the coordinate-offset trick.

    `ids` (N,) int: boxes with different ids never suppress each other.
    Same return contract as :func:`nms`.
    """
    max_coord = jnp.max(jnp.where(jnp.isfinite(scores)[:, None], boxes, 0.0))
    offsets = ids.astype(boxes.dtype)[:, None] * (max_coord + 1.0)
    return nms(boxes + offsets, scores, iou_threshold, max_out)


def soft_nms(
    boxes: Array,
    scores: Array,
    iou_threshold: float = 0.3,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",
    max_out: int = 100,
) -> Tuple[Array, Array, Array]:
    """Soft-NMS (linear / gaussian decay), mmcv-semantics.

    Each round picks the max-score live box, emits it, then decays the
    scores of overlapping live boxes; boxes decayed below `min_score`
    become dead. Same return contract as :func:`nms`.
    """
    assert method in ("linear", "gaussian", "naive"), method
    scores = scores.astype(jnp.float32)

    def body(i, state):
        live, keep_idx, keep_score = state
        j = jnp.argmax(live)
        s = live[j]
        valid = s > NEG_INF
        iou = _pairwise_iou_single(boxes[j], boxes)
        if method == "linear":
            decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(iou * iou) / sigma)
        else:  # naive == hard nms
            decay = jnp.where(iou > iou_threshold, 0.0, 1.0)
        new = live * decay
        new = jnp.where(new < min_score, NEG_INF, new)
        live = jnp.where(valid, new, live)
        live = live.at[j].set(NEG_INF)
        keep_idx = keep_idx.at[i].set(jnp.where(valid, j, 0).astype(jnp.int32))
        keep_score = keep_score.at[i].set(s)
        return live, keep_idx, keep_score

    live0 = jnp.where(scores < min_score, NEG_INF, scores)
    keep_idx0 = jnp.zeros((max_out,), jnp.int32)
    keep_score0 = jnp.full((max_out,), NEG_INF, jnp.float32)
    _, keep_idx, keep_score = jax.lax.fori_loop(
        0, max_out, body, (live0, keep_idx0, keep_score0)
    )
    return keep_idx, keep_score, keep_score > NEG_INF


def multiclass_nms(
    boxes: Array,
    scores: Array,
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    candidate_cap: int = 2048,
    use_soft_nms: bool = False,
    soft_min_score: float = 0.05,
) -> Tuple[Array, Array, Array, Array]:
    """Multi-class NMS over class-agnostic boxes.

    Behavioral spec: reference bbox_nms.py:7-71 — per-class suppression via
    class-offset batched NMS, candidates filtered by `score_thr`, top
    `max_per_img` kept in score order.

    Args:
      boxes: (N, 4) shared across classes (class-agnostic regression).
      scores: (N, C+1); the last column (background) is dropped.
      candidate_cap: static cap on (roi, class) candidates entering NMS;
        candidates are chosen by top score, so results equal the reference
        whenever the number of above-threshold candidates that can influence
        the top `max_per_img` fits the cap (2048 >> 100 in practice).

    Returns:
      det_boxes (max_per_img, 4), det_scores (max_per_img,),
      det_labels (max_per_img,) int32 in [0, C), det_valid (max_per_img,) bool.
    """
    n, c1 = scores.shape
    num_classes = c1 - 1
    cls_scores = scores[:, :num_classes]  # (N, C)

    flat_scores = cls_scores.reshape(-1)  # idx = roi * C + cls
    flat_scores = jnp.where(flat_scores > score_thr, flat_scores, NEG_INF)

    cap = min(candidate_cap, n * num_classes)
    if os.environ.get("HTD_FLAT_TOPK", "0") == "1":
        top_scores, top_idx = jax.lax.top_k(flat_scores, cap)
    else:
        # exact two-stage top-k: the flat lax.top_k over the 80k (roi,
        # class) scores lowers to a 0.7 ms full sort on TPU (xplane
        # 2026-08-18); the tiled form sorts 10 tiles batched instead
        from htd_tpu.ops.topk import top_k_tiled

        top_scores, top_idx = top_k_tiled(flat_scores, cap)
    roi_idx = top_idx // num_classes
    cls_idx = (top_idx % num_classes).astype(jnp.int32)
    cand_boxes = boxes[roi_idx]

    if use_soft_nms:
        keep, keep_score, keep_valid = soft_nms(
            _offset_by_ids(cand_boxes, top_scores, cls_idx),
            top_scores,
            iou_threshold=iou_threshold,
            min_score=soft_min_score,
            method="linear",
            max_out=max_per_img,
        )
    else:
        keep, keep_score, keep_valid = batched_nms(
            cand_boxes, top_scores, cls_idx, iou_threshold, max_per_img
        )

    det_boxes = jnp.where(keep_valid[:, None], cand_boxes[keep], 0.0)
    det_scores = jnp.where(keep_valid, keep_score, 0.0)
    det_labels = jnp.where(keep_valid, cls_idx[keep], 0)
    return det_boxes, det_scores, det_labels, keep_valid


def _offset_by_ids(boxes: Array, scores: Array, ids: Array) -> Array:
    max_coord = jnp.max(jnp.where(jnp.isfinite(scores)[:, None], boxes, 0.0))
    return boxes + ids.astype(boxes.dtype)[:, None] * (max_coord + 1.0)
