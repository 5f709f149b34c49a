"""Assignment + sampling as fixed-capacity jittable ops.

Behavioral specs:
  * MaxIoUAssigner: reference max_iou_assigner.py:10-230 — per box:
    -1 (ignore) / 0 (negative, max IoU < neg_thr) / g+1 (positive,
    max IoU >= pos_thr, argmax gt); optional low-quality matching assigns
    each gt's max-IoU boxes (ties included, later gts override earlier).
  * RandomSampler: reference random_sampler.py + base_sampler.py:67-102 —
    GT boxes optionally prepended as proposals, positives capped at
    num * pos_fraction and drawn uniformly, negatives fill the remainder,
    output ordered positives-first (the ordering HTD's stage-1 exploits).

The TPU versions keep every shape static: candidates are padded arrays with
validity masks, the sampled roi block has a fixed size `num` whose first
`pos_cap` slots hold (up to) the positives. Randomness comes from uniform
PRNG keys instead of randperm — same uniform-subset distribution.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from htd_tpu.config import AssignerConfig, SamplerConfig
from htd_tpu.ops.boxes import bbox_overlaps

Array = jnp.ndarray


class AssignResult(NamedTuple):
    gt_inds: Array     # (N,) int32: -1 ignore / 0 negative / g+1 positive
    max_iou: Array     # (N,) float32
    labels: Array      # (N,) int32 gt class for positives, -1 otherwise


def assign_max_iou(
    boxes: Array,          # (N, 4)
    box_valid: Array,      # (N,) bool
    gt_boxes: Array,       # (G, 4)
    gt_valid: Array,       # (G,) bool
    gt_labels: Array,      # (G,) int32
    cfg: AssignerConfig,
) -> AssignResult:
    n = boxes.shape[0]
    g = gt_boxes.shape[0]
    iou = bbox_overlaps(gt_boxes, boxes)  # (G, N)
    pair_valid = gt_valid[:, None] & box_valid[None, :]
    # masked pairs contribute IoU 0 (matching the reference, which simply has
    # no such rows): boxes overlapping no valid gt become negatives
    iou = jnp.where(pair_valid, iou, 0.0)

    max_iou = jnp.max(iou, axis=0, initial=0.0)
    argmax_gt = jnp.argmax(iou, axis=0)

    assigned = jnp.full((n,), -1, jnp.int32)
    assigned = jnp.where((max_iou >= 0) & (max_iou < cfg.neg_iou_thr), 0, assigned)
    assigned = jnp.where(
        max_iou >= cfg.pos_iou_thr, argmax_gt.astype(jnp.int32) + 1, assigned
    )

    if cfg.match_low_quality:
        gt_max = jnp.max(iou, axis=1)  # (G,)
        ok = (gt_max >= cfg.min_pos_iou) & gt_valid
        hit = (iou == gt_max[:, None]) & ok[:, None]  # (G, N) incl. ties
        any_hit = jnp.any(hit, axis=0)
        # later gts override earlier ones (reference loop order)
        last_g = g - 1 - jnp.argmax(hit[::-1], axis=0)
        assigned = jnp.where(any_hit, last_g.astype(jnp.int32) + 1, assigned)

    assigned = jnp.where(box_valid, assigned, -1)
    pos = assigned > 0
    labels = jnp.where(
        pos, gt_labels[jnp.maximum(assigned - 1, 0)], -1
    ).astype(jnp.int32)
    return AssignResult(assigned, max_iou, labels)


class SampleResult(NamedTuple):
    """Fixed-size sample of `num` rois, positives occupying the first slots."""

    rois: Array          # (num, 4)
    valid: Array         # (num,) bool — slot holds a real sample
    is_pos: Array        # (num,) bool
    is_gt: Array         # (num,) bool — positive that came from a prepended gt
    gt_inds: Array       # (num,) int32 0-based matched gt (0 where not pos)
    labels: Array        # (num,) int32 gt label for pos, num_classes for neg
    pos_gt_boxes: Array  # (num, 4) matched gt box (0 where not pos)


def _select_k(key: Array, mask: Array, k: int) -> Tuple[Array, Array]:
    """Uniformly pick up to k True positions of `mask`. Returns (idx, ok)."""
    scores = jnp.where(
        mask, jax.random.uniform(key, mask.shape, minval=0.0, maxval=1.0), -1.0
    )
    top, idx = jax.lax.top_k(scores, k)
    return idx.astype(jnp.int32), top >= 0.0


def sample_from_injection(
    cand_boxes: Array,     # (N, 4) candidate rois (gt-prepended when the
                           # sampler would prepend gts)
    gt_boxes: Array,       # (G, 4)
    gt_labels: Array,      # (G,)
    idx: Array,            # (num,) int32 into cand_boxes
    valid: Array,          # (num,) bool
    is_pos: Array,         # (num,) bool — positives MUST occupy the first slots
    is_gt: Array,          # (num,) bool
    gt_inds: Array,        # (num,) int32 0-based matched gt (0 where not pos)
    num_classes: int,
) -> SampleResult:
    """Build a SampleResult from externally-chosen indices.

    Test hook for torch-oracle training parity (VERDICT r03 item 2): both
    implementations receive IDENTICAL sampled indices, sidestepping RNG, so
    loss terms and gradients can be compared directly. The injected layout
    must follow the pos-first convention of `sample_random`.
    """
    rois = cand_boxes[idx]
    labels = jnp.where(
        is_pos, gt_labels[gt_inds], num_classes
    ).astype(jnp.int32)
    pos_gt_boxes = jnp.where(is_pos[:, None], gt_boxes[gt_inds], 0.0)
    return SampleResult(
        rois=rois,
        valid=valid,
        is_pos=is_pos,
        is_gt=is_gt,
        gt_inds=jnp.where(is_pos, gt_inds, 0).astype(jnp.int32),
        labels=labels,
        pos_gt_boxes=pos_gt_boxes,
    )


def sample_random(
    key: Array,
    boxes: Array,          # (N, 4) candidate proposals
    box_valid: Array,      # (N,)
    gt_boxes: Array,       # (G, 4)
    gt_valid: Array,       # (G,)
    gt_labels: Array,      # (G,)
    assigner_cfg: AssignerConfig,
    cfg: SamplerConfig,
    pos_cap: int,
    num_classes: int,
) -> SampleResult:
    """Assign + sample one image's proposals into a fixed (num,) block."""
    if cfg.add_gt_as_proposals:
        cand_boxes = jnp.concatenate([gt_boxes, boxes], axis=0)
        cand_valid = jnp.concatenate([gt_valid, box_valid], axis=0)
    else:
        cand_boxes, cand_valid = boxes, box_valid

    ar = assign_max_iou(
        cand_boxes, cand_valid, gt_boxes, gt_valid, gt_labels, assigner_cfg
    )
    gt_inds = ar.gt_inds
    if cfg.add_gt_as_proposals:
        # prepended gts self-assign (add_gt_: gt row g -> gt g), provided valid
        g = gt_boxes.shape[0]
        self_idx = jnp.arange(g, dtype=jnp.int32) + 1
        gt_inds = gt_inds.at[:g].set(jnp.where(gt_valid, self_idx, -1))
        is_gt_row = jnp.concatenate(
            [gt_valid, jnp.zeros_like(box_valid)], axis=0
        )
    else:
        is_gt_row = jnp.zeros_like(cand_valid)

    key_pos, key_neg = jax.random.split(key)
    pos_idx, pos_ok = _select_k(key_pos, gt_inds > 0, pos_cap)
    neg_idx, neg_ok = _select_k(key_neg, gt_inds == 0, cfg.num)

    npos = jnp.sum(pos_ok.astype(jnp.int32))
    slot = jnp.arange(cfg.num, dtype=jnp.int32)
    in_pos = slot < npos
    neg_slot = jnp.clip(slot - npos, 0, cfg.num - 1)
    pos_slot = jnp.clip(slot, 0, pos_cap - 1)
    idx = jnp.where(in_pos, pos_idx[pos_slot], neg_idx[neg_slot])
    valid = jnp.where(in_pos, True, neg_ok[neg_slot])

    rois = cand_boxes[idx]
    sel_gt = jnp.maximum(gt_inds[idx] - 1, 0)
    is_pos = in_pos & valid
    labels = jnp.where(
        is_pos,
        gt_labels[sel_gt],
        num_classes,
    ).astype(jnp.int32)
    labels = jnp.where(valid, labels, num_classes)
    pos_gt_boxes = jnp.where(is_pos[:, None], gt_boxes[sel_gt], 0.0)
    is_gt = is_pos & is_gt_row[idx]
    return SampleResult(
        rois=rois,
        valid=valid,
        is_pos=is_pos,
        is_gt=is_gt,
        gt_inds=jnp.where(is_pos, sel_gt, 0).astype(jnp.int32),
        labels=labels,
        pos_gt_boxes=pos_gt_boxes,
    )
