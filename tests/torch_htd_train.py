"""Pure-torch mirror of the reference HTD TRAINING forward (losses).

Behavioral spec transcribed from the reference (not from htd_tpu):
  * two_stage.py:107-170 — forward_train: RPN losses + train proposals
    feed the RoI head
  * anchor_head.py:142-269 — get_anchors / anchor_inside_flags /
    _get_targets_single (assign -> sample -> encode -> unmap)
  * anchor_head.py:373-418 — loss_single averaging (num_total_samples =
    total pos+neg across the batch; CE(sigmoid) + SmoothL1 beta 1/9)
  * htd_roi_head.py:217-317 — cascade orchestration (SFA BCE; stage-0
    losses at weight 1; no-grad refine dropping gt rows; stage-1 at 0.5)
  * htd_roi_head.py:143-201 — train-mode _bbox_forward (stage 1 computes
    BA features only for positive rois; reg scattered into zeros; the
    2-images-per-GPU hardcode at :158-182 transcribed verbatim)
  * bbox_head.py:85-186 — _get_target_single (pos-first labels/weights,
    encode pos deltas) and loss (CE avg by #(label_weights>0); SmoothL1
    on positives avg by TOTAL sampled rois)
  * bbox_head.py:227-335 — refine_bboxes / regress_by_class
  * global_context_head.py:394-401 — SFA multi-label BCE x loss_weight
  * max_iou_assigner.py:10-230 — numpy transcription for target derivation

Sampling (WHICH candidates end up in the 256/512-roi blocks) is supplied
by the caller so the exact same sampled sets can be injected into
htd_tpu's `forward_train(..., overrides=...)` — the parity strategy
VERDICT r03 item 2 asked for.
"""

import numpy as np
import torch
import torch.nn.functional as F

from tests.oracles import np_iou
from tests.torch_htd import delta2bbox_t, get_rpn_proposals, grid_anchors

# ---------------------------------------------------------------------------
# coder / assigner primitives
# ---------------------------------------------------------------------------


def bbox2delta_t(proposals, gt, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.)):
    """delta_xywh_bbox_coder.py:78-121 (encode)."""
    px = (proposals[:, 0] + proposals[:, 2]) * 0.5
    py = (proposals[:, 1] + proposals[:, 3]) * 0.5
    pw = proposals[:, 2] - proposals[:, 0]
    ph = proposals[:, 3] - proposals[:, 1]
    gx = (gt[:, 0] + gt[:, 2]) * 0.5
    gy = (gt[:, 1] + gt[:, 3]) * 0.5
    gw = gt[:, 2] - gt[:, 0]
    gh = gt[:, 3] - gt[:, 1]
    deltas = torch.stack(
        [(gx - px) / pw, (gy - py) / ph,
         torch.log(gw / pw), torch.log(gh / ph)], dim=-1)
    means = deltas.new_tensor(means)
    stds = deltas.new_tensor(stds)
    return (deltas - means) / stds


def np_assign_max_iou(boxes, gts, pos_thr, neg_thr, min_pos_iou,
                      match_low_quality):
    """max_iou_assigner.py assign_wrt_overlaps: per box -1 / 0 / g+1."""
    n = boxes.shape[0]
    if gts.shape[0] == 0:
        return np.zeros(n, np.int64)
    iou = np_iou(gts.astype(np.float64), boxes.astype(np.float64))  # (G, N)
    max_iou = iou.max(axis=0)
    argmax = iou.argmax(axis=0)
    assigned = np.full(n, -1, np.int64)
    assigned[(max_iou >= 0) & (max_iou < neg_thr)] = 0
    pos = max_iou >= pos_thr
    assigned[pos] = argmax[pos] + 1
    if match_low_quality:
        for g in range(gts.shape[0]):
            gm = iou[g].max()
            if gm >= min_pos_iou:
                assigned[iou[g] == gm] = g + 1  # gt_max_assign_all, ties incl.
    return assigned


# ---------------------------------------------------------------------------
# losses (reference reductions)
# ---------------------------------------------------------------------------


def rpn_losses_t(cls_scores, bbox_preds, anchors_flat, gts_list,
                 keep_pos, keep_neg, matched_gt, beta=1.0 / 9.0):
    """anchor_head.py:373-418 summed over levels == one flat computation.

    cls_scores/bbox_preds: per-level (B, A*1, H, W) / (B, A*4, H, W);
    keep_pos/keep_neg/matched_gt: (B, A_total) over the flat anchor set.
    """
    b = cls_scores[0].shape[0]
    scores = torch.cat(
        [s.permute(0, 2, 3, 1).reshape(b, -1) for s in cls_scores], dim=1)
    deltas = torch.cat(
        [d.permute(0, 2, 3, 1).reshape(b, -1, 4) for d in bbox_preds], dim=1)
    num_total = float(keep_pos.sum() + keep_neg.sum())
    loss_cls = scores.new_zeros(())
    loss_bbox = scores.new_zeros(())
    for i in range(b):
        kp = keep_pos[i]
        kw = kp | keep_neg[i]
        tgt_cls = kp.float()
        loss_cls = loss_cls + (
            F.binary_cross_entropy_with_logits(
                scores[i], tgt_cls, reduction="none") * kw.float()
        ).sum()
        if kp.any():
            gt_for = gts_list[i][matched_gt[i][kp]]
            tgt = bbox2delta_t(anchors_flat[kp], gt_for)
            diff = (deltas[i][kp] - tgt).abs()
            sl1 = torch.where(diff < beta, 0.5 * diff * diff / beta,
                              diff - 0.5 * beta)
            loss_bbox = loss_bbox + sl1.sum()
    return loss_cls / num_total, loss_bbox / num_total


def sfa_loss_t(pred, gt_labels_list, loss_weight=3.0):
    """global_context_head.py:394-401."""
    targets = pred.new_zeros(pred.size())
    for i, lbl in enumerate(gt_labels_list):
        targets[i, lbl.unique()] = 1.0
    return loss_weight * F.binary_cross_entropy_with_logits(
        pred, targets, reduction="mean")


def bbox_targets_t(samplings, stds, num_classes=80):
    """bbox_head.py:85-139 get_targets (concat over images, pos-first)."""
    labels, label_w, bbox_t, bbox_w = [], [], [], []
    for s in samplings:
        np_, nn_ = s["pos_bboxes"].shape[0], s["neg_bboxes"].shape[0]
        lab = torch.full((np_ + nn_,), num_classes, dtype=torch.long)
        lw = torch.zeros(np_ + nn_)
        bt = torch.zeros(np_ + nn_, 4)
        bw = torch.zeros(np_ + nn_, 4)
        if np_ > 0:
            lab[:np_] = s["pos_gt_labels"]
            lw[:np_] = 1.0  # pos_weight cfg -1 -> 1.0
            bt[:np_] = bbox2delta_t(s["pos_bboxes"], s["pos_gt_bboxes"],
                                    stds=stds)
            bw[:np_] = 1.0
        if nn_ > 0:
            lw[np_:] = 1.0
        labels.append(lab)
        label_w.append(lw)
        bbox_t.append(bt)
        bbox_w.append(bw)
    return (torch.cat(labels), torch.cat(label_w), torch.cat(bbox_t),
            torch.cat(bbox_w))


def bbox_head_loss_t(cls_score, bbox_pred, labels, label_w, bbox_t, bbox_w,
                     num_classes=80, beta=1.0):
    """bbox_head.py:141-186 (reg_class_agnostic branch)."""
    avg = max(float((label_w > 0).sum()), 1.0)
    ce = F.cross_entropy(cls_score, labels, reduction="none")
    loss_cls = (ce * label_w).sum() / avg
    pos = (labels >= 0) & (labels < num_classes)
    diff = (bbox_pred[pos] - bbox_t[pos]).abs()
    sl1 = torch.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    loss_bbox = (sl1 * bbox_w[pos]).sum() / float(bbox_t.shape[0])
    return loss_cls, loss_bbox


# ---------------------------------------------------------------------------
# RPN target selection (assignment here; index CHOICE from the caller)
# ---------------------------------------------------------------------------


def rpn_targets(feats_shapes, img_shape, pad_shape, gts_list,
                strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
                scales=(8,), num=256, pos_fraction=0.5, rng=None):
    """get_anchors + _get_targets_single for each image.

    Returns (anchors_flat, keep_pos, keep_neg, matched_gt) with the flat
    per-level anchor ordering the RPN head's score flattening uses.
    """
    anchors = torch.cat([
        grid_anchors(strides[k], ratios, scales, fh, fw)
        for k, (fh, fw) in enumerate(feats_shapes)
    ])
    a_total = anchors.shape[0]
    # valid flags (anchor_generator.py:273-330): per level, feature cells
    # within ceil(pad_shape / stride) are valid (all 3 anchors alike)
    valid = []
    for k, (fh, fw) in enumerate(feats_shapes):
        vh = min(int(np.ceil(pad_shape[0] / strides[k])), fh)
        vw = min(int(np.ceil(pad_shape[1] / strides[k])), fw)
        vy = torch.zeros(fh, dtype=torch.bool)
        vx = torch.zeros(fw, dtype=torch.bool)
        vy[:vh] = True
        vx[:vw] = True
        vv = (vy[:, None] & vx[None, :]).reshape(-1)
        valid.append(vv[:, None].expand(-1, len(ratios) * len(scales))
                     .reshape(-1))
    valid = torch.cat(valid)
    # anchor_inside_flags (allowed_border=0)
    inside = (valid
              & (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
              & (anchors[:, 2] < img_shape[1]) & (anchors[:, 3] < img_shape[0]))
    inside_np = inside.numpy()

    b = len(gts_list)
    keep_pos = torch.zeros(b, a_total, dtype=torch.bool)
    keep_neg = torch.zeros(b, a_total, dtype=torch.bool)
    matched_gt = torch.zeros(b, a_total, dtype=torch.long)
    pos_cap = int(num * pos_fraction)
    for i in range(b):
        assigned = np_assign_max_iou(
            anchors.numpy()[inside_np], gts_list[i].numpy(),
            pos_thr=0.7, neg_thr=0.3, min_pos_iou=0.3, match_low_quality=True)
        inside_idx = np.nonzero(inside_np)[0]
        pos = inside_idx[assigned > 0]
        neg = inside_idx[assigned == 0]
        if len(pos) > pos_cap:
            pos = rng.choice(pos, pos_cap, replace=False)
        n_neg = min(num - len(pos), len(neg))
        if len(neg) > n_neg:
            neg = rng.choice(neg, n_neg, replace=False)
        keep_pos[i, pos] = True
        keep_neg[i, neg] = True
        sub = {int(a): int(g) - 1 for a, g in zip(inside_idx, assigned)
               if g > 0}
        for a in pos:
            matched_gt[i, a] = sub[int(a)]
    return anchors, keep_pos, keep_neg, matched_gt


# ---------------------------------------------------------------------------
# cascade training orchestration
# ---------------------------------------------------------------------------


def sample_stage(cand_list, gts_list, labels_list, assigner_cfg, num,
                 pos_fraction, rng, add_gt=True):
    """RandomSampler protocol (base_sampler.py:67-102): gt-prepend,
    pos cap num*pos_fraction, negatives fill, pos-first ordering.

    Returns per-image dicts with everything both sides need.
    """
    out = []
    pos_cap = int(num * pos_fraction)
    for i, cand in enumerate(cand_list):
        gts = gts_list[i]
        if add_gt:
            cand = torch.cat([gts, cand], dim=0)
        assigned = np_assign_max_iou(
            cand.numpy(), gts.numpy(), **assigner_cfg)
        if add_gt:
            # add_gt_: prepended gt row g self-assigns to gt g
            assigned[:gts.shape[0]] = np.arange(gts.shape[0]) + 1
        pos = np.nonzero(assigned > 0)[0]
        neg = np.nonzero(assigned == 0)[0]
        if len(pos) > pos_cap:
            pos = np.sort(rng.choice(pos, pos_cap, replace=False))
        n_neg = min(num - len(pos), len(neg))
        if len(neg) > n_neg:
            neg = np.sort(rng.choice(neg, n_neg, replace=False))
        gt_inds = assigned[pos] - 1
        out.append({
            "cand": cand,
            "pos_inds": pos,
            "neg_inds": neg,
            "pos_bboxes": cand[pos],
            "neg_bboxes": cand[neg],
            "pos_gt_inds": gt_inds,
            "pos_gt_bboxes": gts[gt_inds],
            "pos_gt_labels": labels_list[i][gt_inds],
            "pos_is_gt": (pos < gts.shape[0]) if add_gt
            else np.zeros(len(pos), bool),
        })
    return out


def forward_train_t(model, img, img_shape, pad_shape, gts_list, labels_list,
                    rng, rpn_num=256, rcnn_num=512, nms_pre=2000,
                    nms_post=2000):
    """Full reference training forward. Returns (losses, record) where
    `record` carries everything needed to inject the identical sampled
    sets into htd_tpu forward_train."""
    feats = model.extract_feat(img)
    cls_scores, bbox_preds = model.rpn_head(feats)
    feats_shapes = [tuple(s.shape[-2:]) for s in cls_scores]

    # ---- RPN losses
    anchors, keep_pos, keep_neg, matched_gt = rpn_targets(
        feats_shapes, img_shape, pad_shape, gts_list,
        num=rpn_num, rng=rng)
    loss_rpn_cls, loss_rpn_bbox = rpn_losses_t(
        cls_scores, bbox_preds, anchors, gts_list, keep_pos, keep_neg,
        matched_gt)

    # ---- proposals (train rpn_proposal cfg, per image; no grad)
    proposals_list = []
    with torch.no_grad():
        for i in range(img.shape[0]):
            per_lvl_s = [s[i:i + 1] for s in cls_scores]
            per_lvl_d = [d[i:i + 1] for d in bbox_preds]
            dets = get_rpn_proposals(per_lvl_s, per_lvl_d, img_shape,
                                     nms_pre=nms_pre, nms_post=nms_post)
            proposals_list.append(dets[:, :4])

    # ---- SFA
    mc_pred, global_feat = model.roi_head.glbctx_head(feats)
    loss_global = sfa_loss_t(mc_pred, labels_list)

    # ---- stage 0
    samp0 = sample_stage(
        proposals_list, gts_list, labels_list,
        dict(pos_thr=0.5, neg_thr=0.5, min_pos_iou=0.5,
             match_low_quality=False),
        rcnn_num, 0.25, rng)
    rois0 = torch.cat([
        torch.cat([torch.full((s["pos_bboxes"].shape[0]
                               + s["neg_bboxes"].shape[0], 1), float(i)),
                   torch.cat([s["pos_bboxes"], s["neg_bboxes"]])], dim=1)
        for i, s in enumerate(samp0)
    ])
    s0 = model.roi_head._bbox_forward(0, feats, rois0, global_feat)
    s0_cls, s0_reg = s0
    t0 = bbox_targets_t(samp0, stds=(0.1, 0.1, 0.2, 0.2))
    l0_cls, l0_bbox = bbox_head_loss_t(s0_cls, s0_reg, *t0)

    # ---- refine (no grad, drop gt rows) — htd_roi_head.py:282-289
    with torch.no_grad():
        labels0 = t0[0]
        roi_labels = torch.where(labels0 == 80,
                                 s0_cls[:, :-1].argmax(1), labels0)
        del roi_labels  # class-agnostic decode: labels don't alter boxes
        refined_list = []
        off = 0
        for i, s in enumerate(samp0):
            n_i = s["pos_bboxes"].shape[0] + s["neg_bboxes"].shape[0]
            boxes = delta2bbox_t(rois0[off:off + n_i, 1:],
                                 s0_reg[off:off + n_i],
                                 stds=(0.1, 0.1, 0.2, 0.2),
                                 max_shape=img_shape)
            keep = np.ones(n_i, bool)
            keep[:len(s["pos_is_gt"])] = ~s["pos_is_gt"]
            refined_list.append(boxes[torch.from_numpy(keep)])
            off += n_i

    # ---- stage 1
    samp1 = sample_stage(
        refined_list, gts_list, labels_list,
        dict(pos_thr=0.6, neg_thr=0.6, min_pos_iou=0.6,
             match_low_quality=False),
        rcnn_num, 0.25, rng)
    rois1 = torch.cat([
        torch.cat([torch.full((s["pos_bboxes"].shape[0]
                               + s["neg_bboxes"].shape[0], 1), float(i)),
                   torch.cat([s["pos_bboxes"], s["neg_bboxes"]])], dim=1)
        for i, s in enumerate(samp1)
    ])
    pos_rois1 = torch.cat([
        torch.cat([torch.full((s["pos_bboxes"].shape[0], 1), float(i)),
                   s["pos_bboxes"]], dim=1)
        for i, s in enumerate(samp1)
    ])
    # train-mode _bbox_forward stage 1 (htd_roi_head.py:155-186): BA
    # features only for positives; reg scattered into zeros (2-image form)
    extractor = model.roi_head.bbox_roi_extractor[0]
    enhanced_extractor = model.roi_head.bbox_roi_extractor[1]
    head1 = model.roi_head.bbox_head[1]
    bbox_feats = extractor(feats[:4], rois1)
    enhanced = enhanced_extractor(feats[:4], pos_rois1)
    b1_ = rois1[..., 0] == 0
    b2_ = rois1[..., 0] == 1
    b1p = pos_rois1[..., 0] == 0
    b2p = pos_rois1[..., 0] == 1
    num_pos_1 = int(b1p.sum())
    num_pos_2 = int(b2p.sum())
    num_boxs_1 = int(b1_.sum())
    pos_bbox_feat = torch.cat(
        [bbox_feats[:num_pos_1],
         bbox_feats[num_boxs_1:num_boxs_1 + num_pos_2]], dim=0)
    s1_cls, s1_reg_pos = head1(
        bbox_feats, pos_bbox_feat, feats[:4], rois1,
        model.roi_head.bbox_head[0].fc_cls, enhanced, pos_rois1, global_feat)
    s1_reg = s1_cls.new_zeros(s1_cls.shape[0], 4)
    s1_reg[:num_pos_1] = s1_reg_pos[:num_pos_1]
    s1_reg[num_boxs_1:num_boxs_1 + num_pos_2] = s1_reg_pos[num_pos_1:]
    t1 = bbox_targets_t(samp1, stds=(0.05, 0.05, 0.1, 0.1))
    l1_cls, l1_bbox = bbox_head_loss_t(s1_cls, s1_reg, *t1)

    losses = {
        "loss_rpn_cls": loss_rpn_cls,
        "loss_rpn_bbox": loss_rpn_bbox,
        "loss_global": loss_global,
        "s0.loss_cls": l0_cls * 1.0,
        "s0.loss_bbox": l0_bbox * 1.0,
        "s1.loss_cls": l1_cls * 0.5,
        "s1.loss_bbox": l1_bbox * 0.5,
    }
    record = {
        "anchors": anchors,
        "rpn_keep_pos": keep_pos,
        "rpn_keep_neg": keep_neg,
        "rpn_matched_gt": matched_gt,
        "proposals_list": proposals_list,
        "samp0": samp0,
        "refined_list": refined_list,
        "samp1": samp1,
    }
    return losses, record
