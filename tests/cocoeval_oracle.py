"""Test-only transcription of pycocotools COCOeval (bbox protocol).

Transcribed from the published pycocotools cocoeval.py logic
(computeIoU / evaluateImg / accumulate / summarize), which is exactly what
the reference's CocoDataset.evaluate runs (reference datasets/coco.py:363-544).
Used as the independent oracle for htd_tpu.data.coco_eval — a from-scratch
implementation of the same protocol with a different decomposition.

Pure python/numpy; boxes here are xyxy (converted to the xywh/area form
pycocotools uses internally).
"""

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _iou(dt_xyxy, gt_xyxy, iscrowd):
    """maskUtils.iou for bboxes: IoU, or intersection/det-area for crowd."""
    d = np.asarray(dt_xyxy, np.float64)
    g = np.asarray(gt_xyxy, np.float64)
    da = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    ga = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = np.where(iscrowd[None, :], da[:, None], da[:, None] + ga[None, :] - inter)
    out = np.zeros_like(inter)
    np.divide(inter, union, out=out, where=union > 0)
    return out


def evaluate_img(dt_boxes, dt_scores, gt_boxes, gt_crowd, area_rng, max_det):
    """cocoeval.COCOeval.evaluateImg transcription for one (img, cat).

    Returns None if no dts and no gts, else a dict with the fields
    accumulate needs.
    """
    T = len(IOU_THRS)
    if len(dt_boxes) == 0 and len(gt_boxes) == 0:
        return None
    g_area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    gt_ig0 = gt_crowd | (g_area < area_rng[0]) | (g_area > area_rng[1])
    gtind = np.argsort(gt_ig0, kind="mergesort")
    gt_boxes = gt_boxes[gtind]
    gt_ig = gt_ig0[gtind].astype(np.float64)
    iscrowd = gt_crowd[gtind]

    dtind = np.argsort(-dt_scores, kind="mergesort")
    dt_boxes = dt_boxes[dtind][:max_det]
    dt_scores = dt_scores[dtind][:max_det]

    ious = (
        _iou(dt_boxes, gt_boxes, iscrowd)
        if len(dt_boxes) and len(gt_boxes)
        else np.zeros((len(dt_boxes), len(gt_boxes)))
    )
    G, D = len(gt_boxes), len(dt_boxes)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dt_ig = np.zeros((T, D))
    if len(gt_boxes) and len(dt_boxes):
        for tind, t in enumerate(IOU_THRS):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1 + m  # gt "id" (1-based, nonzero = matched)
                gtm[tind, m] = 1 + dind
    d_area = (dt_boxes[:, 2] - dt_boxes[:, 0]) * (dt_boxes[:, 3] - dt_boxes[:, 1])
    a = (d_area < area_rng[0]) | (d_area > area_rng[1])
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.tile(a, (T, 1))))
    return dict(
        dtMatches=dtm,
        dtScores=dt_scores,
        gtIgnore=gt_ig,
        dtIgnore=dt_ig,
    )


def evaluate(detections, groundtruth, num_classes, max_det=100):
    """Full COCOeval bbox run. Same input convention as
    htd_tpu.data.coco_eval.evaluate_coco_map.
    Returns the same metric dict keys."""
    img_ids = sorted(groundtruth.keys())
    T, R = len(IOU_THRS), len(REC_THRS)
    A = len(AREA_RNGS)
    K = num_classes
    precision = -np.ones((T, R, K, A))
    recall = -np.ones((T, K, A))

    for k in range(K):
        per_img = {}
        for img in img_ids:
            gb, gl, gc = groundtruth[img]
            db, ds, dl = detections.get(
                img, (np.zeros((0, 4)), np.zeros(0), np.zeros(0))
            )
            per_img[img] = (db[dl == k], ds[dl == k], gb[gl == k],
                            gc[gl == k].astype(bool))
        for a, rng_ in enumerate(AREA_RNGS.values()):
            E = [
                evaluate_img(db, ds, gb, gc, rng_, max_det)
                for (db, ds, gb, gc) in (per_img[i] for i in img_ids)
            ]
            E = [e for e in E if e is not None]
            if not E:
                continue
            dt_scores = np.concatenate([e["dtScores"] for e in E])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
            gt_ig = np.concatenate([e["gtIgnore"] for e in E])
            npig = int((gt_ig == 0).sum())
            if npig == 0:
                continue
            tps = np.logical_and(dtm, np.logical_not(dt_ig))
            fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for t in range(T):
                tp, fp = tp_sum[t], fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                recall[t, k, a] = rc[-1] if nd else 0
                pr = pr.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                q = np.zeros(R)
                idx = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(idx):
                    if pi < nd:
                        q[ri] = pr[pi]
                precision[t, :, k, a] = q

    def _summ(arr):
        v = arr[arr > -1]
        return float(v.mean()) if v.size else float("nan")

    return {
        "mAP": _summ(precision[:, :, :, 0]),
        "mAP_50": _summ(precision[0, :, :, 0]),
        "mAP_75": _summ(precision[5, :, :, 0]),
        "mAP_s": _summ(precision[:, :, :, 1]),
        "mAP_m": _summ(precision[:, :, :, 2]),
        "mAP_l": _summ(precision[:, :, :, 3]),
        "AR@100": _summ(recall[:, :, 0]),
    }
