"""multiclass_nms candidate-cap behavior on dense images (VERDICT round-1
weak #7): with 3000+ above-threshold (roi, class) candidates the capped
top-k selection must still reproduce the uncapped reference outcome.
"""

import pytest

import numpy as np
import jax.numpy as jnp

from htd_tpu.ops.nms import multiclass_nms
from tests.oracles import np_greedy_nms

pytestmark = pytest.mark.fast


def _dense_fixture(seed=0, n_rois=400, n_classes=80, n_hot=3200):
    """~n_hot (roi, class) pairs above score_thr, crowded boxes."""
    rng = np.random.RandomState(seed)
    # clustered boxes so NMS actually suppresses chains
    centers = rng.uniform(80, 720, (40, 2))
    which = rng.randint(0, 40, n_rois)
    cx = centers[which, 0] + rng.normal(0, 12, n_rois)
    cy = centers[which, 1] + rng.normal(0, 12, n_rois)
    w = rng.uniform(30, 90, n_rois)
    h = rng.uniform(30, 90, n_rois)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
    scores = np.full((n_rois, n_classes + 1), 0.01, np.float32)
    hot = rng.choice(n_rois * n_classes, n_hot, replace=False)
    scores[hot // n_classes, hot % n_classes] = rng.uniform(0.06, 0.9, n_hot)
    return boxes.astype(np.float32), scores


def _oracle(boxes, scores, score_thr, iou_thr, max_num):
    """Reference multiclass_nms (bbox_nms.py:7-71) in numpy."""
    n, c1 = scores.shape
    c = c1 - 1
    cls_scores = scores[:, :c]
    mask = cls_scores > score_thr
    roi_idx, cls_idx = np.nonzero(mask)
    b = boxes[roi_idx]
    s = cls_scores[roi_idx, cls_idx]
    if len(b) == 0:
        return np.zeros((0, 5)), np.zeros(0, np.int64)
    off = cls_idx[:, None] * (b.max() + 1)
    keep = np_greedy_nms(b + off, s, iou_thr)
    keep = keep[:max_num]
    return np.concatenate([b[keep], s[keep, None]], 1), cls_idx[keep]


def test_dense_matches_uncapped_oracle():
    boxes, scores = _dense_fixture()
    n_above = int((scores[:, :80] > 0.05).sum())
    assert n_above > 3000  # the adversarial regime the cap must survive

    db, ds, dl, dv = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_thr=0.05, iou_threshold=0.5, max_per_img=100,
        candidate_cap=4096,
    )
    v = np.asarray(dv)
    ob, ol = _oracle(boxes, scores, 0.05, 0.5, 100)
    assert v.sum() == len(ob)
    assert np.allclose(np.asarray(db)[v], ob[:, :4], atol=1e-4)
    assert np.allclose(np.asarray(ds)[v], ob[:, 4], atol=1e-6)
    assert (np.asarray(dl)[v] == ol).all()


def test_default_cap_sufficient_for_top100():
    """The default 2048 cap keeps the top-k by score; on this dense fixture
    the final top-100 is identical to the uncapped run — candidates beyond
    the cap can only matter if >1948 higher-scored ones are all suppressed."""
    boxes, scores = _dense_fixture(seed=1)
    outs = []
    for cap in (2048, 4096):
        db, ds, dl, dv = multiclass_nms(
            jnp.asarray(boxes), jnp.asarray(scores),
            score_thr=0.05, iou_threshold=0.5, max_per_img=100,
            candidate_cap=cap,
        )
        v = np.asarray(dv)
        outs.append((np.asarray(db)[v], np.asarray(ds)[v], np.asarray(dl)[v]))
    (b1, s1, l1), (b2, s2, l2) = outs
    assert len(b1) == len(b2)
    assert np.allclose(b1, b2, atol=1e-5) and (l1 == l2).all()
