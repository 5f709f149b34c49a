import numpy as np
import pytest

import jax
import jax.numpy as jnp

from htd_tpu.config import AssignerConfig, SamplerConfig
from htd_tpu.train.sampling import assign_max_iou, sample_random

pytestmark = pytest.mark.fast


def _pad(a, n, dim0):
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: len(a)] = a
    return out


def test_assign_basic():
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],   # IoU 1.0 with gt0
            [0.0, 0.0, 10.0, 9.0],    # IoU 0.9 with gt0
            [30.0, 30.0, 40.0, 40.0], # IoU 0 -> negative
            [0.0, 0.0, 10.0, 5.0],    # IoU 0.5 -> between 0.3 and 0.7: ignore
        ]
    )
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    cfg = AssignerConfig(pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3, match_low_quality=False)
    r = assign_max_iou(boxes, jnp.ones(4, bool), gt, jnp.ones(1, bool), jnp.array([5]), cfg)
    np.testing.assert_array_equal(np.asarray(r.gt_inds), [1, 1, 0, -1])
    np.testing.assert_array_equal(np.asarray(r.labels), [5, 5, -1, -1])


def test_assign_low_quality_match():
    # no box reaches pos_iou_thr for gt1, but low-quality match rescues its argmax
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [20.0, 20.0, 30.0, 26.0],  # best for gt1 with IoU ~0.43
        ]
    )
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 34.0]])
    cfg = AssignerConfig(0.7, 0.3, min_pos_iou=0.3, match_low_quality=True)
    r = assign_max_iou(boxes, jnp.ones(2, bool), gt, jnp.ones(2, bool), jnp.array([1, 2]), cfg)
    np.testing.assert_array_equal(np.asarray(r.gt_inds), [1, 2])
    cfg2 = AssignerConfig(0.7, 0.3, min_pos_iou=0.3, match_low_quality=False)
    r2 = assign_max_iou(boxes, jnp.ones(2, bool), gt, jnp.ones(2, bool), jnp.array([1, 2]), cfg2)
    # without low-quality matching box1 (IoU .43 in the ignore band) is -1
    np.testing.assert_array_equal(np.asarray(r2.gt_inds), [1, -1])


def test_assign_empty_gt():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    gt = jnp.zeros((3, 4))
    cfg = AssignerConfig(0.5, 0.5, 0.5, False)
    r = assign_max_iou(
        boxes, jnp.ones(1, bool), gt, jnp.zeros(3, bool), jnp.zeros(3, jnp.int32), cfg
    )
    np.testing.assert_array_equal(np.asarray(r.gt_inds), [0])  # all negative


def test_assign_invalid_boxes_excluded():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
    gt = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    cfg = AssignerConfig(0.5, 0.5, 0.5, False)
    r = assign_max_iou(
        boxes, jnp.array([True, False]), gt, jnp.ones(1, bool), jnp.array([0]), cfg
    )
    np.testing.assert_array_equal(np.asarray(r.gt_inds), [1, -1])


def test_sampler_layout_and_counts(rng):
    n, g = 40, 3
    boxes = rng.uniform(0, 80, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(4, 40, (n, 2))
    gt = np.array(
        [[0, 0, 20, 20], [30, 30, 60, 60], [50, 5, 75, 30]], np.float32
    )
    labels = np.array([3, 7, 9], np.int32)
    acfg = AssignerConfig(0.5, 0.5, 0.5, False)
    scfg = SamplerConfig(num=16, pos_fraction=0.25, add_gt_as_proposals=True)
    res = sample_random(
        jax.random.PRNGKey(0),
        jnp.asarray(boxes), jnp.ones(n, bool),
        jnp.asarray(gt), jnp.ones(g, bool), jnp.asarray(labels),
        acfg, scfg, pos_cap=4, num_classes=80,
    )
    is_pos = np.asarray(res.is_pos)
    valid = np.asarray(res.valid)
    lab = np.asarray(res.labels)
    # pos-first layout, capped by pos_cap
    npos = is_pos.sum()
    assert 1 <= npos <= 4  # gts guarantee >= 1 positive candidate
    assert is_pos[:npos].all() and not is_pos[npos:].any()
    assert valid.all()  # plenty of negatives available
    # labels: positives carry gt classes, negatives carry background (80)
    assert set(lab[is_pos]) <= {3, 7, 9}
    assert (lab[~is_pos] == 80).all()
    # positive boxes must overlap their gt with IoU >= 0.5
    rois = np.asarray(res.rois)
    pgt = np.asarray(res.pos_gt_boxes)
    from tests.oracles import np_iou
    for i in range(npos):
        assert np_iou(rois[i : i + 1], pgt[i : i + 1])[0, 0] >= 0.5 - 1e-6
    # gt-derived positives are flagged (gts are candidates, not guaranteed picks)
    is_gt = np.asarray(res.is_gt)
    assert is_gt.sum() <= g
    assert not is_gt[~is_pos].any()


def test_sampler_no_gt_prepend(rng):
    n = 30
    boxes = rng.uniform(0, 50, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + 5
    gt = np.array([[200, 200, 240, 240]], np.float32)  # no proposal overlaps
    acfg = AssignerConfig(0.7, 0.3, 0.3, True)
    scfg = SamplerConfig(num=8, pos_fraction=0.5, add_gt_as_proposals=False)
    res = sample_random(
        jax.random.PRNGKey(1),
        jnp.asarray(boxes), jnp.ones(n, bool),
        jnp.asarray(gt), jnp.ones(1, bool), jnp.array([0], jnp.int32),
        acfg, scfg, pos_cap=4, num_classes=80,
    )
    is_pos = np.asarray(res.is_pos)
    # low-quality match rescues the best proposal for the gt (even at low IoU
    # it's the argmax); with IoU 0 < min_pos_iou nothing is rescued
    assert is_pos.sum() == 0
    assert np.asarray(res.valid).all()
    assert not np.asarray(res.is_gt).any()
