import numpy as np

import pytest

from htd_tpu.data.coco_eval import evaluate_coco_map

pytestmark = pytest.mark.fast


def _det(boxes, scores, labels):
    return (
        np.asarray(boxes, np.float64).reshape(-1, 4),
        np.asarray(scores, np.float64),
        np.asarray(labels, np.int64),
    )


def _gt(boxes, labels, crowd=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    labels = np.asarray(labels, np.int64)
    crowd = (
        np.zeros(len(boxes), bool) if crowd is None else np.asarray(crowd, bool)
    )
    return boxes, labels, crowd


def test_perfect_detections():
    gt = {1: _gt([[10, 10, 50, 50], [60, 60, 90, 90]], [0, 1])}
    det = {1: _det([[10, 10, 50, 50], [60, 60, 90, 90]], [0.9, 0.8], [0, 1])}
    m = evaluate_coco_map(det, gt, num_classes=2)
    assert abs(m["mAP"] - 1.0) < 1e-6
    assert abs(m["mAP_50"] - 1.0) < 1e-6
    assert abs(m["AR@100"] - 1.0) < 1e-6


def test_half_recall_with_fp():
    # 2 gts, 1 perfect det + 1 far-away fp with lower score:
    # 101-pt AP = 51/101 (precision 1.0 up to recall 0.5)
    gt = {1: _gt([[10, 10, 50, 50], [100, 100, 150, 150]], [0, 0])}
    det = {
        1: _det(
            [[10, 10, 50, 50], [200, 200, 220, 220]], [0.9, 0.8], [0, 0]
        )
    }
    m = evaluate_coco_map(det, gt, num_classes=1)
    assert abs(m["mAP"] - 51 / 101) < 1e-6
    assert abs(m["AR@100"] - 0.5) < 1e-6


def test_localization_quality_affects_high_ious():
    # det with IoU ~0.6 counts at thr .5/.55/.6 but not above
    gt = {1: _gt([[0, 0, 100, 100]], [0])}
    det = {1: _det([[0, 0, 100, 75]], [0.9], [0])}  # IoU = 0.75
    m = evaluate_coco_map(det, gt, num_classes=1)
    assert abs(m["mAP_50"] - 1.0) < 1e-6
    assert abs(m["mAP_75"] - 1.0) < 1e-6  # IoU 0.75 >= 0.75? matched at thr<0.75
    # thresholds .5,...,.7 pass (5 of 10... IoU==0.75 passes thr 0.75 too)
    assert abs(m["mAP"] - 6 / 10) < 1e-6


def test_crowd_region_is_ignore_not_fp():
    gt = {1: _gt([[0, 0, 50, 50], [60, 0, 200, 200]], [0, 0], crowd=[False, True])}
    # det1 matches real gt; det2 falls inside the crowd region (IoF high) -> ignored
    det = {1: _det([[0, 0, 50, 50], [70, 10, 120, 60]], [0.9, 0.8], [0, 0])}
    m = evaluate_coco_map(det, gt, num_classes=1)
    assert abs(m["mAP"] - 1.0) < 1e-6


def test_unmatched_det_is_fp_even_with_crowd_far():
    gt = {1: _gt([[0, 0, 50, 50]], [0])}
    det = {1: _det([[0, 0, 50, 50], [300, 300, 350, 350]], [0.5, 0.9], [0, 0])}
    # fp has HIGHER score -> precision at the tp is 0.5 for every recall point
    m = evaluate_coco_map(det, gt, num_classes=1)
    assert abs(m["mAP"] - 0.5) < 1e-6


def test_area_ranges():
    # one small (20x20=400 < 32^2) and one large gt
    gt = {1: _gt([[0, 0, 20, 20], [100, 100, 300, 300]], [0, 0])}
    det = {1: _det([[0, 0, 20, 20]], [0.9], [0])}  # only the small one found
    m = evaluate_coco_map(det, gt, num_classes=1)
    assert abs(m["mAP_s"] - 1.0) < 1e-6
    assert abs(m["mAP_l"] - 0.0) < 1e-6


def test_missing_class_is_nan_excluded():
    gt = {1: _gt([[0, 0, 50, 50]], [0])}
    det = {1: _det([[0, 0, 50, 50]], [0.9], [0])}
    # class 1 has no gt anywhere -> excluded from the mean
    m = evaluate_coco_map(det, gt, num_classes=2)
    assert abs(m["mAP"] - 1.0) < 1e-6


def test_duplicate_detections_penalized():
    gt = {1: _gt([[0, 0, 50, 50]], [0])}
    det = {1: _det([[0, 0, 50, 50], [1, 1, 50, 50]], [0.9, 0.8], [0, 0])}
    # second det on same gt is a fp; AP = 1.0 (all recall reached at p=1.0)
    m = evaluate_coco_map(det, gt, num_classes=1)
    assert abs(m["mAP"] - 1.0) < 1e-6


def test_native_matches_numpy_path():
    """The C++ matching core must agree with the numpy fallback."""
    import htd_tpu.native as native_pkg
    from htd_tpu.data import coco_eval as ce

    native = native_pkg.get_coco_match()
    assert native is not None, "native coco_match failed to build"

    rng = np.random.RandomState(3)
    gt, det = {}, {}
    for img in range(4):
        g = rng.uniform(0, 200, (6, 4))
        g[:, 2:] = g[:, :2] + rng.uniform(5, 80, (6, 2))
        crowd = rng.uniform(0, 1, 6) > 0.8
        gl = rng.randint(0, 3, 6)
        gt[img] = (g, gl, crowd)
        d = rng.uniform(0, 200, (20, 4))
        d[:, 2:] = d[:, :2] + rng.uniform(5, 80, (20, 2))
        # overlay some near-hits
        d[:6] = g + rng.normal(0, 3, (6, 4))
        det[img] = (d, rng.uniform(0, 1, 20), rng.randint(0, 3, 20))

    m_native = ce.evaluate_coco_map(det, gt, num_classes=3)
    # force the numpy path
    native_pkg._mod, native_pkg._failed = None, True
    try:
        m_numpy = ce.evaluate_coco_map(det, gt, num_classes=3)
    finally:
        native_pkg._failed = False
        native_pkg._mod = native
    for k in m_native:
        if np.isnan(m_native[k]) and np.isnan(m_numpy[k]):
            continue
        assert abs(m_native[k] - m_numpy[k]) < 1e-9, (k, m_native[k], m_numpy[k])
    assert not np.isnan(m_native["mAP"])
