import numpy as np

import pytest

from htd_tpu.data.mean_ap import average_precision, eval_map, eval_recalls

pytestmark = pytest.mark.fast


def test_average_precision_area():
    # single det matching the single gt: recall [1.0], precision [1.0]
    assert abs(average_precision(np.array([1.0]), np.array([1.0])) - 1.0) < 1e-9
    # recall .5 at precision 1: AP (area) = 0.5
    assert abs(average_precision(np.array([0.5]), np.array([1.0])) - 0.5) < 1e-9


def test_average_precision_11points():
    ap = average_precision(np.array([0.5]), np.array([1.0]), mode="11points")
    assert abs(ap - 6 / 11) < 1e-9  # recall thresholds 0.0-0.5 inclusive


def test_eval_map_perfect():
    dets = [[np.array([[0, 0, 10, 10, 0.9]])]]
    anns = [dict(bboxes=np.array([[0.0, 0, 10, 10]]), labels=np.array([0]))]
    mAP, res = eval_map(dets, anns)
    assert abs(mAP - 1.0) < 1e-9
    assert res[0]["num_gts"] == 1


def test_eval_map_with_fp_and_ignore():
    dets = [[np.array([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8], [100, 100, 120, 120, 0.7]])]]
    anns = [dict(
        bboxes=np.array([[0.0, 0, 10, 10]]),
        labels=np.array([0]),
        bboxes_ignore=np.array([[50.0, 50, 60, 60]]),
    )]
    mAP, res = eval_map(dets, anns)
    # det2 hits the ignore region (neither tp nor fp); det3 is a fp after the tp
    assert abs(mAP - 1.0) < 1e-9


def test_eval_recalls():
    gts = [np.array([[0.0, 0, 10, 10], [50, 50, 80, 80]])]
    props = [np.array([[0.0, 0, 10, 10, 0.9], [48, 50, 80, 82, 0.8], [200, 200, 210, 210, 0.7]])]
    r = eval_recalls(gts, props, proposal_nums=(1, 3), iou_thrs=(0.5, 0.9))
    assert abs(r[1, 0] - 1.0) < 1e-9   # top-3 @ IoU .5: both gts found
    assert abs(r[0, 0] - 0.5) < 1e-9   # top-1: only the first
    assert r[1, 1] <= 1.0
