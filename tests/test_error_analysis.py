"""coco_error_analysis + robustness_eval on synthetic fixtures (CPU).

Checks that precision_curves is consistent with evaluate_coco_map (the
curves' means ARE the APs), that the error-decomposition stack is
monotone (each successively forgiven error source can only raise AP),
that the tool end-to-end writes plots from a standard COCO results json,
and the P/mPC/rPC aggregation math of robustness_eval.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from htd_tpu.data.coco_eval import (
    IOU_THRS,
    evaluate_coco_map,
    precision_curves,
)

pytestmark = pytest.mark.fast


def _fixture(seed=0, n_imgs=8, n_cats=3, gts_per_img=6, dets_per_img=12):
    rng = np.random.RandomState(seed)
    gt, dets = {}, {}
    for img in range(n_imgs):
        gb = []
        for gi in range(gts_per_img):
            x, y = rng.uniform(0, 400, 2)
            # include genuinely small (area < 32^2) boxes so the 'small'
            # area range has ground truth
            w, h = rng.uniform(8, 30, 2) if gi % 3 == 0 else rng.uniform(20, 120, 2)
            gb.append([x, y, x + w, y + h])
        gb = np.asarray(gb)
        gl = rng.randint(0, n_cats, gts_per_img)
        gc = rng.rand(gts_per_img) < 0.15
        gt[img] = (gb, gl, gc)
        db, ds_, dl = [], [], []
        for i in range(dets_per_img):
            if i < gts_per_img and rng.rand() < 0.7:
                # jittered copy of a gt (sometimes wrong class)
                b = gb[i] + rng.normal(0, 6, 4)
                c = gl[i] if rng.rand() < 0.8 else rng.randint(0, n_cats)
            else:
                x, y = rng.uniform(0, 400, 2)
                w, h = rng.uniform(20, 120, 2)
                b = np.array([x, y, x + w, y + h])
                c = rng.randint(0, n_cats)
            db.append(b)
            ds_.append(rng.rand())
            dl.append(c)
        dets[img] = (np.asarray(db), np.asarray(ds_), np.asarray(dl, np.int64))
    return gt, dets, n_cats


def test_precision_curves_match_evaluate_coco_map():
    gt, dets, n_cats = _fixture(3)
    curves = precision_curves(dets, gt, list(range(n_cats)))  # (T,R,K,A)
    # mAP = mean over (T, K) of curve means, 'all' area, nan where no gt
    per_cell = np.where(
        (curves == -1).all(axis=1), np.nan, curves.mean(axis=1)
    )  # (T,K,A)
    expect = evaluate_coco_map(dets, gt, num_classes=n_cats)
    assert np.nanmean(per_cell[:, :, 0]) == pytest.approx(expect["mAP"], abs=1e-9)
    assert np.nanmean(per_cell[0, :, 0]) == pytest.approx(expect["mAP_50"], abs=1e-9)
    assert np.nanmean(per_cell[5, :, 0]) == pytest.approx(expect["mAP_75"], abs=1e-9)
    assert np.nanmean(per_cell[:, :, 1]) == pytest.approx(
        expect["mAP_s"], abs=1e-9, nan_ok=True)
    assert float(IOU_THRS[0]) == 0.5 and float(IOU_THRS[5]) == 0.75


def test_error_stack_monotone():
    from coco_error_analysis import analyze_category

    gt, dets, n_cats = _fixture(11)
    same_super = {0, 1}  # cats 0,1 share a supercategory
    all_cats = set(range(n_cats))
    for k in range(n_cats):
        ps = analyze_category(dets, gt, k, same_super, all_cats)  # (7,R,A)
        aps = ps[:, :, 0].mean(axis=1)
        for t in range(6):
            assert aps[t + 1] >= aps[t] - 1e-9, (k, aps)
        assert aps[6] == pytest.approx(1.0)


def test_error_analysis_end_to_end(tmp_path):
    """COCO-format jsons in -> pngs out."""
    from coco_error_analysis import analyze_results

    rng = np.random.RandomState(0)
    images, anns, results = [], [], []
    aid = 1
    for img in range(4):
        images.append(dict(id=img, width=640, height=480,
                           file_name=f"{img}.jpg"))
        for _ in range(4):
            x, y = rng.uniform(0, 300, 2)
            w, h = rng.uniform(30, 100, 2)
            cat = int(rng.randint(1, 3))
            anns.append(dict(id=aid, image_id=img, category_id=cat,
                             bbox=[x, y, w, h], area=w * h, iscrowd=0))
            aid += 1
            results.append(dict(image_id=img, category_id=cat,
                                bbox=[x + 2, y - 2, w, h],
                                score=float(rng.rand())))
    gt_json = dict(
        images=images, annotations=anns,
        categories=[dict(id=1, name="cat", supercategory="animal"),
                    dict(id=2, name="dog", supercategory="animal")],
    )
    ann_file = tmp_path / "ann.json"
    res_file = tmp_path / "res.json"
    ann_file.write_text(json.dumps(gt_json))
    res_file.write_text(json.dumps(results))
    out = tmp_path / "plots"
    ps_sum = analyze_results(str(res_file), str(ann_file), str(out))
    assert ps_sum is not None
    pngs = sorted(os.listdir(out))
    # 4 area plots per category + 4 allclass
    assert len(pngs) == 12 and "bbox-allclass-allarea.png" in pngs


def test_robustness_eval_math(tmp_path):
    from robustness_eval import get_results

    mk = lambda v: {"bbox": {"mAP": v, "mAP_50": v * 2, "mAP_75": v,
                             "mAP_s": v, "mAP_m": v, "mAP_l": v,
                             "AR@100": v}}
    agg = {
        "gaussian_noise": {"0": mk(0.4), "1": mk(0.3), "2": mk(0.2)},
        "contrast": {"0": mk(0.4), "1": mk(0.1), "2": mk(0.1)},
        "speckle_noise": {"0": mk(0.4), "1": mk(0.05), "2": mk(0.05)},  # holdout
    }
    f = tmp_path / "rob.json"
    f.write_text(json.dumps(agg))
    out = get_results(str(f), prints="all", aggregate="benchmark")
    assert out["P"]["mAP"] == pytest.approx(0.4)
    # benchmark aggregate excludes the holdout corruption
    assert out["mPC"]["mAP"] == pytest.approx(np.mean([0.3, 0.2, 0.1, 0.1]))
    assert out["rPC"]["mAP"] == pytest.approx(out["mPC"]["mAP"] / 0.4)
    out_all = get_results(str(f), prints="mPC", aggregate="all")
    assert out_all["mPC"]["mAP"] == pytest.approx(
        np.mean([0.3, 0.2, 0.1, 0.1, 0.05, 0.05]))
