"""Dataset -> batched inference -> COCO mAP plumbing on a synthetic mini
COCO dataset written to disk (images + annotations json)."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from htd_tpu.apis import evaluate_dataset, inference_detector
from htd_tpu.data.coco import CocoDataset, grouped_batches, make_train_batch
from htd_tpu.models.detector import HTDDetector
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("minicoco")
    img_dir = root / "images"
    os.makedirs(img_dir, exist_ok=True)
    import cv2

    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    for i in range(5):
        h, w = (60, 90) if i % 2 == 0 else (90, 60)
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        name = f"img{i}.png"
        cv2.imwrite(str(img_dir / name), img)
        images.append(dict(id=i + 1, file_name=name, height=h, width=w))
        for _ in range(2):
            x, y = rng.uniform(2, w / 2), rng.uniform(2, h / 2)
            bw, bh = rng.uniform(8, w / 3), rng.uniform(8, h / 3)
            annotations.append(
                dict(
                    id=ann_id, image_id=i + 1,
                    category_id=int(rng.choice([1, 3])),
                    bbox=[float(x), float(y), float(bw), float(bh)],
                    area=float(bw * bh), iscrowd=0,
                )
            )
            ann_id += 1
    cats = [dict(id=1, name="a"), dict(id=3, name="b")]
    ann_file = root / "ann.json"
    with open(ann_file, "w") as f:
        json.dump(dict(images=images, annotations=annotations, categories=cats), f)
    return str(ann_file), str(img_dir)


def test_dataset_parsing(mini_coco):
    ann, img_root = mini_coco
    ds = CocoDataset(ann, img_root, test_mode=True)
    assert len(ds) == 5
    assert ds.cat2label == {1: 0, 3: 1}
    gt = ds.groundtruth()
    assert set(gt) == {1, 2, 3, 4, 5}
    # aspect grouping: batches are orientation-homogeneous
    for batch in grouped_batches(ds, 2, shuffle=False):
        assert len({r.landscape for r in batch}) == 1


def test_train_batch_building(mini_coco):
    ann, img_root = mini_coco
    ds = CocoDataset(ann, img_root, test_mode=False)
    records = next(grouped_batches(ds, 2, shuffle=True, seed=0))
    b = make_train_batch(ds, records, scale=(96, 64), max_gt=8)
    assert b["images"].shape[0] == len(records)
    assert b["images"].shape[1] % 32 == 0 and b["images"].shape[2] % 32 == 0
    assert b["gt_valid"].any()
    # boxes are inside the resized shape
    for i in range(len(records)):
        v = b["gt_valid"][i]
        boxes = b["gt_boxes"][i][v]
        hh, ww = b["img_shapes"][i]
        assert (boxes[:, 2] <= ww + 1e-3).all() and (boxes[:, 3] <= hh + 1e-3).all()


@pytest.mark.slow
def test_evaluate_dataset_end_to_end(mini_coco):
    ann, img_root = mini_coco
    ds = CocoDataset(ann, img_root, test_mode=True)
    cfg = tiny_config()
    model = HTDDetector(cfg)
    init = jax.jit(lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf))
    variables = init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
        jnp.asarray([[64.0, 96.0]]), jnp.ones((1, 4)),
    )
    metrics = evaluate_dataset(
        model, variables, ds, batch_size=3, scale=(96, 64), log_every=0
    )
    assert set(metrics) >= {"mAP", "mAP_50", "mAP_s", "AR@100"}
    # random weights -> mAP is a number in [0, 1] (likely ~0) and not NaN
    assert 0.0 <= metrics["mAP"] <= 1.0 or np.isnan(metrics["mAP"])

    img = np.zeros((60, 90, 3), np.uint8)
    boxes, scores, labels = inference_detector(model, variables, img, scale=(96, 64))
    assert boxes.shape[1] == 4


@pytest.mark.slow
@pytest.mark.multichip
def test_evaluate_dataset_mesh_matches_single_device(mini_coco):
    """Multi-chip batch-parallel eval (mesh over the 8 virtual devices) ==
    single-device eval, detection for detection (multi_gpu_test analog)."""
    ann, img_root = mini_coco
    ds = CocoDataset(ann, img_root, test_mode=True)
    cfg = tiny_config()
    model = HTDDetector(cfg)
    init = jax.jit(lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf))
    variables = init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
        jnp.asarray([[64.0, 96.0]]), jnp.ones((1, 4)),
    )
    from htd_tpu.parallel.mesh import make_mesh

    m1, d1 = evaluate_dataset(
        model, variables, ds, batch_size=4, scale=(96, 64), log_every=0,
        return_detections=True,
    )
    m8, d8 = evaluate_dataset(
        model, variables, ds, batch_size=4, scale=(96, 64), log_every=0,
        return_detections=True, mesh=make_mesh(4),
    )
    assert set(d1) == set(d8)
    for k in d1:
        for a, b in zip(d1[k], d8[k]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )


@pytest.mark.slow
def test_evaluate_proposals_end_to_end(mini_coco):
    """Standalone RPN proposal-recall eval (reference 'proposal_fast')."""
    from htd_tpu.apis import evaluate_proposals

    ann, img_root = mini_coco
    ds = CocoDataset(ann, img_root, test_mode=True)
    cfg = tiny_config()
    model = HTDDetector(cfg)
    init = jax.jit(lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf))
    variables = init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
        jnp.asarray([[64.0, 96.0]]), jnp.ones((1, 4)),
    )
    metrics = evaluate_proposals(
        model, variables, ds, batch_size=3, scale=(96, 64),
        proposal_nums=(10, 100),
    )
    assert set(metrics) == {"AR@10", "AR@100"}
    for v in metrics.values():
        assert 0.0 <= v <= 1.0
    # more proposals can only improve recall
    assert metrics["AR@100"] >= metrics["AR@10"] - 1e-9
