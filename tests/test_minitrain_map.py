"""Mini-train convergence with mAP (VERDICT r03 item 7).

Beyond the single-image overfit test: train the micro config FROM SCRATCH
on a ~50-image synthetic detectable dataset (solid class-colored
rectangles on noise — learnable by a conv net, unlike pure-noise batches)
for 300 steps and assert:
  * val mAP@0.5 (own evaluator, data/mean_ap.py) rises above 0.5
    (prototype measured 0.91; threshold leaves margin for seed drift);
  * total loss and each classification-type loss term trend down
    (the reg terms are excluded by design: s1.loss_bbox starts at 0 —
    no stage-1 positives until the RPN finds objects — and rises before
    it falls; the reference shows the same shape early in training).

Reference eval-in-train loop: mmdet/core/evaluation/eval_hooks.py:8.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from htd_tpu.data.mean_ap import eval_map
from htd_tpu.train.train_step import (
    TrainBatch,
    create_train_state,
    make_jitted_train_step,
)
from tests.tiny import tiny_config


def make_dataset(rng, n, h=64, w=96, max_gt=8):
    """Detectable synthetic set: solid class-colored rectangles on noise."""
    images = rng.normal(0, 0.3, (n, h, w, 3)).astype(np.float32)
    gt_boxes = np.zeros((n, max_gt, 4), np.float32)
    gt_labels = np.zeros((n, max_gt), np.int32)
    gt_valid = np.zeros((n, max_gt), bool)
    for i in range(n):
        for g in range(rng.randint(1, 4)):
            bw, bh = rng.uniform(14, 34), rng.uniform(14, 34)
            x1 = rng.uniform(0, w - bw - 1)
            y1 = rng.uniform(0, h - bh - 1)
            cls = rng.randint(0, 3)
            col = np.zeros(3, np.float32)
            col[cls] = 2.5
            images[i, int(y1):int(y1 + bh), int(x1):int(x1 + bw)] = (
                col + rng.normal(0, 0.1, 3).astype(np.float32))
            gt_boxes[i, g] = [x1, y1, x1 + bw, y1 + bh]
            gt_labels[i, g] = cls
            gt_valid[i, g] = True
    shapes = np.tile(np.array([[h, w]], np.float32), (n, 1))
    return images, shapes, gt_boxes, gt_labels, gt_valid


@pytest.mark.slow
def test_minitrain_reaches_map():
    rng = np.random.RandomState(0)
    cfg = tiny_config()
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, lr=0.01, warmup_iters=40, warmup_ratio=0.1))
    n_train, n_val, b = 40, 10, 2
    imgs, shapes, gtb, gtl, gtv = make_dataset(rng, n_train + n_val)

    batch0 = TrainBatch(
        images=jnp.asarray(imgs[:b]), img_shapes=jnp.asarray(shapes[:b]),
        gt_boxes=jnp.asarray(gtb[:b]), gt_labels=jnp.asarray(gtl[:b]),
        gt_valid=jnp.asarray(gtv[:b]))
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), batch0, steps_per_epoch=10_000)
    step = make_jitted_train_step(model, tx)

    order = np.arange(n_train)
    srng = np.random.RandomState(7)
    first_losses = None
    steps_per_epoch = n_train // b
    for it in range(300):
        if it % steps_per_epoch == 0:
            srng.shuffle(order)
        sel = order[(it % steps_per_epoch) * b:][:b]
        batch = TrainBatch(
            images=jnp.asarray(imgs[sel]),
            img_shapes=jnp.asarray(shapes[sel]),
            gt_boxes=jnp.asarray(gtb[sel]),
            gt_labels=jnp.asarray(gtl[sel]),
            gt_valid=jnp.asarray(gtv[sel]))
        state, metrics = step(state, batch, jax.random.PRNGKey(it))
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"loss diverged at step {it}"
        if it == 4:
            first_losses = {k: float(v) for k, v in metrics.items()}
    last_losses = {k: float(v) for k, v in metrics.items()}

    # loss trends (classification-type terms; see module docstring)
    assert last_losses["loss"] < 0.35 * first_losses["loss"], (
        first_losses, last_losses)
    for k in ("loss_rpn_cls", "s0.loss_cls", "s1.loss_cls", "loss_global"):
        assert last_losses[k] < first_losses[k], (k, first_losses, last_losses)

    # ---- val mAP with the repo's own evaluator
    infer = jax.jit(lambda v, im, sh, sf: model.apply(v, im, sh, sf))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    sfs = jnp.ones((1, 4), jnp.float32)
    det_results, annotations = [], []
    for i in range(n_train, n_train + n_val):
        dets = jax.device_get(infer(
            variables, jnp.asarray(imgs[i:i + 1]),
            jnp.asarray(shapes[i:i + 1]), sfs))
        v = np.asarray(dets.valid[0])
        boxes = np.asarray(dets.boxes[0])[v]
        scores = np.asarray(dets.scores[0])[v]
        labels = np.asarray(dets.labels[0])[v]
        per_cls = []
        for c in range(cfg.num_classes):
            m = labels == c
            per_cls.append(np.concatenate(
                [boxes[m], scores[m, None]], axis=1) if m.any()
                else np.zeros((0, 5)))
        det_results.append(per_cls)
        annotations.append({
            "bboxes": gtb[i][gtv[i]].astype(np.float64),
            "labels": gtl[i][gtv[i]],
        })
    mAP, _ = eval_map(det_results, annotations, iou_thr=0.5)
    assert mAP >= 0.5, f"val mAP@0.5 {mAP:.3f} (prototype reached 0.91)"
