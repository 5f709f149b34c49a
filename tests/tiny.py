"""Tiny HTD config for fast CPU integration tests."""

import dataclasses

from htd_tpu import config as C


def tiny_config(**overrides) -> C.HTDConfig:
    cfg = C.HTDConfig(
        backbone=C.BackboneConfig(depth=10),
        proposal_test=C.ProposalConfig(nms_pre=64, nms_post=48, max_num=48),
        rcnn_test=C.RCNNTestConfig(max_per_img=10),
        train=dataclasses.replace(
            C.TrainConfig(),
            rpn_proposal=C.ProposalConfig(nms_pre=64, nms_post=48, max_num=48),
            rpn_sampler=C.SamplerConfig(num=32, pos_fraction=0.5, add_gt_as_proposals=False),
            rcnn=(
                C.StageTrainConfig(
                    assigner=C.AssignerConfig(0.5, 0.5, 0.5, False),
                    sampler=C.SamplerConfig(32, 0.25, True),
                ),
                C.StageTrainConfig(
                    assigner=C.AssignerConfig(0.6, 0.6, 0.6, False),
                    sampler=C.SamplerConfig(32, 0.25, True),
                ),
            ),
            max_gt=8,
            rcnn_pos_cap=8,
        ),
    )
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


def synthetic_batch(rng, b=2, h=64, w=96, num_gt=3, num_classes=80, max_gt=8):
    """Deterministic synthetic images + random gt (the reference's
    _demo_mm_inputs pattern, test_forward.py:276)."""
    import numpy as np

    images = rng.normal(0, 1, (b, h, w, 3)).astype("float32")
    gt_boxes = np.zeros((b, max_gt, 4), "float32")
    gt_labels = np.zeros((b, max_gt), "int32")
    gt_valid = np.zeros((b, max_gt), bool)
    for i in range(b):
        for g in range(num_gt):
            cx, cy = rng.uniform(8, w - 8), rng.uniform(8, h - 8)
            bw, bh = rng.uniform(8, 24), rng.uniform(8, 24)
            x1, y1 = max(cx - bw / 2, 0), max(cy - bh / 2, 0)
            x2, y2 = min(cx + bw / 2, w), min(cy + bh / 2, h)
            gt_boxes[i, g] = [x1, y1, x2, y2]
            gt_labels[i, g] = rng.randint(0, num_classes)
            gt_valid[i, g] = True
    img_shapes = np.tile(np.array([[h, w]], "float32"), (b, 1))
    scale_factors = np.ones((b, 4), "float32")
    return images, img_shapes, scale_factors, gt_boxes, gt_labels, gt_valid
