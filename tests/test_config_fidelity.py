"""Preset <-> reference-config hyperparameter table.

Each assertion transcribes a value from the reference HTD configs
(/root/reference/configs/htd/*.py + _base_/schedules); a drift here means
the rebuild silently trains or tests a different recipe than the one that
produced the published 50.4 AP.
"""

import pytest

from htd_tpu import config as C

pytestmark = pytest.mark.fast


def test_grad_clip_is_none_everywhere():
    # optimizer_config = dict(grad_clip=None):
    # htd_resnet101_2x.py:120, htd_resnet101_dcn_2x_mstrain.py:119,
    # htd_resnetx101_dcn_2x_mstrain.py:117, _base_/schedules/schedule_1x.py:3
    for preset in (C.htd_r50_1x, C.htd_r101_2x, C.htd_r101_dcn_2x,
                   C.htd_x101_dcn_2x):
        assert preset().train.grad_clip_norm is None


def test_test_scales():
    # test img_scale: (1333, 800) for r50/r101/r101-dcn
    # (htd_resnet101_dcn_2x_mstrain.py:27, htd_resnet101_2x.py:26,
    # _base_/datasets/coco_detection.py:19); (1600, 800) for x101-dcn
    # (htd_resnetx101_dcn_2x_mstrain.py:27)
    assert C.htd_r50_1x().test_scale == (1333, 800)
    assert C.htd_r101_2x().test_scale == (1333, 800)
    assert C.htd_r101_dcn_2x().test_scale == (1333, 800)
    assert C.htd_x101_dcn_2x().test_scale == (1600, 800)


def test_train_scales():
    # train Resize img_scale: fixed (1333, 800) for r50_1x / r101_2x
    # (htd_resnet101_2x.py:10); mstrain range [(1600,400),(1600,1400)] for
    # the dcn mstrain configs (htd_resnet101_dcn_2x_mstrain.py:10,
    # htd_resnetx101_dcn_2x_mstrain.py:10)
    assert C.htd_r50_1x().train.mstrain_range is None
    assert C.htd_r101_2x().train.mstrain_range is None
    assert C.htd_r50_1x().train.img_scale == (1333, 800)
    rng = ((1600, 400), (1600, 1400))
    assert C.htd_r101_dcn_2x().train.mstrain_range == rng
    assert C.htd_x101_dcn_2x().train.mstrain_range == rng


def test_schedules():
    # schedule_1x: steps [8,11]/12 epochs; 2x (inlined in r101 configs):
    # steps [16,22]/24; SGD lr .02 momentum .9 wd 1e-4, warmup 500 @ 1/3
    for preset, steps, total in (
        (C.htd_r50_1x, (8, 11), 12),
        (C.htd_r101_2x, (16, 22), 24),
        (C.htd_r101_dcn_2x, (16, 22), 24),
        (C.htd_x101_dcn_2x, (16, 22), 24),
    ):
        t = preset().train
        assert t.lr_steps == steps and t.total_epochs == total
        assert (t.lr, t.momentum, t.weight_decay) == (0.02, 0.9, 1e-4)
        assert (t.warmup_iters, t.warmup_ratio) == (500, 1.0 / 3.0)


def test_backbones_and_nms():
    # r101 configs use soft-NMS at test (htd_resnet101_2x.py:298);
    # dcn stages (False,True,True,True) (htd_resnet101_dcn_2x_mstrain.py:143);
    # x101: groups=64, base_width=4 (htd_resnetx101_dcn_2x_mstrain.py:140-147)
    assert not C.htd_r50_1x().rcnn_test.use_soft_nms
    for preset in (C.htd_r101_2x, C.htd_r101_dcn_2x, C.htd_x101_dcn_2x):
        assert preset().rcnn_test.use_soft_nms
    assert C.htd_r50_1x().backbone.depth == 50
    assert C.htd_r101_dcn_2x().backbone.stage_with_dcn == (
        False, True, True, True)
    x = C.htd_x101_dcn_2x().backbone
    assert (x.groups, x.base_width, x.depth) == (64, 4, 101)


def test_stage_coders_and_sampling():
    # per-stage target stds (htd_resnet50_1x.py:31-34,64-67,83-86);
    # RPN assigner .7/.3 low-quality, rcnn stage IoUs .5/.6
    cfg = C.htd_r50_1x()
    assert cfg.rpn.coder.stds == (1.0, 1.0, 1.0, 1.0)
    assert cfg.stage0_head.coder.stds == (0.1, 0.1, 0.2, 0.2)
    assert cfg.stage1_head.coder.stds == (0.05, 0.05, 0.1, 0.1)
    t = cfg.train
    assert (t.rpn_assigner.pos_iou_thr, t.rpn_assigner.neg_iou_thr) == (0.7, 0.3)
    assert t.rpn_assigner.match_low_quality
    assert (t.rpn_sampler.num, t.rpn_sampler.pos_fraction) == (256, 0.5)
    assert not t.rpn_sampler.add_gt_as_proposals
    assert t.rcnn[0].assigner.pos_iou_thr == 0.5
    assert t.rcnn[1].assigner.pos_iou_thr == 0.6
    for s in t.rcnn:
        assert (s.sampler.num, s.sampler.pos_fraction) == (512, 0.25)
        assert s.sampler.add_gt_as_proposals
    assert t.stage_loss_weights == (1.0, 0.5)


def test_apply_overrides():
    cfg = C.apply_overrides(C.htd_r50_1x(), [
        "train.lr=0.01", "compute_dtype=bfloat16", "train.lr_steps=16,22",
        "rcnn_test.use_soft_nms=true", "train.grad_clip_norm=35",
        "test_scale=1600,800", "backbone.stage_with_dcn=1,1,1,1",
    ])
    assert cfg.train.lr == 0.01
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.train.lr_steps == (16, 22)
    assert cfg.rcnn_test.use_soft_nms
    assert cfg.train.grad_clip_norm == 35.0
    assert cfg.test_scale == (1600, 800)
    # untouched siblings survive
    assert cfg.train.momentum == 0.9
    assert cfg.stage1_head.gn_groups == 36


def test_dump_config_roundtrippable_json():
    import json

    d = json.loads(C.dump_config(C.htd_x101_dcn_2x()))
    assert d["backbone"]["groups"] == 64
    assert d["test_scale"] == [1600, 800]
