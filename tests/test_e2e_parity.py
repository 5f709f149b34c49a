"""END-TO-END numerical parity: torch HTD mirror -> mmdet state dict ->
converter -> htd_tpu forward.

This is the composition guarantee the per-component oracles can't give:
one random-init torch model with REAL mmdet state-dict names drives both
implementations; boxes/scores must agree through the full cascade
(RPN proposals, stage-0, refinement, SFA fuse, AdptRoIExtractor, PGraph,
BA convs, final multiclass NMS).

The test config uses exact RoIAlign sampling (max_samples=8 covers the
adaptive grid for every roi in a <=224 px image; the production presets
approximate the BA extractor at S=2 for speed — documented in
RoIExtractorConfig).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

import torch

from tests import torch_htd as TH
from htd_tpu import config as C
from htd_tpu.models.detector import HTDDetector
from htd_tpu.train.checkpoint import convert_mmdet_state_dict

H, W = 160, 224
IMG_SHAPE = (149.0, 200.0)
SCALE_FACTOR = (1.1, 1.2, 1.1, 1.2)


def _exact_cfg(**bb):
    cfg = C.htd_r50_1x()
    return cfg.replace(
        roi_extractor=dataclasses.replace(
            cfg.roi_extractor, max_samples=8, adpt_max_samples=8, impl="gather"
        ),
        proposal_test=dataclasses.replace(
            cfg.proposal_test, nms_pre=600, nms_post=300, max_num=300
        ),
        backbone=dataclasses.replace(cfg.backbone, **bb),
    )


def _build_pair(cfg, seed=1, **torch_kw):
    tm = TH.randomize(TH.TorchHTDDetector(**torch_kw), seed=seed)
    sd = TH.state_dict_np(tm)
    variables = convert_mmdet_state_dict(sd, cfg)
    jm = HTDDetector(cfg)
    return tm, jm, variables


def _image(seed=0, h=H, w=W):
    rng = np.random.RandomState(seed)
    img = rng.normal(0, 1, (1, h, w, 3)).astype(np.float32)
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    return img, timg


def _proposals(seed=3, n=48, h=IMG_SHAPE[0], w=IMG_SHAPE[1]):
    """Boxes spanning all FPN levels, aspect in [0.5, 2], away from the
    56*2^k level-mapping boundaries."""
    rng = np.random.RandomState(seed)
    boxes = []
    while len(boxes) < n:
        scale = rng.uniform(10, 130)
        if min(abs(scale - 56), abs(scale - 112)) < 3:
            continue
        ar = rng.uniform(0.6, 1.8)
        bw = min(scale * np.sqrt(ar), w - 2)
        bh = min(scale / np.sqrt(ar), h - 2)
        x1 = rng.uniform(0, w - bw)
        y1 = rng.uniform(0, h - bh)
        boxes.append([x1, y1, x1 + bw, y1 + bh])
    return np.asarray(boxes, np.float32)


@pytest.fixture(scope="module")
def r50_pair():
    cfg = _exact_cfg()
    return cfg, *_build_pair(cfg, seed=1, depth=50)


def test_stages_parity_r50(r50_pair):
    """Fixed proposals through both cascades: pre-NMS boxes + mean softmax
    scores match <= 1e-3 (VERDICT round-1 item 1)."""
    cfg, tm, jm, variables = r50_pair
    img, timg = _image(0)
    props = _proposals()

    with torch.no_grad():
        feats = tm.extract_feat(timg)
        t_boxes, t_scores, t_rois1, _ = tm.roi_head.stages_forward(
            feats, torch.from_numpy(props), IMG_SHAPE
        )

    j_boxes, j_scores = jm.apply(
        variables,
        jnp.asarray(img),
        jnp.asarray([IMG_SHAPE], jnp.float32),
        jnp.asarray(props[None]),
        jnp.ones((1, props.shape[0]), bool),
        method=jm.stages_forward,
    )
    jb = np.asarray(j_boxes[0], np.float64)
    js = np.asarray(j_scores[0], np.float64)
    tb = t_boxes.numpy().astype(np.float64)
    ts = t_scores.numpy().astype(np.float64)

    box_err = np.abs(jb - tb).max()
    score_err = np.abs(js - ts).max()
    assert box_err <= 1e-2, f"pre-NMS box err {box_err}"
    assert score_err <= 1e-3, f"softmax score err {score_err}"


def test_rpn_proposal_parity_r50(r50_pair):
    cfg, tm, jm, variables = r50_pair
    img, timg = _image(0)

    with torch.no_grad():
        feats = tm.extract_feat(timg)
        scores, deltas = tm.rpn_head(feats)
        t_dets = get_props = TH.get_rpn_proposals(
            scores, deltas, IMG_SHAPE, nms_pre=600, nms_post=300
        ).numpy()

    boxes, jscores, valid = jm.apply(
        variables,
        jnp.asarray(img),
        jnp.asarray([IMG_SHAPE], jnp.float32),
        method=jm.rpn_proposals,
    )
    v = np.asarray(valid[0])
    jb = np.asarray(boxes[0])[v]
    js = np.asarray(jscores[0])[v]

    assert jb.shape[0] == t_dets.shape[0], (
        f"proposal count {jb.shape[0]} vs torch {t_dets.shape[0]}"
    )
    # both sides are score-ordered (NMS keep order)
    assert np.abs(js - t_dets[:, 4]).max() <= 1e-4
    _assert_rows_match_or_tie(jb, js, t_dets[:, :4], t_dets[:, 4])


def _iou_1many(box, boxes):
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a1 + a2 - inter, 1e-9)


def _assert_rows_match_or_tie(jb, js, tb, ts, jl=None, tl=None,
                              box_tol=1e-2, frac=0.03, nms_thr=0.5):
    """SET equality with an allowance for NMS boundary flips.

    With random-init weights two failure-free implementations still
    disagree on discrete NMS decisions: (a) near-identical SCORES can
    reorder on ~1e-7 float noise, swapping which of two boxes survives;
    (b) a pair whose IoU sits within float noise of the NMS threshold can
    flip a suppression decision, keeping a box with a genuinely different
    score on one side. Both signatures swap a kept row AND shift every
    downstream row, so comparison must be set-based. Unmatched rows must
    (a) be rare (<= frac) and (b) be provable flips — either an unused
    counterpart with a score within 2e-3 (score tie), or an unused
    same-class counterpart overlapping near the NMS threshold (the
    suppressor/suppressee of the flipped decision).
    """
    used = np.zeros(len(jb), bool)
    unmatched = []
    for i in range(len(tb)):
        d = np.abs(jb - tb[i]).max(axis=1)
        d = d + used * 1e9
        if jl is not None:
            d = d + (jl != tl[i]) * 1e9
        j = int(np.argmin(d)) if len(d) else -1
        if j >= 0 and d[j] <= box_tol and abs(js[j] - ts[i]) <= 1e-3:
            used[j] = True
        else:
            unmatched.append(i)
    assert len(unmatched) <= max(1, int(frac * max(len(tb), 1))), (
        f"{len(unmatched)}/{len(tb)} torch rows have no jax counterpart "
        f"(first few: {[(tb[i], ts[i]) for i in unmatched[:3]]})"
    )
    spare_scores = np.sort(js[~used])
    spare_boxes = jb[~used]
    spare_labels = jl[~used] if jl is not None else None
    for i in unmatched:
        # score-tie counterpart?
        k = np.searchsorted(spare_scores, ts[i])
        near = [abs(spare_scores[m] - ts[i])
                for m in (max(k - 1, 0), min(k, len(spare_scores) - 1))
                if len(spare_scores)]
        if near and min(near) <= 2e-3:
            continue
        # suppression-flip counterpart: an unused jax box of the same class
        # overlapping this row near the NMS threshold (the pair whose
        # boundary IoU decided differently)
        if len(spare_boxes):
            ious = _iou_1many(tb[i], spare_boxes)
            if spare_labels is not None:
                ious = np.where(spare_labels == tl[i], ious, -1.0)
            assert ious.max() >= nms_thr - 0.05, (
                f"unmatched torch row score {ts[i]} box {tb[i]}: no jax tie "
                f"or suppression-pair counterpart (best IoU {ious.max():.3f})"
            )
        else:
            raise AssertionError(
                f"unmatched torch row score {ts[i]} with no spare jax rows"
            )


def test_full_simple_test_parity_r50(r50_pair):
    """Whole pipeline incl. RPN NMS and final multiclass NMS."""
    cfg, tm, jm, variables = r50_pair
    img, timg = _image(0)

    with torch.no_grad():
        (t_dets, t_labels), _ = tm.simple_test(
            timg, IMG_SHAPE, SCALE_FACTOR, nms_pre=600, nms_post=300
        )
    dets = jm.apply(
        variables,
        jnp.asarray(img),
        jnp.asarray([IMG_SHAPE], jnp.float32),
        jnp.asarray([SCALE_FACTOR], jnp.float32),
    )
    v = np.asarray(dets.valid[0])
    jb = np.asarray(dets.boxes[0])[v]
    js = np.asarray(dets.scores[0])[v]
    jl = np.asarray(dets.labels[0])[v]
    tb = t_dets.numpy()
    tl = t_labels.numpy()

    assert len(jb) == len(tb), f"det count {len(jb)} vs {len(tb)}"
    # Degenerate (near-zero-extent) boxes are excluded from row matching:
    # they arise when random-weight regression decodes outside the image
    # and both corners clip to the boundary. Their IoU with everything is
    # ~0, so NMS cannot deduplicate them, and WHICH ones appear depends on
    # which member of an RPN score-tie block survived proposal NMS two
    # stages earlier — both sides are correct but carry different parents'
    # cascade scores. With trained weights such boxes are score-epsilon
    # noise; with random weights they are the only expected divergence.
    jnd = (jb[:, 2] - jb[:, 0] >= 1.0) & (jb[:, 3] - jb[:, 1] >= 1.0)
    tnd = (tb[:, 2] - tb[:, 0] >= 1.0) & (tb[:, 3] - tb[:, 1] >= 1.0)
    assert abs(int(jnd.sum()) - int(tnd.sum())) <= max(
        2, int(0.03 * len(tb))
    ), f"non-degenerate det count {int(jnd.sum())} vs {int(tnd.sum())}"
    _assert_rows_match_or_tie(
        jb[jnd], js[jnd], tb[tnd, :4], tb[tnd, 4], jl[jnd], tl[tnd]
    )


@pytest.mark.slow
def test_stages_parity_grouped_dcn_x101_style():
    """Grouped (64x4d) bottlenecks + grouped deformable conv2 through the
    full cascade — the X-101 numerics check VERDICT round-1 item 7 asked
    for. depth=50 keeps the torch loop-oracle tractable; the grouped conv /
    grouped-DCN math and the converter's block-diagonal expansion are
    depth-independent (reference resnext.py:44-88 builds the same
    Bottleneck at every depth)."""
    cfg = _exact_cfg(
        groups=64, base_width=4, stage_with_dcn=(False, True, True, True)
    )
    tm, jm, variables = _build_pair(
        cfg, seed=4, depth=50, groups=64, base_width=4,
        stage_with_dcn=(False, True, True, True),
    )
    img, timg = _image(6, 96, 128)
    props = _proposals(seed=9, n=16, h=90.0, w=120.0)
    shape = (90.0, 120.0)

    with torch.no_grad():
        feats = tm.extract_feat(timg)
        t_boxes, t_scores, _, _ = tm.roi_head.stages_forward(
            feats, torch.from_numpy(props), shape
        )
    j_boxes, j_scores = jm.apply(
        variables,
        jnp.asarray(img),
        jnp.asarray([shape], jnp.float32),
        jnp.asarray(props[None]),
        jnp.ones((1, props.shape[0]), bool),
        method=jm.stages_forward,
    )
    box_err = np.abs(np.asarray(j_boxes[0]) - t_boxes.numpy()).max()
    score_err = np.abs(np.asarray(j_scores[0]) - t_scores.numpy()).max()
    assert box_err <= 1e-2, f"grouped-DCN pre-NMS box err {box_err}"
    assert score_err <= 1e-3, f"grouped-DCN softmax score err {score_err}"


@pytest.mark.slow
def test_stages_parity_r50_dcn():
    """Same composition guarantee with deformable conv2 in stages 2-4 —
    also the independent (mmcv-transcribed) DCN second-source check."""
    cfg = _exact_cfg(stage_with_dcn=(False, True, True, True))
    tm, jm, variables = _build_pair(
        cfg, seed=2, depth=50, stage_with_dcn=(False, True, True, True)
    )
    img, timg = _image(5, 96, 128)
    props = _proposals(seed=7, n=24, h=90.0, w=120.0)
    shape = (90.0, 120.0)

    with torch.no_grad():
        feats = tm.extract_feat(timg)
        t_boxes, t_scores, _, _ = tm.roi_head.stages_forward(
            feats, torch.from_numpy(props), shape
        )
    j_boxes, j_scores = jm.apply(
        variables,
        jnp.asarray(img),
        jnp.asarray([shape], jnp.float32),
        jnp.asarray(props[None]),
        jnp.ones((1, props.shape[0]), bool),
        method=jm.stages_forward,
    )
    box_err = np.abs(np.asarray(j_boxes[0]) - t_boxes.numpy()).max()
    score_err = np.abs(np.asarray(j_scores[0]) - t_scores.numpy()).max()
    assert box_err <= 1e-2, f"DCN pre-NMS box err {box_err}"
    assert score_err <= 1e-3, f"DCN softmax score err {score_err}"
