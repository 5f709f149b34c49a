"""RPN proposal generation vs a numpy re-derivation of the reference
semantics (rpn_head.py:78-168): per-level sigmoid + top-k, delta decode
clipped to img_shape, level-aware batched NMS, nms_post cap."""

import numpy as np
import jax
import jax.numpy as jnp

from htd_tpu.config import ProposalConfig
from htd_tpu.models.rpn import gen_proposals
from htd_tpu.ops.anchors import AnchorGenerator
from tests.oracles import np_delta2bbox, np_greedy_nms


def np_gen_proposals(level_scores, level_deltas, gen, img_shape, cfg):
    """Oracle for ONE image (assumes img pad == feature coverage)."""
    pad_h = int(np.ceil(img_shape[0] / 32.0) * 32)
    pad_w = int(np.ceil(img_shape[1] / 32.0) * 32)
    cand = []
    for lvl, (s, d) in enumerate(zip(level_scores, level_deltas)):
        fh, fw, a = s.shape
        anchors = np.asarray(gen.grid_anchors_level(lvl, (fh, fw)))
        stride = gen.strides[lvl]
        vh = min(int(np.ceil(pad_h / stride)), fh)
        vw = min(int(np.ceil(pad_w / stride)), fw)
        valid = np.zeros((fh, fw), bool)
        valid[:vh, :vw] = True
        flat_valid = np.repeat(valid.reshape(-1), a)
        prob = 1.0 / (1.0 + np.exp(-s.reshape(-1).astype(np.float64)))
        prob = np.where(flat_valid, prob, -np.inf)
        k = min(cfg.nms_pre, len(prob))
        order = np.argsort(-prob, kind="stable")[:k]
        boxes = np_delta2bbox(
            anchors[order], d.reshape(-1, 4)[order],
            (0, 0, 0, 0), (1, 1, 1, 1), max_shape=img_shape,
        )
        for b, p in zip(boxes, prob[order]):
            if np.isfinite(p):
                cand.append((p, b, lvl))
    # level-aware NMS via coordinate offset
    scores = np.array([c[0] for c in cand])
    boxes = np.stack([c[1] for c in cand])
    ids = np.array([c[2] for c in cand])
    mc = boxes.max()
    off_boxes = boxes + ids[:, None] * (mc + 1)
    keep = np_greedy_nms(off_boxes, scores, cfg.nms_thr)[: cfg.nms_post]
    return boxes[keep], scores[keep]


def test_proposals_match_oracle(rng):
    gen = AnchorGenerator(strides=(4, 8), ratios=(0.5, 1.0, 2.0), scales=(8,))
    cfg = ProposalConfig(nms_pre=50, nms_post=40, max_num=40, nms_thr=0.7)
    h, w = 32, 48  # feature sizes 8x12 and 4x6
    scores = [
        rng.normal(0, 1, (1, 8, 12, 3)).astype(np.float32),
        rng.normal(0, 1, (1, 4, 6, 3)).astype(np.float32),
    ]
    deltas = [
        rng.normal(0, 0.3, (1, 8, 12, 12)).astype(np.float32),
        rng.normal(0, 0.3, (1, 4, 6, 12)).astype(np.float32),
    ]
    img_shapes = jnp.asarray([[float(h), float(w)]])
    boxes, sc, valid = gen_proposals(
        [jnp.asarray(s) for s in scores],
        [jnp.asarray(d) for d in deltas],
        gen,
        img_shapes,
        cfg,
    )
    nb = np.asarray(boxes[0])
    ns = np.asarray(sc[0])
    nv = np.asarray(valid[0])

    ref_boxes, ref_scores = np_gen_proposals(
        [s[0] for s in scores], [d[0] for d in deltas], gen, (h, w), cfg
    )
    k = min(nv.sum(), len(ref_scores))
    assert k > 5
    np.testing.assert_allclose(ns[:k], ref_scores[:k], rtol=1e-4)
    np.testing.assert_allclose(nb[:k], ref_boxes[:k], rtol=1e-3, atol=1e-3)


def test_proposals_pad_mask(rng):
    """Anchors beyond the per-image ceil-32 pad region must never win."""
    gen = AnchorGenerator(strides=(8,), ratios=(1.0,), scales=(4,))
    cfg = ProposalConfig(nms_pre=100, nms_post=64, max_num=64, nms_thr=0.9)
    # feature map covers a 64x64 bucket, but the image is only 30x30
    scores = [np.full((1, 8, 8, 1), 5.0, np.float32)]  # all high
    deltas = [np.zeros((1, 8, 8, 4), np.float32)]
    img_shapes = jnp.asarray([[30.0, 30.0]])  # pad region = 32x32 -> 4x4 cells
    boxes, sc, valid = gen_proposals(
        [jnp.asarray(s) for s in scores],
        [jnp.asarray(d) for d in deltas],
        gen, img_shapes, cfg,
    )
    nv = np.asarray(valid[0])
    nb = np.asarray(boxes[0])[nv]
    # only the 4x4 in-pad cells are eligible (minus NMS suppression)
    assert nv.sum() <= 16
    # boxes clipped to the image
    assert nb.max() <= 30.0 + 1e-4
