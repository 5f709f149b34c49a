"""Training-path numerical parity vs the torch reference mirror
(VERDICT r03 item 2).

One random-init torch model with real mmdet state-dict names drives both
implementations through the FULL training forward on a fixed batch; the
sampled sets (RPN 256-block, stage-0/1 512-blocks) are chosen once and
INJECTED into both sides, sidestepping RNG. Asserts:
  * each of the 7 loss terms matches (loss_rpn_cls, loss_rpn_bbox,
    loss_global, s{0,1}.loss_{cls,bbox});
  * d total_loss / d {stage-0 fc_cls.weight, a stage-1 reg conv, the RPN
    conv} matches through the state-dict converter mapping.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import torch_htd as TH
from tests import torch_htd_train as TT
from htd_tpu import config as C
from htd_tpu.models.detector import HTDDetector
from htd_tpu.train.checkpoint import convert_mmdet_state_dict

B, H, W = 2, 128, 160
IMG_SHAPE = (120.0, 150.0)
MAX_GT = 8
RPN_NUM = 64
RCNN_NUM = 64
POS_CAP = 16
NMS_PRE, NMS_POST = 300, 128


def _cfg():
    cfg = C.htd_r50_1x()
    return cfg.replace(
        backbone=dataclasses.replace(cfg.backbone, depth=10),
        roi_extractor=dataclasses.replace(
            cfg.roi_extractor, max_samples=8, adpt_max_samples=8,
            impl="gather",
        ),
        train=dataclasses.replace(
            cfg.train,
            rpn_sampler=C.SamplerConfig(RPN_NUM, 0.5, False),
            rpn_proposal=C.ProposalConfig(
                nms_pre=NMS_PRE, nms_post=NMS_POST, max_num=NMS_POST
            ),
            rcnn=(
                C.StageTrainConfig(
                    assigner=C.AssignerConfig(0.5, 0.5, 0.5, False),
                    sampler=C.SamplerConfig(RCNN_NUM, 0.25, True),
                ),
                C.StageTrainConfig(
                    assigner=C.AssignerConfig(0.6, 0.6, 0.6, False),
                    sampler=C.SamplerConfig(RCNN_NUM, 0.25, True),
                ),
            ),
            max_gt=MAX_GT,
            rcnn_pos_cap=POS_CAP,
        ),
    )


def _gt(seed=11):
    """A few well-separated gt boxes per image, various scales."""
    rng = np.random.RandomState(seed)
    gts, labels = [], []
    for i in range(B):
        boxes = []
        for cx, cy in [(30, 30), (90, 60), (120, 90), (60, 100)]:
            bw = rng.uniform(14, 50)
            bh = rng.uniform(14, 50)
            x1 = np.clip(cx - bw / 2, 0, IMG_SHAPE[1] - 4)
            y1 = np.clip(cy - bh / 2, 0, IMG_SHAPE[0] - 4)
            x2 = np.clip(cx + bw / 2, x1 + 4, IMG_SHAPE[1])
            y2 = np.clip(cy + bh / 2, y1 + 4, IMG_SHAPE[0])
            boxes.append([x1, y1, x2, y2])
        gts.append(np.asarray(boxes, np.float32))
        labels.append(rng.randint(0, 80, size=len(boxes)).astype(np.int64))
    return gts, labels


def _build_injection(record, gts):
    """Map the torch-side sampled sets into forward_train overrides."""
    ov = {}
    ov["rpn_keep_pos"] = jnp.asarray(record["rpn_keep_pos"].numpy())
    ov["rpn_keep_neg"] = jnp.asarray(record["rpn_keep_neg"].numpy())
    ov["rpn_matched_gt"] = jnp.asarray(
        record["rpn_matched_gt"].numpy().astype(np.int32))

    props = np.zeros((B, NMS_POST, 4), np.float32)
    pvalid = np.zeros((B, NMS_POST), bool)
    for i, p in enumerate(record["proposals_list"]):
        n = p.shape[0]
        props[i, :n] = p.numpy()
        pvalid[i, :n] = True
    ov["proposals"] = jnp.asarray(props)
    ov["proposal_valid"] = jnp.asarray(pvalid)

    def stage_arrays(samp, cand_len_map):
        idx = np.zeros((B, RCNN_NUM), np.int32)
        valid = np.zeros((B, RCNN_NUM), bool)
        is_pos = np.zeros((B, RCNN_NUM), bool)
        is_gt = np.zeros((B, RCNN_NUM), bool)
        gt_inds = np.zeros((B, RCNN_NUM), np.int32)
        for i, s in enumerate(samp):
            g = gts[i].shape[0]
            np_, nn_ = len(s["pos_inds"]), len(s["neg_inds"])
            assert np_ <= POS_CAP
            rows = np.concatenate([s["pos_inds"], s["neg_inds"]])
            mapped = np.asarray(
                [cand_len_map(i, int(j), g) for j in rows], np.int32)
            idx[i, :np_ + nn_] = mapped
            valid[i, :np_ + nn_] = True
            is_pos[i, :np_] = True
            is_gt[i, :np_] = s["pos_is_gt"]
            gt_inds[i, :np_] = s["pos_gt_inds"]
        return {
            "idx": jnp.asarray(idx), "valid": jnp.asarray(valid),
            "is_pos": jnp.asarray(is_pos), "is_gt": jnp.asarray(is_gt),
            "gt_inds": jnp.asarray(gt_inds),
        }

    # stage 0: torch cand = cat([gt_i, proposals_i]); jax cand =
    # cat([gt_padded(MAX_GT), proposals(NMS_POST)])
    s0 = stage_arrays(
        record["samp0"],
        lambda i, j, g: j if j < g else MAX_GT + (j - g),
    )
    for k, v in s0.items():
        ov[f"s0_{k}"] = v

    # stage 1: torch cand = cat([gt_i, refined_i]) where refined_i row k
    # corresponds to the k-th (valid & ~is_gt) stage-0 slot on the jax side
    refined_slot = []
    for i, s in enumerate(record["samp0"]):
        np_, nn_ = len(s["pos_inds"]), len(s["neg_inds"])
        slot_valid = np.zeros(RCNN_NUM, bool)
        slot_valid[:np_ + nn_] = True
        slot_valid[:np_] &= ~s["pos_is_gt"]
        refined_slot.append(np.nonzero(slot_valid)[0])
    s1 = stage_arrays(
        record["samp1"],
        lambda i, j, g: j if j < g
        else MAX_GT + int(refined_slot[i][j - g]),
    )
    for k, v in s1.items():
        ov[f"s1_{k}"] = v
    return ov


@pytest.fixture(scope="module")
def pair():
    cfg = _cfg()
    # differentiable torch RoIAlign: backbone/FPN grads must flow THROUGH
    # roi features for full-tree gradient parity (the numpy oracle detaches)
    TH.GRAD_ROI_ALIGN = True
    tm = TH.randomize(TH.TorchHTDDetector(depth=10), seed=3)
    variables = convert_mmdet_state_dict(TH.state_dict_np(tm), cfg)
    jm = HTDDetector(cfg)

    rng_img = np.random.RandomState(0)
    img = rng_img.normal(0, 1, (B, H, W, 3)).astype(np.float32)
    timg = torch.from_numpy(img.transpose(0, 3, 1, 2))
    gts, labels = _gt()

    tm.train(False)  # frozen-BN semantics (norm_eval=True) — grads still flow
    for p in tm.parameters():
        p.requires_grad_(True)
    t_losses, record = TT.forward_train_t(
        tm, timg, IMG_SHAPE, (float(H), float(W)),
        [torch.from_numpy(g) for g in gts],
        [torch.from_numpy(l) for l in labels],
        rng=np.random.RandomState(42),
        rpn_num=RPN_NUM, rcnn_num=RCNN_NUM,
        nms_pre=NMS_PRE, nms_post=NMS_POST,
    )
    ov = _build_injection(record, gts)

    gt_boxes = np.zeros((B, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((B, MAX_GT), np.int32)
    gt_valid = np.zeros((B, MAX_GT), bool)
    for i in range(B):
        n = gts[i].shape[0]
        gt_boxes[i, :n] = gts[i]
        gt_labels[i, :n] = labels[i]
        gt_valid[i, :n] = True

    jax_inputs = dict(
        images=jnp.asarray(img),
        img_shapes=jnp.asarray(np.tile(IMG_SHAPE, (B, 1)).astype(np.float32)),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_valid=jnp.asarray(gt_valid),
    )
    yield cfg, tm, jm, variables, t_losses, record, ov, jax_inputs
    TH.GRAD_ROI_ALIGN = False


LOSS_KEYS = ("loss_rpn_cls", "loss_rpn_bbox", "loss_global",
             "s0.loss_cls", "s0.loss_bbox", "s1.loss_cls", "s1.loss_bbox")


@pytest.mark.fast
def test_loss_terms_match(pair):
    cfg, tm, jm, variables, t_losses, record, ov, inp = pair
    j_losses = jm.apply(
        variables, inp["images"], inp["img_shapes"], inp["gt_boxes"],
        inp["gt_labels"], inp["gt_valid"], overrides=ov,
        method=jm.forward_train, rngs={"sampling": jax.random.PRNGKey(0)},
    )
    for k in LOSS_KEYS:
        tv = float(t_losses[k].detach())
        jv = float(j_losses[k])
        assert abs(tv - jv) <= max(2e-3 * abs(tv), 2e-4), (
            f"{k}: torch {tv:.6f} vs jax {jv:.6f}"
        )


def test_gradients_match(pair):
    cfg, tm, jm, variables, t_losses, record, ov, inp = pair

    # torch side: sum of the loss terms (the _parse_losses total)
    tm.zero_grad(set_to_none=True)
    total_t = sum(t_losses[k] for k in LOSS_KEYS)
    total_t.backward()
    grad_sd = {}
    for name, p in tm.named_parameters():
        grad_sd[name] = (
            p.grad.detach().numpy().copy() if p.grad is not None
            else np.zeros(p.shape, np.float32)
        )
    # BN buffers are part of the converter's expected key set
    for name, buf in tm.state_dict().items():
        if name not in grad_sd:
            grad_sd[name] = np.zeros(buf.shape, np.float32)
    t_grads = convert_mmdet_state_dict(grad_sd, cfg)

    def total_loss(params):
        vs = dict(variables, params=params)
        losses = jm.apply(
            vs, inp["images"], inp["img_shapes"], inp["gt_boxes"],
            inp["gt_labels"], inp["gt_valid"], overrides=ov,
            method=jm.forward_train,
            rngs={"sampling": jax.random.PRNGKey(0)},
        )
        return sum(v for k, v in losses.items() if "loss" in k)

    j_grads = jax.grad(total_loss)(variables["params"])

    # FULL-TREE parity (VERDICT r04 item 5): every leaf the converter
    # maps must carry the same gradient — this catches dead or mis-mapped
    # branches (per-level GCN kernels, SFA convs, attention 1x1s) that
    # spot probes cannot. Tolerance ladder: leaves deeper in backprop
    # (backbone) accumulate more resample/interp noise than head leaves.
    def flatten(tree, path=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                out.update(flatten(v, path + (k,)))
            return out
        return {path: np.asarray(tree, np.float64)}

    flat_j = flatten(j_grads)
    flat_t = flatten(t_grads["params"])
    assert set(flat_j) == set(flat_t), (
        f"grad tree key mismatch: only-jax "
        f"{sorted(set(flat_j) - set(flat_t))[:5]}, only-torch "
        f"{sorted(set(flat_t) - set(flat_j))[:5]}"
    )

    def tol_for(path):
        head = path[0]
        if head == "backbone":
            return 2e-2
        if head in ("fpn", "neck"):
            return 1e-2
        return 5e-3

    global_scale = max(np.abs(t).max() for t in flat_t.values())
    failures = []
    for path in sorted(flat_j):
        jt, tt = flat_j[path], flat_t[path]
        denom = max(np.abs(tt).max(), np.abs(jt).max())
        # both effectively zero relative to the model's gradient scale
        # (unused-but-converted leaves, e.g. BN running stats): fine
        if denom <= 1e-9 * max(global_scale, 1.0):
            continue
        err = np.abs(jt - tt).max() / denom
        if err > tol_for(path):
            failures.append((".".join(path), err, denom))
    assert not failures, (
        f"{len(failures)} grad leaves off (worst 10): "
        + "; ".join(f"{n} rel {e:.2e} scale {s:.2e}"
                    for n, e, s in sorted(
                        failures, key=lambda t: -t[1])[:10])
    )
