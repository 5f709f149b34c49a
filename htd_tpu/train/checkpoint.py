"""Checkpointing (orbax) + mmdet/torch state-dict conversion.

Replaces the reference's CheckpointHook / load_checkpoint path
(SURVEY.md §5.4). The converter maps mmdet FasterRCNN(HTDRoIHead) state
dicts (torchvision-style backbone naming) onto our flax variable tree:
  * conv weights (O, I, kh, kw) -> HWIO (kh, kw, I, O);
  * linear weights (O, I) -> (I, O);
  * the two flatten-consuming FCs (stage-0 fc1, stage-1 fcs.0) additionally
    permute their input dim from torch's CHW flatten to our HWC flatten;
  * BN running stats -> the `batch_stats` collection.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from htd_tpu.config import HTDConfig


def save_checkpoint(path: str, state, keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


# ---------------------------------------------------------------------------
# mmdet state-dict conversion
# ---------------------------------------------------------------------------


def _conv_w(w: np.ndarray) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _grouped_conv_w(w: np.ndarray, groups: int) -> np.ndarray:
    """torch grouped conv (O, I/g, kh, kw) -> flax HWIO (kh, kw, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _fc_w(w: np.ndarray) -> np.ndarray:
    """(O, I) -> (I, O)."""
    return np.transpose(w, (1, 0))


def _fc_w_chw_to_hwc(w: np.ndarray, c: int, h: int, wdim: int) -> np.ndarray:
    """FC consuming a CHW flatten -> consuming an HWC flatten. (O, C*H*W)."""
    o = w.shape[0]
    w = w.reshape(o, c, h, wdim).transpose(0, 2, 3, 1).reshape(o, h * wdim * c)
    return np.transpose(w, (1, 0))


def convert_mmdet_state_dict(
    sd: Dict[str, np.ndarray], cfg: HTDConfig, strict: bool = True
) -> Dict[str, Any]:
    """Returns {'params': ..., 'batch_stats': ...} flax variable dicts.

    With strict=False, components absent from `sd` (e.g. a backbone-only
    pretrained checkpoint) are skipped.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def has(prefix: str) -> bool:
        if strict:
            return True
        return any(k.startswith(prefix) for k in sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def setp(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(value)

    def bn(torch_prefix, flax_path):
        setp(params, flax_path + ["scale"], sd[torch_prefix + ".weight"])
        setp(params, flax_path + ["bias"], sd[torch_prefix + ".bias"])
        setp(stats, flax_path + ["mean"], sd[torch_prefix + ".running_mean"])
        setp(stats, flax_path + ["var"], sd[torch_prefix + ".running_var"])

    def convw(torch_key, flax_path):
        setp(params, flax_path + ["kernel"], _conv_w(sd[torch_key]))

    def conv_with_bias(torch_prefix, flax_path):
        convw(torch_prefix + ".weight", flax_path)
        if torch_prefix + ".bias" in sd:
            setp(params, flax_path + ["bias"], sd[torch_prefix + ".bias"])

    def fc(torch_prefix, flax_path, chw: Optional[Tuple[int, int, int]] = None):
        w = sd[torch_prefix + ".weight"]
        if chw is not None:
            setp(params, flax_path + ["kernel"], _fc_w_chw_to_hwc(w, *chw))
        else:
            setp(params, flax_path + ["kernel"], _fc_w(w))
        setp(params, flax_path + ["bias"], sd[torch_prefix + ".bias"])

    # ---- backbone
    from htd_tpu.models.resnet import ARCH_BLOCKS

    blocks = ARCH_BLOCKS[cfg.backbone.depth]
    if not has("backbone."):
        blocks = (0, 0, 0, 0)
    else:
        convw("backbone.conv1.weight", ["backbone", "conv1"])
        bn("backbone.bn1", ["backbone", "bn1"])
    for s in range(4):
        for i in range(blocks[s]):
            tp = f"backbone.layer{s + 1}.{i}"
            fp = ["backbone", f"layer{s + 1}_{i}"]
            for j in (1, 2, 3):
                wkey = f"{tp}.conv{j}.weight"
                if j == 2 and cfg.backbone.stage_with_dcn[s]:
                    # DCNv1: deform weight + zero-init offset conv
                    setp(params, fp + ["conv2", "kernel"], _conv_w(sd[wkey]))
                    conv_with_bias(f"{tp}.conv2.conv_offset", fp + ["conv2", "conv_offset"])
                else:
                    convw(wkey, fp + [f"conv{j}"])
                bn(f"{tp}.bn{j}", fp + [f"bn{j}"])
            if i == 0:
                convw(f"{tp}.downsample.0.weight", fp + ["downsample_conv"])
                bn(f"{tp}.downsample.1", fp + ["downsample_bn"])

    # ---- FPN
    for i in range(4 if has("neck.") else 0):
        conv_with_bias(f"neck.lateral_convs.{i}.conv", ["neck", f"lateral_{i}"])
        conv_with_bias(f"neck.fpn_convs.{i}.conv", ["neck", f"fpn_{i}"])

    # ---- RPN
    if has("rpn_head."):
        conv_with_bias("rpn_head.rpn_conv", ["rpn_head", "rpn_conv"])
        conv_with_bias("rpn_head.rpn_cls", ["rpn_head", "rpn_cls"])
        conv_with_bias("rpn_head.rpn_reg", ["rpn_head", "rpn_reg"])

    # ---- SFA global context head
    if cfg.with_global and has("roi_head.glbctx_head."):
        for i in range(cfg.global_ctx.num_convs):
            conv_with_bias(
                f"roi_head.glbctx_head.convs.{i}.conv", ["glbctx_head", f"conv{i}"]
            )
        fc("roi_head.glbctx_head.fc", ["glbctx_head", "fc"])

    # ---- stage-0 Shared2FC head
    rf = cfg.roi_extractor.out_size
    cin = cfg.stage0_head.in_channels
    if not has("roi_head.bbox_head."):
        return {"params": params, "batch_stats": stats}
    fc(
        "roi_head.bbox_head.0.shared_fcs.0",
        ["stage0_head", "fc1"],
        chw=(cin, rf, rf),
    )
    fc("roi_head.bbox_head.0.shared_fcs.1", ["stage0_head", "fc2"])
    setp(
        params,
        ["stage0_head", "fc_cls_kernel"],
        _fc_w(sd["roi_head.bbox_head.0.fc_cls.weight"]),
    )
    setp(params, ["stage0_head", "fc_cls_bias"], sd["roi_head.bbox_head.0.fc_cls.bias"])
    fc("roi_head.bbox_head.0.fc_reg", ["stage0_head", "fc_reg"])

    # ---- stage-1 HTD head
    fc(
        "roi_head.bbox_head.1.fcs.0",
        ["stage1_head", "fcs1"],
        chw=(cin, rf, rf),
    )
    fc("roi_head.bbox_head.1.fcs.2", ["stage1_head", "fcs2"])
    fc("roi_head.bbox_head.1.fc_cls", ["stage1_head", "fc_cls"])
    fc("roi_head.bbox_head.1.fc_reg", ["stage1_head", "fc_reg"])
    gk, gb = [], []
    for k in range(4):
        gk.append(_fc_w(sd[f"roi_head.bbox_head.1.graph_lvl{k}_cls.weight"]))
        gb.append(sd[f"roi_head.bbox_head.1.graph_lvl{k}_cls.bias"])
    setp(params, ["stage1_head", "graph_kernel"], np.stack(gk))
    setp(params, ["stage1_head", "graph_bias"], np.stack(gb))
    for i in range(cfg.stage1_head.num_reg_convs):
        convw(
            f"roi_head.bbox_head.1.convs.{i}.conv.weight",
            ["stage1_head", f"reg_conv{i}"],
        )
        gn_key = f"roi_head.bbox_head.1.convs.{i}.gn.weight"
        if gn_key in sd:
            setp(params, ["stage1_head", f"reg_gn{i}", "scale"], sd[gn_key])
            setp(
                params,
                ["stage1_head", f"reg_gn{i}", "bias"],
                sd[f"roi_head.bbox_head.1.convs.{i}.gn.bias"],
            )

    # ---- Adpt extractor attention (1x1 convs -> Dense)
    w1 = sd["roi_head.bbox_roi_extractor.1.conv1.weight"]  # (128, 256, 1, 1)
    setp(params, ["adpt_extractor", "att_conv1", "kernel"], _fc_w(w1[:, :, 0, 0]))
    setp(
        params,
        ["adpt_extractor", "att_conv1", "bias"],
        sd["roi_head.bbox_roi_extractor.1.conv1.bias"],
    )
    w2 = sd["roi_head.bbox_roi_extractor.1.conv2.weight"]
    setp(params, ["adpt_extractor", "att_conv2", "kernel"], _fc_w(w2[:, :, 0, 0]))
    setp(
        params,
        ["adpt_extractor", "att_conv2", "bias"],
        sd["roi_head.bbox_roi_extractor.1.conv2.bias"],
    )

    return {"params": params, "batch_stats": stats}


def merge_pretrained(variables: Dict[str, Any], pretrained: Dict[str, Any]):
    """Overlay pretrained leaves onto an initialized variable tree.

    Only leaves whose path exists in `variables` are replaced (so a
    backbone-only checkpoint leaves heads at their fresh init) — the
    reference's load_checkpoint(strict=False) semantics.
    """
    import flax.traverse_util as tu

    out = {}
    for col in variables:
        flat = dict(tu.flatten_dict(variables[col]))
        for k, v in tu.flatten_dict(pretrained.get(col, {})).items():
            if k in flat:
                flat[k] = v
        out[col] = tu.unflatten_dict(flat)
    return out


def load_torch_checkpoint(path: str, cfg: HTDConfig) -> Dict[str, Any]:
    """Load an mmdet .pth checkpoint and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_mmdet_state_dict(sd, cfg)
