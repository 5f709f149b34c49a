"""Converter + numerical parity of backbone/FPN vs a torch reference."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

from htd_tpu.config import BackboneConfig, HTDConfig
from htd_tpu.models.resnet import ResNet
from htd_tpu.models.fpn import FPN
from htd_tpu.train.checkpoint import (
    convert_mmdet_state_dict,
    _fc_w_chw_to_hwc,
)
from tests.torch_ref import TorchResNet, TorchFPN, mmdet_style_state_dict


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(rng.normal(0, 0.5, m.num_features).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(rng.uniform(0.5, 2.0, m.num_features).astype(np.float32)))
            m.weight.data.copy_(torch.from_numpy(rng.normal(1, 0.2, m.num_features).astype(np.float32)))
            m.bias.data.copy_(torch.from_numpy(rng.normal(0, 0.2, m.num_features).astype(np.float32)))


def test_backbone_fpn_parity_with_torch(rng):
    depth = 10
    tnet = TorchResNet(depth)
    tfpn = TorchFPN()
    with torch.no_grad():
        _randomize_bn_stats(tnet, rng)
    tnet.eval()
    tfpn.eval()

    sd = mmdet_style_state_dict(tnet, tfpn)
    cfg = HTDConfig(backbone=BackboneConfig(depth=depth))
    variables = convert_mmdet_state_dict(sd, cfg, strict=False)

    x = rng.normal(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        t_c = tnet(torch.from_numpy(x))
        t_p = tfpn(t_c)

    model = ResNet(depth=depth)
    feats = model.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    for lvl in range(4):
        ours = np.asarray(feats[lvl]).transpose(0, 3, 1, 2)
        ref = t_c[lvl].numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    neck = FPN()
    outs = neck.apply({"params": variables["params"]["neck"]}, list(feats))
    assert len(outs) == 5
    for lvl in range(5):
        ours = np.asarray(outs[lvl]).transpose(0, 3, 1, 2)
        ref = t_p[lvl].numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_chw_to_hwc_fc_permutation(rng):
    """torch Linear over a CHW flatten == our Dense over the HWC flatten."""
    c, h, w, o = 5, 3, 4, 7
    W = rng.normal(0, 1, (o, c * h * w)).astype(np.float32)
    x = rng.normal(0, 1, (2, c, h, w)).astype(np.float32)
    y_torch = x.reshape(2, -1) @ W.T
    K = _fc_w_chw_to_hwc(W, c, h, w)
    x_hwc = x.transpose(0, 2, 3, 1).reshape(2, -1)
    y_ours = x_hwc @ np.asarray(K)
    np.testing.assert_allclose(y_ours, y_torch, rtol=1e-4, atol=1e-5)


def test_full_state_dict_structure_roundtrip(rng):
    """A synthetic full mmdet state dict converts to exactly the tree our
    model init produces (same paths, same shapes)."""
    from htd_tpu.models.detector import HTDDetector
    from tests.tiny import tiny_config

    cfg = tiny_config()
    model = HTDDetector(cfg)
    init_fn = jax.jit(
        lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf)
    )
    variables = init_fn(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.asarray([[64.0, 64.0]]),
        jnp.ones((1, 4)),
    )

    # build the synthetic torch-side state dict from our shapes (inverse maps)
    sd = {}

    def conv_t(p):  # HWIO -> OIHW
        return np.transpose(p, (3, 2, 0, 1))

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def emit_bn(tp, node, snode):
        sd[tp + ".weight"] = node["scale"]
        sd[tp + ".bias"] = node["bias"]
        sd[tp + ".running_mean"] = snode["mean"]
        sd[tp + ".running_var"] = snode["var"]

    bb = params["backbone"]
    sbb = stats["backbone"]
    sd["backbone.conv1.weight"] = conv_t(bb["conv1"]["kernel"])
    emit_bn("backbone.bn1", bb["bn1"], sbb["bn1"])
    from htd_tpu.models.resnet import ARCH_BLOCKS

    for s in range(4):
        for i in range(ARCH_BLOCKS[cfg.backbone.depth][s]):
            fp = bb[f"layer{s+1}_{i}"]
            sfp = sbb[f"layer{s+1}_{i}"]
            tp = f"backbone.layer{s+1}.{i}"
            for j in (1, 2, 3):
                sd[f"{tp}.conv{j}.weight"] = conv_t(fp[f"conv{j}"]["kernel"])
                emit_bn(f"{tp}.bn{j}", fp[f"bn{j}"], sfp[f"bn{j}"])
            sd[f"{tp}.downsample.0.weight"] = conv_t(fp["downsample_conv"]["kernel"])
            emit_bn(f"{tp}.downsample.1", fp["downsample_bn"], sfp["downsample_bn"])

    for i in range(4):
        for tname, fname in (("lateral_convs", "lateral_"), ("fpn_convs", "fpn_")):
            node = params["neck"][f"{fname}{i}"]
            sd[f"neck.{tname}.{i}.conv.weight"] = conv_t(node["kernel"])
            sd[f"neck.{tname}.{i}.conv.bias"] = node["bias"]

    for nm in ("rpn_conv", "rpn_cls", "rpn_reg"):
        sd[f"rpn_head.{nm}.weight"] = conv_t(params["rpn_head"][nm]["kernel"])
        sd[f"rpn_head.{nm}.bias"] = params["rpn_head"][nm]["bias"]

    for i in range(4):
        node = params["glbctx_head"][f"conv{i}"]
        sd[f"roi_head.glbctx_head.convs.{i}.conv.weight"] = conv_t(node["kernel"])
        sd[f"roi_head.glbctx_head.convs.{i}.conv.bias"] = node["bias"]
    sd["roi_head.glbctx_head.fc.weight"] = params["glbctx_head"]["fc"]["kernel"].T
    sd["roi_head.glbctx_head.fc.bias"] = params["glbctx_head"]["fc"]["bias"]

    s0 = params["stage0_head"]
    rf, cin = 7, 256

    def fc_inv_chw(kernel):  # (H*W*C, O) hwc-major -> (O, C*H*W) chw-major
        o = kernel.shape[1]
        k = kernel.reshape(rf, rf, cin, o).transpose(3, 2, 0, 1).reshape(o, cin * rf * rf)
        return k

    sd["roi_head.bbox_head.0.shared_fcs.0.weight"] = fc_inv_chw(s0["fc1"]["kernel"])
    sd["roi_head.bbox_head.0.shared_fcs.0.bias"] = s0["fc1"]["bias"]
    sd["roi_head.bbox_head.0.shared_fcs.1.weight"] = s0["fc2"]["kernel"].T
    sd["roi_head.bbox_head.0.shared_fcs.1.bias"] = s0["fc2"]["bias"]
    sd["roi_head.bbox_head.0.fc_cls.weight"] = s0["fc_cls_kernel"].T
    sd["roi_head.bbox_head.0.fc_cls.bias"] = s0["fc_cls_bias"]
    sd["roi_head.bbox_head.0.fc_reg.weight"] = s0["fc_reg"]["kernel"].T
    sd["roi_head.bbox_head.0.fc_reg.bias"] = s0["fc_reg"]["bias"]

    s1 = params["stage1_head"]
    sd["roi_head.bbox_head.1.fcs.0.weight"] = fc_inv_chw(s1["fcs1"]["kernel"])
    sd["roi_head.bbox_head.1.fcs.0.bias"] = s1["fcs1"]["bias"]
    sd["roi_head.bbox_head.1.fcs.2.weight"] = s1["fcs2"]["kernel"].T
    sd["roi_head.bbox_head.1.fcs.2.bias"] = s1["fcs2"]["bias"]
    sd["roi_head.bbox_head.1.fc_cls.weight"] = s1["fc_cls"]["kernel"].T
    sd["roi_head.bbox_head.1.fc_cls.bias"] = s1["fc_cls"]["bias"]
    sd["roi_head.bbox_head.1.fc_reg.weight"] = s1["fc_reg"]["kernel"].T
    sd["roi_head.bbox_head.1.fc_reg.bias"] = s1["fc_reg"]["bias"]
    for k in range(4):
        sd[f"roi_head.bbox_head.1.graph_lvl{k}_cls.weight"] = s1["graph_kernel"][k].T
        sd[f"roi_head.bbox_head.1.graph_lvl{k}_cls.bias"] = s1["graph_bias"][k]
    for i in range(4):
        sd[f"roi_head.bbox_head.1.convs.{i}.conv.weight"] = conv_t(s1[f"reg_conv{i}"]["kernel"])
        if i < 3:
            sd[f"roi_head.bbox_head.1.convs.{i}.gn.weight"] = s1[f"reg_gn{i}"]["scale"]
            sd[f"roi_head.bbox_head.1.convs.{i}.gn.bias"] = s1[f"reg_gn{i}"]["bias"]

    ae = params["adpt_extractor"]
    sd["roi_head.bbox_roi_extractor.1.conv1.weight"] = ae["att_conv1"]["kernel"].T[:, :, None, None]
    sd["roi_head.bbox_roi_extractor.1.conv1.bias"] = ae["att_conv1"]["bias"]
    sd["roi_head.bbox_roi_extractor.1.conv2.weight"] = ae["att_conv2"]["kernel"].T[:, :, None, None]
    sd["roi_head.bbox_roi_extractor.1.conv2.bias"] = ae["att_conv2"]["bias"]

    converted = convert_mmdet_state_dict(sd, cfg, strict=True)

    # identical tree structure and values round-trip
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = jax.tree_util.tree_leaves_with_path(converted["params"])
    paths_a = {jax.tree_util.keystr(p): v.shape for p, v in flat_a}
    paths_b = {jax.tree_util.keystr(p): v.shape for p, v in flat_b}
    assert paths_a == paths_b
    for (p, va), (_, vb) in zip(sorted(flat_a, key=lambda t: jax.tree_util.keystr(t[0])),
                                sorted(flat_b, key=lambda t: jax.tree_util.keystr(t[0]))):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6,
                                   err_msg=jax.tree_util.keystr(p))
    sa = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(variables["batch_stats"])}
    sb = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(converted["batch_stats"])}
    assert sa == sb


def test_merge_pretrained_backbone_only(rng):
    """Backbone-only checkpoints overlay the backbone, leave heads fresh."""
    from htd_tpu.train.checkpoint import merge_pretrained

    variables = {
        "params": {
            "backbone": {"conv1": {"kernel": np.zeros((3, 3))}},
            "rpn_head": {"rpn_conv": {"kernel": np.ones((2, 2))}},
        },
        "batch_stats": {"backbone": {"bn1": {"mean": np.zeros(4)}}},
    }
    pre = {
        "params": {
            "backbone": {"conv1": {"kernel": np.full((3, 3), 7.0)}},
            "not_in_model": {"x": np.ones(1)},
        },
        "batch_stats": {"backbone": {"bn1": {"mean": np.full(4, 2.0)}}},
    }
    merged = merge_pretrained(variables, pre)
    np.testing.assert_array_equal(
        merged["params"]["backbone"]["conv1"]["kernel"], np.full((3, 3), 7.0)
    )
    np.testing.assert_array_equal(
        merged["params"]["rpn_head"]["rpn_conv"]["kernel"], np.ones((2, 2))
    )
    np.testing.assert_array_equal(
        merged["batch_stats"]["backbone"]["bn1"]["mean"], np.full(4, 2.0)
    )
    assert "not_in_model" not in merged["params"]


def test_x101_dcn_backbone_roundtrip(rng):
    """Converter handles grouped conv2 + grouped DCN (the X-101-DCN layout)."""
    from htd_tpu.config import BackboneConfig, HTDConfig
    from htd_tpu.models.resnet import ResNet, ARCH_BLOCKS

    cfg = HTDConfig(
        backbone=BackboneConfig(
            depth=10, groups=64, base_width=4,
            stage_with_dcn=(False, True, True, True),
        )
    )
    model = ResNet(
        depth=10, groups=64, base_width=4,
        stage_with_dcn=(False, True, True, True),
    )
    variables = jax.jit(lambda r, xx: model.init(r, xx))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def conv_t(p):
        return np.transpose(p, (3, 2, 0, 1))

    sd = {}
    sd["backbone.conv1.weight"] = conv_t(params["conv1"]["kernel"])
    for nm, node, snode in [("backbone.bn1", params["bn1"], stats["bn1"])]:
        sd[nm + ".weight"] = node["scale"]; sd[nm + ".bias"] = node["bias"]
        sd[nm + ".running_mean"] = snode["mean"]; sd[nm + ".running_var"] = snode["var"]
    for s in range(4):
        for i in range(ARCH_BLOCKS[10][s]):
            fp, sfp = params[f"layer{s+1}_{i}"], stats[f"layer{s+1}_{i}"]
            tp = f"backbone.layer{s+1}.{i}"
            for j in (1, 2, 3):
                key = fp[f"conv{j}"]
                if j == 2 and cfg.backbone.stage_with_dcn[s]:
                    sd[f"{tp}.conv2.weight"] = conv_t(key["kernel"])
                    sd[f"{tp}.conv2.conv_offset.weight"] = conv_t(key["conv_offset"]["kernel"])
                    sd[f"{tp}.conv2.conv_offset.bias"] = key["conv_offset"]["bias"]
                else:
                    sd[f"{tp}.conv{j}.weight"] = conv_t(key["kernel"])
                bn = fp[f"bn{j}"]; sbn = sfp[f"bn{j}"]
                sd[f"{tp}.bn{j}.weight"] = bn["scale"]; sd[f"{tp}.bn{j}.bias"] = bn["bias"]
                sd[f"{tp}.bn{j}.running_mean"] = sbn["mean"]; sd[f"{tp}.bn{j}.running_var"] = sbn["var"]
            sd[f"{tp}.downsample.0.weight"] = conv_t(fp["downsample_conv"]["kernel"])
            dbn, sdbn = fp["downsample_bn"], sfp["downsample_bn"]
            sd[f"{tp}.downsample.1.weight"] = dbn["scale"]; sd[f"{tp}.downsample.1.bias"] = dbn["bias"]
            sd[f"{tp}.downsample.1.running_mean"] = sdbn["mean"]; sd[f"{tp}.downsample.1.running_var"] = sdbn["var"]

    converted = convert_mmdet_state_dict(sd, cfg, strict=False)
    a = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(params)}
    b = {jax.tree_util.keystr(p): v.shape for p, v in jax.tree_util.tree_leaves_with_path(converted["params"]["backbone"])}
    assert a == b
    # exact value round-trip on a dcn block
    np.testing.assert_allclose(
        np.asarray(converted["params"]["backbone"]["layer2_0"]["conv2"]["kernel"]),
        params["layer2_0"]["conv2"]["kernel"], rtol=1e-6,
    )
