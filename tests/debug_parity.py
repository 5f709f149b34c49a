"""Diagnostic: compare torch-mirror vs htd_tpu intermediates stage by stage."""
import dataclasses

import numpy as np
import torch
import jax
import jax.numpy as jnp

from tests import torch_htd as TH
from tests.test_e2e_parity import _exact_cfg, _image, _proposals
from htd_tpu.models.detector import HTDDetector
from htd_tpu.train.checkpoint import convert_mmdet_state_dict


def err(name, a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    print(f"{name:28s} max|d|={np.abs(a-b).max():.3e}  rms={np.sqrt(((a-b)**2).mean()):.3e}  scale={np.abs(b).max():.3e}")


cfg = _exact_cfg()
tm = TH.randomize(TH.TorchHTDDetector(depth=50), seed=1)
sd = TH.state_dict_np(tm)
variables = convert_mmdet_state_dict(sd, cfg)
jm = HTDDetector(cfg)
img, timg = _image(0)
props = _proposals()
IMG_SHAPE = (149.0, 200.0)

with torch.no_grad():
    tfeats = tm.extract_feat(timg)

jfeats = jm.apply(variables, jnp.asarray(img), method=jm.extract_feats)
for i in range(5):
    err(f"fpn[{i}]", np.asarray(jfeats[i][0]), tfeats[i][0].permute(1, 2, 0).numpy())

# stage-0 roi feats
rois5 = torch.cat([torch.zeros(props.shape[0], 1), torch.from_numpy(props)], 1)
with torch.no_grad():
    t_roifeat = tm.roi_head.bbox_roi_extractor[0](tfeats[:4], rois5)
    t_mc, t_glob = tm.roi_head.glbctx_head(tfeats)
    t_fused = tm.roi_head._fuse_global(t_roifeat, t_glob, rois5)
    t_s0cls, t_s0reg = tm.roi_head.bbox_head[0](t_fused)

def jax_pieces(m, images, shapes, rois, valid):
    feats = m.extract_feats(images)
    feats4 = feats[:4]
    _, gfeat = m._global(feats)
    roifeat = m._roi_feats(feats4, rois)
    s0c, s0r = m._stage0(feats4, rois, gfeat)
    rois1 = m._refine(rois, s0c, s0r, shapes)
    s1c, s1r, _ = m._stage1(feats4, rois1, valid, rois1, None, gfeat)
    enhanced = m.adpt_extractor(feats4, rois)
    return roifeat, gfeat, s0c, s0r, rois1, s1c, s1r, enhanced

roifeat, gfeat, s0c, s0r, rois1, s1c, s1r, enhanced = jm.apply(
    variables, jnp.asarray(img), jnp.asarray([IMG_SHAPE], jnp.float32),
    jnp.asarray(props[None]), jnp.ones((1, props.shape[0]), bool),
    method=jax_pieces,
)
err("glob_feat", np.asarray(gfeat[0]), t_glob[0, :, 0, 0].numpy())
err("s0_roifeat", np.asarray(roifeat[0]).transpose(0, 3, 1, 2), t_roifeat.numpy())
err("s0_cls", np.asarray(s0c[0]), t_s0cls.numpy())
err("s0_reg", np.asarray(s0r[0]), t_s0reg.numpy())

with torch.no_grad():
    t_refined = TH.delta2bbox_t(rois5[:, 1:], t_s0reg, stds=(0.1, 0.1, 0.2, 0.2), max_shape=IMG_SHAPE)
err("rois1", np.asarray(rois1[0]), t_refined.numpy())

t_rois1_5 = torch.cat([rois5[:, :1], t_refined], 1)
with torch.no_grad():
    t_enh = tm.roi_head.bbox_roi_extractor[1](tfeats[:4], t_rois1_5)
    t_bf = tm.roi_head.bbox_roi_extractor[0](tfeats[:4], t_rois1_5)
    t_s1cls, t_s1reg = tm.roi_head.bbox_head[1](
        t_bf, t_bf, tfeats[:4], t_rois1_5, tm.roi_head.bbox_head[0].fc_cls,
        t_enh, t_rois1_5, t_glob)
# jax enhanced was computed on the ORIGINAL props above; recompute on rois1 path:
def jax_enh(m, images, rois):
    feats = m.extract_feats(images)
    return m.adpt_extractor(feats[:4], rois)
enh2 = jm.apply(variables, jnp.asarray(img), rois1, method=jax_enh)
err("enhanced(rois1)", np.asarray(enh2[0]).transpose(0, 3, 1, 2), t_enh.numpy())
err("s1_cls", np.asarray(s1c[0]), t_s1cls.numpy())
err("s1_reg", np.asarray(s1r[0]), t_s1reg.numpy())
