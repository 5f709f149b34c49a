import numpy as np
import jax
import jax.numpy as jnp
import torch

from htd_tpu.config import GlobalContextConfig, HTDHeadConfig, RoIExtractorConfig
from htd_tpu.models.heads import (
    GlobalContextHead,
    HTDBBoxHead,
    Shared2FCBBoxHead,
    _pgraph_single,
)
from tests.oracles import np_iou


def np_pgraph(x_feat, sam, rois, lvls, valid):
    """Loop-based oracle of the PGraph block math (reference
    htd_bbox_head.py:194-219 semantics, re-derived independently)."""
    r, f = x_feat.shape
    out = np.zeros((r, f), np.float64)
    for lvl in np.unique(lvls[valid]):
        idx = np.where((lvls == lvl) & valid)[0]
        if len(idx) == 0:
            continue
        iou = np_iou(rois[idx], rois[idx])
        np.fill_diagonal(iou, 1.0)
        m = (iou > 0).astype(np.float64)  # binarized local adjacency
        d = np.diag(m.sum(-1) ** -0.5)
        a_local = d @ m @ d
        mixed = a_local @ x_feat[idx]
        sim = sam[idx] @ sam[idx].T
        score = (1.0 - m) * sim
        e = np.exp(score - score.max(-1, keepdims=True))
        a_global = e / e.sum(-1, keepdims=True)
        out[idx] = a_global @ mixed
    return out


def test_pgraph_matches_loop_oracle(rng):
    r, f, s = 24, 16, 10
    x = rng.normal(0, 1, (r, f)).astype(np.float32)
    sam = rng.normal(0, 1, (r, s)).astype(np.float32)
    rois = rng.uniform(0, 400, (r, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(20, 300, (r, 2))
    lvls = rng.randint(0, 4, r)
    valid = rng.uniform(0, 1, r) > 0.2
    ours = np.asarray(
        _pgraph_single(
            jnp.asarray(x), jnp.asarray(sam), jnp.asarray(rois),
            jnp.asarray(lvls), jnp.asarray(valid),
        )
    )
    ref = np_pgraph(x, sam, rois, lvls, valid)
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=1e-3, atol=1e-4)


def test_pgraph_groups_are_independent(rng):
    """Features in one (level) group must not leak into another."""
    r, f = 12, 8
    x = rng.normal(0, 1, (r, f)).astype(np.float32)
    sam = rng.normal(0, 1, (r, 5)).astype(np.float32)
    rois = rng.uniform(0, 100, (r, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + 20
    lvls = np.array([0] * 6 + [1] * 6)
    valid = np.ones(r, bool)
    base = np.asarray(_pgraph_single(
        jnp.asarray(x), jnp.asarray(sam), jnp.asarray(rois),
        jnp.asarray(lvls), jnp.asarray(valid)))
    # perturb group-1 features: group-0 outputs unchanged
    x2 = x.copy()
    x2[6:] += 100.0
    pert = np.asarray(_pgraph_single(
        jnp.asarray(x2), jnp.asarray(sam), jnp.asarray(rois),
        jnp.asarray(lvls), jnp.asarray(valid)))
    np.testing.assert_allclose(base[:6], pert[:6], rtol=1e-5)
    assert np.abs(base[6:] - pert[6:]).max() > 1.0


def test_shared2fc_head_matches_torch(rng):
    head = Shared2FCBBoxHead(num_classes=10, fc_out=32)
    x = rng.normal(0, 1, (3, 7, 7, 8)).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    cls, reg = head.apply(variables, jnp.asarray(x))
    assert cls.shape == (3, 11) and reg.shape == (3, 4)

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    xt = torch.from_numpy(x.reshape(3, -1))
    h = torch.relu(xt @ torch.from_numpy(p["fc1"]["kernel"]) + torch.from_numpy(p["fc1"]["bias"]))
    h = torch.relu(h @ torch.from_numpy(p["fc2"]["kernel"]) + torch.from_numpy(p["fc2"]["bias"]))
    cls_t = h @ torch.from_numpy(p["fc_cls_kernel"]) + torch.from_numpy(p["fc_cls_bias"])
    reg_t = h @ torch.from_numpy(p["fc_reg"]["kernel"]) + torch.from_numpy(p["fc_reg"]["bias"])
    np.testing.assert_allclose(np.asarray(cls), cls_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), rtol=1e-4, atol=1e-5)


def test_global_context_head(rng):
    cfg = GlobalContextConfig(num_convs=2, conv_out_channels=16)
    head = GlobalContextHead(cfg, num_classes_p1=11)
    x = rng.normal(0, 1, (2, 5, 6, 8)).astype(np.float32)
    variables = head.init(jax.random.PRNGKey(0), jnp.asarray(x))
    logits, feat = head.apply(variables, jnp.asarray(x))
    assert logits.shape == (2, 11)
    assert feat.shape == (2, 16)


def test_htd_head_gn_matches_torch(rng):
    """The BA reg conv stack's GroupNorm must equal torch's."""
    gn_torch = torch.nn.GroupNorm(4, 16, eps=1e-5)
    with torch.no_grad():
        gn_torch.weight.copy_(torch.from_numpy(rng.normal(1, 0.2, 16).astype(np.float32)))
        gn_torch.bias.copy_(torch.from_numpy(rng.normal(0, 0.2, 16).astype(np.float32)))
    x = rng.normal(0, 2, (3, 16, 7, 7)).astype(np.float32)
    ref = gn_torch(torch.from_numpy(x)).detach().numpy()

    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    variables = {
        "params": {
            "scale": jnp.asarray(gn_torch.weight.detach().numpy()),
            "bias": jnp.asarray(gn_torch.bias.detach().numpy()),
        }
    }
    ours = gn.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_htd_head_shapes(rng):
    cfg = HTDHeadConfig(
        in_channels=8, fc_out_channels=32, num_classes=10,
        reg_mid_channels=16, reg_out_channels=32, gn_groups=4,
    )
    head = HTDBBoxHead(cfg, num_levels=4)
    b, r, p = 2, 12, 6
    x_cls = rng.normal(0, 1, (b, r, 7, 7, 8)).astype(np.float32)
    x_reg = x_cls[:, :p]
    rois = rng.uniform(0, 300, (b, r, 4)).astype(np.float32)
    rois[..., 2:] = rois[..., :2] + rng.uniform(10, 200, (b, r, 2))
    valid = np.ones((b, r), bool)
    k0 = rng.normal(0, 0.1, (32, 11)).astype(np.float32)
    b0 = np.zeros(11, np.float32)
    enhanced = rng.normal(0, 1, (b, p, 7, 7, 8)).astype(np.float32)
    gfeat = rng.normal(0, 1, (b, 8)).astype(np.float32)

    variables = head.init(
        jax.random.PRNGKey(0),
        jnp.asarray(x_cls), jnp.asarray(x_reg), jnp.asarray(rois),
        jnp.asarray(valid), jnp.asarray(k0), jnp.asarray(b0),
        jnp.asarray(enhanced), jnp.asarray(gfeat),
    )
    cls, reg = head.apply(
        variables,
        jnp.asarray(x_cls), jnp.asarray(x_reg), jnp.asarray(rois),
        jnp.asarray(valid), jnp.asarray(k0), jnp.asarray(b0),
        jnp.asarray(enhanced), jnp.asarray(gfeat),
    )
    assert cls.shape == (b, r, 11)
    assert reg.shape == (b, p, 4)
    assert np.isfinite(np.asarray(cls)).all()
    assert np.isfinite(np.asarray(reg)).all()
