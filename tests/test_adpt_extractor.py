"""AdptRoIExtractor (BA extractor) vs a per-level numpy composition."""

import numpy as np
import jax
import jax.numpy as jnp

from htd_tpu.config import RoIExtractorConfig
from htd_tpu.models.roi_extract import AdptRoIExtractor
from tests.oracles import np_roi_align


def test_adpt_matches_numpy_composition(rng):
    cfg = RoIExtractorConfig(
        featmap_strides=(4, 8), max_samples=2, adpt_max_samples=2, adpt_edge=1
    )
    feats = [
        rng.normal(0, 1, (1, 32, 48, 8)).astype(np.float32),
        rng.normal(0, 1, (1, 16, 24, 8)).astype(np.float32),
    ]
    rois = np.zeros((1, 6, 4), np.float32)
    rois[0, :, 0] = rng.uniform(0, 120, 6)
    rois[0, :, 1] = rng.uniform(0, 80, 6)
    rois[0, :, 2] = rois[0, :, 0] + rng.uniform(10, 50, 6)
    rois[0, :, 3] = rois[0, :, 1] + rng.uniform(10, 40, 6)

    mod = AdptRoIExtractor(cfg)
    variables = mod.init(
        jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats], jnp.asarray(rois)
    )
    out = np.asarray(
        mod.apply(variables, [jnp.asarray(f) for f in feats], jnp.asarray(rois))
    )

    # numpy oracle: per-level exact roi_align (S=2 clamp is exact here since
    # roi extents are small), attention from extracted params, softmax over
    # levels, weighted sum + level-0 border ring
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    k1, b1 = p["att_conv1"]["kernel"], p["att_conv1"]["bias"]
    k2, b2 = p["att_conv2"]["kernel"], p["att_conv2"]["bias"]

    per_level, logits = [], []
    for lvl, stride in enumerate(cfg.featmap_strides):
        rf = np_roi_align(feats[lvl][0], rois[0], 1.0 / stride, 7, 0)
        per_level.append(rf)
        pooled = rf.mean(axis=(1, 2))
        a = np.tanh(pooled @ k1 + b1) @ k2 + b2
        logits.append(a[:, 0])
    att = np.exp(np.stack(logits) - np.max(logits, axis=0))
    att = att / att.sum(axis=0)
    fused = sum(att[l][:, None, None, None] * per_level[l] for l in range(2))
    ring = per_level[0].copy()
    ring[:, 1:-1, 1:-1, :] = 0
    expected = fused + ring
    np.testing.assert_allclose(out[0], expected, rtol=1e-3, atol=1e-4)
