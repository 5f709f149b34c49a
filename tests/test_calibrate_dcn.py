"""calibrate_dcn: per-conv out-of-window offset statistics + dispatch
recommendation (the production contract from PERF.md "DCN window
fidelity contract", automated)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from htd_tpu.apis import calibrate_dcn
from htd_tpu.models.detector import HTDDetector
from tests.tiny import tiny_config

pytestmark = pytest.mark.fast


def test_calibrate_dcn_recommends_by_offset_magnitude(rng):
    cfg = tiny_config()
    cfg = cfg.replace(backbone=dataclasses.replace(
        cfg.backbone, stage_with_dcn=(False, True, True, True)))
    model = HTDDetector(cfg)
    img = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, img,
        jnp.asarray([[64.0, 96.0]] * 2), jnp.ones((2, 4)))

    # zero-init offset convs (mmcv init): nothing flagged, kernel fine
    per_conv, rec = calibrate_dcn(model, variables, img)
    assert set(per_conv) == {"layer2_0", "layer3_0", "layer4_0"}
    assert all(v["flag_rate"] == 0.0 for v in per_conv.values())
    assert rec["impl"] == "pallas"

    # multi-pixel offsets everywhere: the capped correction would
    # saturate -> recommend the exact gather path
    def shift_bias(tree, path=()):
        if isinstance(tree, dict):
            return {k: shift_bias(v, path + (k,)) for k, v in tree.items()}
        return tree + 3.0 if "conv_offset" in path and tree.ndim == 1 else tree

    v2 = dict(variables, params=shift_bias(variables["params"]))
    per2, rec2 = calibrate_dcn(model, v2, img)
    assert any(v["flag_rate"] > 0.5 for v in per2.values())
    assert rec2["impl"] == "gather"
