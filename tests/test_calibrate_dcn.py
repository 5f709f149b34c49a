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


def test_calibrate_dcn_aggregates_batches(rng):
    """An iterable of batches aggregates; worst-case stats dominate."""
    cfg = tiny_config()
    cfg = cfg.replace(backbone=dataclasses.replace(
        cfg.backbone, stage_with_dcn=(False, True, True, True)))
    model = HTDDetector(cfg)
    img = jnp.asarray(rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, img,
        jnp.asarray([[64.0, 96.0]]), jnp.ones((1, 4)))
    one, rec1 = calibrate_dcn(model, variables, img)
    two, rec2 = calibrate_dcn(model, variables, [img, img * 2.0])
    assert set(one) == set(two)
    for k in one:
        assert two[k]["flagged_px_per_img_p100"] >= \
            one[k]["flagged_px_per_img_p100"]


def test_auto_calibrate_applies_env(rng):
    """init_detector auto-calibration: a pathological checkpoint (inflated
    offset biases, the ab_dcn_window.py emulation) must auto-select a
    non-saturating config; zero-init offsets keep the fast asym window.
    VERDICT r04 item 2."""
    import os

    from htd_tpu.apis import _auto_calibrate_dcn

    VARS = ("HTD_DCN_IMPL", "HTD_DCN_FB_CAP", "HTD_DCN_WIN")
    before = {k: os.environ.get(k) for k in VARS}

    def clear():
        for k in VARS:
            os.environ.pop(k, None)

    cfg = tiny_config()
    cfg = cfg.replace(backbone=dataclasses.replace(
        cfg.backbone, stage_with_dcn=(False, True, True, True)))
    model = HTDDetector(cfg)
    img = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, img,
        jnp.asarray([[64.0, 96.0]] * 2), jnp.ones((2, 4)))

    try:
        # zero-init offsets: nothing flags -> asym window + floor cap
        clear()
        _auto_calibrate_dcn(model, variables, img)
        assert os.environ.get("HTD_DCN_WIN") == "asym"
        assert int(os.environ["HTD_DCN_FB_CAP"]) >= 128

        # saturating offsets -> exact gather path
        def shift_bias(tree, path=()):
            if isinstance(tree, dict):
                return {k: shift_bias(v, path + (k,))
                        for k, v in tree.items()}
            return (tree + 3.0
                    if "conv_offset" in path and tree.ndim == 1 else tree)

        clear()
        v2 = dict(variables, params=shift_bias(variables["params"]))
        _auto_calibrate_dcn(model, v2, img)
        assert os.environ.get("HTD_DCN_IMPL") == "gather"

        # escape hatch: explicit env wins, calibration must not touch it
        clear()
        os.environ["HTD_DCN_IMPL"] = "pallas"
        _auto_calibrate_dcn(model, v2, img)
        assert os.environ["HTD_DCN_IMPL"] == "pallas"
        assert "HTD_DCN_FB_CAP" not in os.environ
    finally:
        for k, v in before.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
