"""TTA equivalence: a single identity aug must reproduce simple_test
(the reference's test_models_aug_test.py pattern)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from htd_tpu.apis import aug_inference_detector, inference_detector, make_inference_fn
from htd_tpu.models.detector import HTDDetector
from tests.tiny import tiny_config


@pytest.fixture(scope="module")
def model_and_vars():
    from htd_tpu.config import RCNNTestConfig

    # random-init softmax scores hover around 1/81 < 0.05; lower the
    # threshold so there are detections to compare
    cfg = tiny_config(rcnn_test=RCNNTestConfig(score_thr=0.003, max_per_img=10))
    model = HTDDetector(cfg)
    init = jax.jit(lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf))
    variables = init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 96, 3)),
        jnp.asarray([[64.0, 96.0]]),
        jnp.ones((1, 4)),
    )
    return model, variables


def test_single_aug_matches_simple_test(model_and_vars, rng):
    model, variables = model_and_vars
    img = rng.randint(0, 255, (60, 90, 3)).astype(np.uint8)
    scale = (96, 64)

    b1, s1, l1 = inference_detector(model, variables, img, scale=scale)
    b2, s2, l2 = aug_inference_detector(
        model, variables, img, scales=[scale], flip=False
    )
    k = min(len(s1), len(s2), 5)
    assert k > 0, "no detections at all"
    np.testing.assert_array_equal(l1[:k], l2[:k])
    np.testing.assert_allclose(s1[:k], s2[:k], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(b1[:k], b2[:k], rtol=1e-3, atol=0.1)


def test_flip_aug_runs(model_and_vars, rng):
    model, variables = model_and_vars
    img = rng.randint(0, 255, (60, 90, 3)).astype(np.uint8)
    boxes, scores, labels = aug_inference_detector(
        model, variables, img, scales=[(96, 64)], flip=True
    )
    assert boxes.shape[1] == 4
    assert np.isfinite(boxes).all()
    # boxes live in the original image frame
    if len(boxes):
        assert boxes[:, 2].max() <= 90 + 1e-3
        assert boxes[:, 3].max() <= 60 + 1e-3


def test_multiscale_flip_aug_runs(model_and_vars, rng):
    """The mstrain TTA shape: 2 scales x [no-flip, flip] (the reference
    MultiScaleFlipAug expansion) — merged output stays in the original
    frame and is finite."""
    model, variables = model_and_vars
    img = rng.randint(0, 255, (60, 90, 3)).astype(np.uint8)
    boxes, scores, labels = aug_inference_detector(
        model, variables, img, scales=[(96, 64), (128, 80)], flip=True
    )
    assert np.isfinite(boxes).all() and np.isfinite(scores).all()
    if len(boxes):
        assert boxes[:, 2].max() <= 90 + 1e-3
        assert boxes[:, 3].max() <= 60 + 1e-3


def test_tta_jit_cache_keyed_by_config(model_and_vars, rng):
    """VERDICT r04 item 8: rebuilding the variables (or the model object)
    must REUSE the traced TTA programs — the cache is keyed by config,
    not object ids, so it cannot grow with object churn."""
    from htd_tpu import apis

    model, variables = model_and_vars
    img = rng.randint(0, 255, (60, 90, 3)).astype(np.uint8)
    aug_inference_detector(model, variables, img, scales=[(96, 64)])
    n0 = len(apis._TTA_JIT_CACHE)
    assert n0 > 0

    # fresh variables AND a fresh model object with an equal config
    model2 = HTDDetector(model.cfg)
    init = jax.jit(lambda r, im, sh, sf: model2.init({"params": r}, im, sh, sf))
    variables2 = init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 64, 96, 3)),
        jnp.asarray([[64.0, 96.0]]),
        jnp.ones((1, 4)),
    )
    b, s, l = aug_inference_detector(model2, variables2, img, scales=[(96, 64)])
    assert len(apis._TTA_JIT_CACHE) == n0, "TTA jit cache grew on object churn"
    assert np.isfinite(b).all()
