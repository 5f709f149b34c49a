"""Full-detector forward smoke tests (the reference's test_forward.py
pattern: build from config, synthetic batch, train + test forward)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from htd_tpu.models.detector import HTDDetector
from tests.tiny import tiny_config, synthetic_batch


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    cfg = tiny_config()
    model = HTDDetector(cfg)
    batch = synthetic_batch(rng, b=2, h=64, w=96, max_gt=cfg.train.max_gt)
    images, img_shapes, scale_factors, gt_boxes, gt_labels, gt_valid = batch
    init = jax.jit(
        lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf)
    )
    variables = init(
        jax.random.PRNGKey(0),
        jnp.asarray(images),
        jnp.asarray(img_shapes),
        jnp.asarray(scale_factors),
    )
    return cfg, model, variables, batch


def test_simple_test_shapes(setup):
    cfg, model, variables, batch = setup
    images, img_shapes, scale_factors, *_ = batch
    dets = jax.jit(model.apply)(
        variables,
        jnp.asarray(images),
        jnp.asarray(img_shapes),
        jnp.asarray(scale_factors),
    )
    m = cfg.rcnn_test.max_per_img
    assert dets.boxes.shape == (2, m, 4)
    assert dets.scores.shape == (2, m)
    assert dets.labels.shape == (2, m)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    v = np.asarray(dets.valid)
    s = np.asarray(dets.scores)
    assert (s[v] > cfg.rcnn_test.score_thr - 1e-6).all()
    lab = np.asarray(dets.labels)
    assert ((lab >= 0) & (lab < cfg.num_classes)).all()
    # boxes are clipped to the (rescaled) image
    b = np.asarray(dets.boxes)[v]
    if len(b):
        assert (b[:, 2] >= b[:, 0] - 1e-4).all()
        assert b.max() <= 96.0 + 1e-3


def test_forward_train_losses(setup):
    cfg, model, variables, batch = setup
    images, img_shapes, scale_factors, gt_boxes, gt_labels, gt_valid = batch
    train_fn = jax.jit(
        lambda v, im, sh, gb, gl, gv, r: model.apply(
            v, im, sh, gb, gl, gv,
            method=model.forward_train, rngs={"sampling": r},
        )
    )
    losses = train_fn(
        variables,
        jnp.asarray(images),
        jnp.asarray(img_shapes),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_valid),
        jax.random.PRNGKey(7),
    )
    expected = {
        "loss_rpn_cls", "loss_rpn_bbox", "loss_global",
        "s0.loss_cls", "s0.loss_bbox", "s0.acc",
        "s1.loss_cls", "s1.loss_bbox", "s1.acc",
    }
    assert set(losses) == expected
    for k, v in losses.items():
        val = float(v)
        assert np.isfinite(val), f"{k} is not finite: {val}"
    # with random weights + real gt, losses should be positive
    assert float(losses["loss_rpn_cls"]) > 0
    assert float(losses["s0.loss_cls"]) > 0
    assert float(losses["s1.loss_cls"]) > 0
    assert float(losses["loss_global"]) > 0


def test_forward_train_grads_flow(setup):
    """Gradients reach every major submodule and are finite."""
    cfg, model, variables, batch = setup
    images, img_shapes, scale_factors, gt_boxes, gt_labels, gt_valid = batch

    def loss_fn(params):
        losses = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(images),
            jnp.asarray(img_shapes),
            jnp.asarray(gt_boxes),
            jnp.asarray(gt_labels),
            jnp.asarray(gt_valid),
            method=model.forward_train,
            rngs={"sampling": jax.random.PRNGKey(7)},
        )
        return sum(v for k, v in losses.items() if "loss" in k)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert all(np.isfinite(np.asarray(g)).all() for _, g in flat)
    by_module = {}
    for path, g in flat:
        top = path[0].key
        by_module.setdefault(top, 0.0)
        by_module[top] += float(jnp.sum(jnp.abs(g)))
    for mod in ["backbone", "neck", "rpn_head", "glbctx_head",
                "stage0_head", "stage1_head", "adpt_extractor"]:
        assert by_module.get(mod, 0.0) > 0.0, f"no gradient into {mod}"
