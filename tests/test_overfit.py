"""End-to-end training sanity: overfitting one synthetic image must drive
the losses down substantially — exercises grads, assigner/sampler, target
encoding, LR schedule, and the optimizer wiring together."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from htd_tpu.train.train_step import (
    TrainBatch,
    create_train_state,
    make_jitted_train_step,
)
from tests.tiny import tiny_config, synthetic_batch


@pytest.mark.slow
def test_overfit_single_image():
    rng = np.random.RandomState(3)
    cfg = tiny_config()
    images, img_shapes, _, gt_boxes, gt_labels, gt_valid = synthetic_batch(
        rng, b=1, h=64, w=96, num_gt=2, max_gt=cfg.train.max_gt
    )
    batch = TrainBatch(
        images=jnp.asarray(images),
        img_shapes=jnp.asarray(img_shapes),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_valid=jnp.asarray(gt_valid),
    )
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=10_000
    )
    step = make_jitted_train_step(model, tx)
    rng_key = jax.random.PRNGKey(42)
    first = None
    losses = []
    for it in range(60):
        state, metrics = step(state, batch, rng_key)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"loss diverged at iter {it}: {loss}"
        losses.append(loss)
        if first is None:
            first = loss
    tail = float(np.mean(losses[-5:]))
    head = float(np.mean(losses[:5]))
    assert tail < 0.6 * head, f"no convergence: first5={head:.4f} last5={tail:.4f}"
    # classification should become confident on the overfit image
    assert float(metrics["s0.acc"]) > 0.8
