"""Train-step + multi-device (8 virtual CPU chips) tests.

The reference has no distributed tests (SURVEY.md §4); these validate the
TPU-native equivalent of its DDP path: batch sharded over a 1-D data mesh,
replicated params, XLA-inserted gradient all-reduce.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from htd_tpu.train.train_step import (
    TrainBatch,
    create_train_state,
    make_jitted_train_step,
)
from htd_tpu.parallel.mesh import make_mesh, shard_pytree_batch
from tests.tiny import tiny_config, synthetic_batch


def _batch(rng, b, h=64, w=96, max_gt=8):
    images, img_shapes, _, gt_boxes, gt_labels, gt_valid = synthetic_batch(
        rng, b=b, h=h, w=w, max_gt=max_gt
    )
    return TrainBatch(
        images=jnp.asarray(images),
        img_shapes=jnp.asarray(img_shapes),
        gt_boxes=jnp.asarray(gt_boxes),
        gt_labels=jnp.asarray(gt_labels),
        gt_valid=jnp.asarray(gt_valid),
    )


def test_train_step_updates_and_freezing():
    rng = np.random.RandomState(0)
    cfg = tiny_config()
    batch = _batch(rng, b=2)
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=10
    )
    step = make_jitted_train_step(model, tx)
    # snapshot BEFORE the step: the jitted step donates the input state
    p0 = state.params["backbone"]
    before = {
        "conv1": np.asarray(p0["conv1"]["kernel"]),
        "l1": np.asarray(p0["layer1_0"]["conv1"]["kernel"]),
        "l2": np.asarray(p0["layer2_0"]["conv1"]["kernel"]),
        "rpn": np.asarray(state.params["rpn_head"]["rpn_conv"]["kernel"]),
    }
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    for k in ["loss_rpn_cls", "s0.loss_cls", "s1.loss_cls", "loss_global"]:
        assert np.isfinite(float(metrics[k]))
    # frozen: stem + layer1 params unchanged
    p1 = state1.params["backbone"]
    np.testing.assert_array_equal(before["conv1"], np.asarray(p1["conv1"]["kernel"]))
    np.testing.assert_array_equal(before["l1"], np.asarray(p1["layer1_0"]["conv1"]["kernel"]))
    # trainable: layer2+ and heads changed
    assert not np.array_equal(before["l2"], np.asarray(p1["layer2_0"]["conv1"]["kernel"]))
    assert not np.array_equal(
        before["rpn"], np.asarray(state1.params["rpn_head"]["rpn_conv"]["kernel"])
    )


@pytest.mark.multichip
def test_train_step_data_parallel_8dev():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    rng = np.random.RandomState(1)
    cfg = tiny_config()
    batch = _batch(rng, b=8, h=32, w=32)
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), _batch(rng, b=1, h=32, w=32), steps_per_epoch=10
    )
    mesh = make_mesh(8)
    step = make_jitted_train_step(model, tx, mesh=mesh)
    with mesh:
        sharded_batch = shard_pytree_batch(mesh, batch)
        state = jax.device_put(state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        state1, metrics = step(state, sharded_batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated & synchronized
    k = state1.params["rpn_head"]["rpn_conv"]["kernel"]
    assert k.sharding.is_fully_replicated
