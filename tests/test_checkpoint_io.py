"""Orbax checkpoint save/restore round-trip of the full train state."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from htd_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from htd_tpu.train.train_step import TrainBatch, create_train_state
from tests.tiny import tiny_config, synthetic_batch


@pytest.mark.slow
def test_train_state_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    cfg = tiny_config()
    images, img_shapes, _, gt_boxes, gt_labels, gt_valid = synthetic_batch(
        rng, b=1, h=64, w=96, max_gt=cfg.train.max_gt
    )
    batch = TrainBatch(
        images=jnp.asarray(images), img_shapes=jnp.asarray(img_shapes),
        gt_boxes=jnp.asarray(gt_boxes), gt_labels=jnp.asarray(gt_labels),
        gt_valid=jnp.asarray(gt_valid),
    )
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=10
    )
    path = str(tmp_path / "ckpt1")
    save_checkpoint(path, jax.device_get(state))
    restored = restore_checkpoint(path, jax.device_get(state))
    a = jax.tree_util.tree_leaves_with_path(state.params)
    b = jax.tree_util.tree_leaves_with_path(restored.params)
    assert len(a) == len(b)
    for (pa, va), (pb, vb) in zip(a, b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    assert int(restored.step) == int(state.step)
