"""conv3x3_tapdot == lax 3x3 conv (the schedule-only reformulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from htd_tpu.ops.conv3x3 import TapDotConv3x3, conv3x3_tapdot
import flax.linen as nn


@pytest.mark.parametrize("shape", [(1, 12, 17, 8), (2, 7, 5, 16), (3, 4, 3)])
def test_tapdot_matches_conv(shape):
    rng = np.random.RandomState(0)
    cin = shape[-1]
    co = 24
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, co)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (co,)).astype(np.float32))
    got = conv3x3_tapdot(x, k, b)
    xb = x[None] if x.ndim == 3 else x
    want = jax.lax.conv_general_dilated(
        xb, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    if x.ndim == 3:
        want = want[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_tapdot_module_param_tree_matches_nn_conv():
    """Same param names/shapes as nn.Conv -> checkpoints interchangeable."""
    x = jnp.zeros((1, 8, 9, 6), jnp.float32)
    m1 = TapDotConv3x3(10)
    m2 = nn.Conv(10, (3, 3), padding=((1, 1), (1, 1)))
    v1 = m1.init(jax.random.PRNGKey(0), x)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    t1 = jax.tree.map(lambda a: (a.shape, a.dtype), v1)
    t2 = jax.tree.map(lambda a: (a.shape, a.dtype), v2)
    assert t1 == t2
    # identical init streams -> identical outputs
    y1 = m1.apply(v2, x.at[:, 2, 3, :].set(1.0))
    y2 = m2.apply(v2, x.at[:, 2, 3, :].set(1.0))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-6)


def test_tapdot_grad_matches_conv():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 7, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 4, 5)).astype(np.float32))

    def loss_tap(k_):
        return jnp.sum(conv3x3_tapdot(x, k_) ** 2)

    def loss_ref(k_):
        y = jax.lax.conv_general_dilated(
            x, k_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y ** 2)

    g1 = jax.grad(loss_tap)(k)
    g2 = jax.grad(loss_ref)(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_bf16_interp_close_to_f32():
    """bf16 interp accumulation (the default for bf16 feats) stays within
    bf16 rounding of the f32-accumulated result."""
    from htd_tpu.ops.roi_align import _roi_align_core

    rng = np.random.RandomState(2)
    n, c, r = 64 * 9, 32, 13
    flat32 = jnp.asarray(rng.normal(0, 1, (n, c)).astype(np.float32))
    rois = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 3, r), rng.uniform(0, 3, r),
                rng.uniform(4, 8, r), rng.uniform(4, 8, r),
            ],
            axis=1,
        ).astype(np.float32)
    )
    kw = dict(
        scale=jnp.ones((r,), jnp.float32),
        fh=jnp.full((r,), 9.0, jnp.float32),
        fw=jnp.full((r,), 9.0, jnp.float32),
        row_offset=jnp.zeros((r,), jnp.int32),
        out_size=7,
        sampling_ratio=0,
        max_samples=4,
        row_stride=jnp.full((r,), 9, jnp.float32),
    )
    ref = np.asarray(_roi_align_core(flat32, rois, **kw))
    got = np.asarray(
        _roi_align_core(flat32.astype(jnp.bfloat16), rois, **kw)
    ).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.06, atol=0.06)
