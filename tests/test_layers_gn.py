"""MXUGroupNorm == nn.GroupNorm (the perf reformulation is semantics-free).

The BA reg conv stack's GN (reference htd_bbox_head.py:103-117, GN(36) on
576 channels) is the hot user: per-roi statistics over (7, 7, C).
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from htd_tpu.models.layers import MXUGroupNorm


@pytest.mark.parametrize("shape,groups", [((13, 7, 7, 576), 36),
                                          ((5, 7, 7, 64), 8),
                                          ((3, 25, 42, 256), 16)])
def test_matches_flax_f32(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, shape).astype(np.float32))
    ref = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    new = MXUGroupNorm(num_groups=groups, epsilon=1e-5)
    v = ref.init(jax.random.PRNGKey(0), x)
    # non-trivial affine params
    c = shape[-1]
    v = {"params": {"scale": jnp.asarray(rng.uniform(0.5, 2, c), jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 1, c), jnp.float32)}}
    with jax.default_matmul_precision("highest"):
        y_ref = ref.apply(v, x)
        y_new = new.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new),
                               rtol=2e-5, atol=2e-5)


def test_matches_flax_bf16():
    rng = np.random.RandomState(1)
    x32 = rng.normal(0.5, 1.5, (11, 7, 7, 576)).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    ref = nn.GroupNorm(num_groups=36, epsilon=1e-5, dtype=jnp.bfloat16)
    new = MXUGroupNorm(num_groups=36, epsilon=1e-5, dtype=jnp.bfloat16)
    c = 576
    v = {"params": {"scale": jnp.asarray(rng.uniform(0.5, 2, c), jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 1, c), jnp.float32)}}
    y_ref = np.asarray(ref.apply(v, x), np.float32)
    y_new = np.asarray(new.apply(v, x), np.float32)
    # both are bf16 pipelines with different rounding points; outputs are
    # O(1) post-normalization so absolute tolerance ~ a few bf16 ulps
    np.testing.assert_allclose(y_ref, y_new, rtol=0.05, atol=0.05)


def test_grad_flows():
    x = jnp.asarray(np.random.RandomState(2).normal(0, 1, (4, 7, 7, 32)),
                    jnp.float32)
    m = MXUGroupNorm(num_groups=4)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(v, x):
        return jnp.sum(m.apply(v, x) ** 2)

    g = jax.grad(loss)(v, x)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))
