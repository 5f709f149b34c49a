"""layout_fence is an exact identity (values + gradients), any rank."""

import jax
import jax.numpy as jnp
import numpy as np

import htd_tpu.ops.fence as F


def test_identity_interpret(rng, monkeypatch):
    monkeypatch.setattr(F, "_INTERPRET", True)
    for shape in ((2, 12, 20, 16), (11, 20, 16), (24, 16)):
        x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(F.layout_fence(x)), np.asarray(x)
        )


def test_grad_passthrough(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 12, 4)).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(jnp.sin(F.layout_fence(a))))(x)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(a)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr))


def test_dcn_fence_gate_matches(rng, monkeypatch):
    from htd_tpu.ops.dcn import deform_conv2d

    x = jnp.asarray(rng.normal(0, 1, (1, 10, 12, 8)).astype(np.float32))
    offs = jnp.asarray(rng.normal(0, 1, (1, 10, 12, 18)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32))
    base = deform_conv2d(x, offs, w)
    monkeypatch.setenv("HTD_DCN_FENCE", "1")
    gated = deform_conv2d(x, offs, w)  # CPU fence is a no-op identity
    np.testing.assert_array_equal(np.asarray(base), np.asarray(gated))
