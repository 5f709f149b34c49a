"""StemConv space-to-depth rewrite must match the plain 7x7/s2 conv exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from htd_tpu.models.resnet import StemConv


def _plain(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_stem_matches_plain_conv(rng, monkeypatch):
    # s2d is opt-in (HTD_S2D_STEM=1) since the round-3 on-chip A/B showed
    # the plain conv faster; force it here so the rewrite stays correct.
    monkeypatch.setenv("HTD_S2D_STEM", "1")
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 48, 3)).astype(np.float32))
    mod = StemConv(features=16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    w = variables["params"]["kernel"]
    got = mod.apply(variables, x)
    want = _plain(x, w)
    assert got.shape == want.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_s2d_stem_odd_size_fallback(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 31, 48, 3)).astype(np.float32))
    mod = StemConv(features=8)
    variables = mod.init(jax.random.PRNGKey(0), x)
    w = variables["params"]["kernel"]
    got = mod.apply(variables, x)
    want = _plain(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
