"""Tiled exact top-k == jax.lax.top_k (values always; indices on unique
values)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from htd_tpu.ops.topk import top_k_tiled

pytestmark = pytest.mark.fast


def test_matches_flat_topk(rng):
    for n, k, tile in ((200_000, 1000, 8192), (10_000, 1000, 4096),
                       (5000, 1000, 8192), (8193, 100, 4096)):
        x = jnp.asarray(rng.normal(0, 1, (n,)).astype(np.float32))
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = top_k_tiled(x, k, tile)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_neg_inf_padding_tail(rng):
    # n not a multiple of tile: padded -inf entries must never be selected
    x = jnp.asarray(rng.normal(0, 1, (20_001,)).astype(np.float32))
    v, i = top_k_tiled(x, 64, 4096)
    assert int(i.max()) < 20_001
    np.testing.assert_array_equal(
        np.asarray(v), np.asarray(jax.lax.top_k(x, 64)[0])
    )
