"""Fused Pallas upsample+add == nearest-resize + add (FPN top-down step).

The op replaces `lat + resize_nearest(low, 2x)` in the FPN (reference
mmdet/models/necks/fpn.py:152, F.interpolate nearest scale_factor=2) and
must be bit-identical to pure duplication.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import htd_tpu.ops.upsample as U
from htd_tpu.models.layers import resize_nearest


def _ref(low, lat):
    return lat + resize_nearest(low, (lat.shape[-3], lat.shape[-2]))


def test_xla_path_matches_resize(rng):
    low = jnp.asarray(rng.normal(0, 1, (2, 6, 10, 16)).astype(np.float32))
    lat = jnp.asarray(rng.normal(0, 1, (2, 12, 20, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(U.upsample2x_add(low, lat)), np.asarray(_ref(low, lat))
    )


def test_pallas_kernel_interpret_matches(rng, monkeypatch):
    monkeypatch.setattr(U, "_INTERPRET", True)
    # h=12 exercises the yb=4 (non-8-divisible) block path
    for h, w in ((8, 12), (12, 20)):
        low = jnp.asarray(
            rng.normal(0, 1, (2, h, w, 16)).astype(np.float32)
        )
        lat = jnp.asarray(
            rng.normal(0, 1, (2, 2 * h, 2 * w, 16)).astype(np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(U._up2_add_impl(low, lat)),
            np.asarray(_ref(low, lat)),
        )


def test_vjp_matches_xla_form(rng):
    low = jnp.asarray(rng.normal(0, 1, (1, 4, 6, 8)).astype(np.float32))
    lat = jnp.asarray(rng.normal(0, 1, (1, 8, 12, 8)).astype(np.float32))

    f = lambda a, b: jnp.sum(jnp.sin(U.upsample2x_add(a, b)))
    fr = lambda a, b: jnp.sum(jnp.sin(_ref(a, b)))
    g = jax.grad(f, argnums=(0, 1))(low, lat)
    gr = jax.grad(fr, argnums=(0, 1))(low, lat)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_odd_target_falls_back(rng):
    # non-exact-2x target must route to the XLA resize path
    low = jnp.asarray(rng.normal(0, 1, (1, 5, 7, 4)).astype(np.float32))
    lat = jnp.asarray(rng.normal(0, 1, (1, 9, 13, 4)).astype(np.float32))
    out = lat + resize_nearest(low, (9, 13))
    np.testing.assert_allclose(
        np.asarray(U.upsample2x_add(low, lat)), np.asarray(out)
    )
