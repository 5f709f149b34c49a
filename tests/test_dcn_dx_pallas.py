"""Pallas select-MAC transpose d_x (round-5 DCN backward kernel) vs the
corner-folded exact oracle.

The kernel computes the gradient of the WINDOWED forward; with the
correction cap covering every out-of-window sample it equals the exact
gather-formulation d_x (same fidelity contract as the forward kernel).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import htd_tpu.ops.dcn as D

pytestmark = pytest.mark.fast

N, H, W, C, COUT = 2, 16, 24, 32, 32


def _inputs(rng, off_scale):
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, C)).astype(np.float32))
    wt = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, COUT)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (N, H, W, COUT)).astype(np.float32))
    off = jnp.asarray(
        rng.normal(0, off_scale, (N, H, W, 18)).astype(np.float32))
    return x, wt, g, off


@pytest.mark.parametrize(
    "off_scale,lo,hi,cap",
    [
        (0.3, -1, 1, 64),        # in-window offsets, tiny cap unused
        (3.0, -1, 1, H * W),     # every pixel corrects: full-cap exact
        (0.5, -1, 0, H * W),     # asym window, heavy correction
    ],
)
def test_dx_pallas_matches_fold(rng, off_scale, lo, hi, cap):
    x, wt, g, off = _inputs(rng, off_scale)
    dx_ref = D._dcn_dx_folded(x, off, wt, g, 3, 3, 1, 1, 1)
    dx_pal = D._dcn_dx_pallas(
        x, off, wt, g, 3, 3, 1, 1, lo, hi, cap, interpret=True)
    a, b = np.asarray(dx_pal), np.asarray(dx_ref)
    s = max(np.abs(b).max(), 1e-6)
    assert np.abs(a - b).max() / s < 1e-5


@pytest.mark.parametrize(
    "off_scale,lo,hi,cap",
    [
        (0.3, -1, 1, 64),
        (3.0, -1, 1, H * W),
        (0.5, -1, 0, H * W),
    ],
)
def test_dow_pallas_matches_vjp(rng, off_scale, lo, hi, cap, monkeypatch):
    """Kernel B: select-MAC recompute (d_off, d_w) == vjp-of-gather."""
    import htd_tpu.ops.dcn_pallas as DP

    monkeypatch.setattr(DP, "_INTERPRET", True)
    x, wt, g, _ = _inputs(rng, 0.0)
    off = jnp.asarray(
        rng.normal(0, off_scale, (N, H, W, 18)).astype(np.float32))

    def ref(o, w_):
        return D._dcn_xla_impl(x, o, w_, 1, 1, 1, "gather", 1, 64)

    _, vjp = jax.vjp(ref, off, wt)
    do_ref, dw_ref = vjp(g)
    do_p, dw_p = D._dcn_dow_pallas(
        x, off, wt, g, 3, 3, 1, 1, lo, hi, cap, interpret=True)
    for a, b in [(do_p, do_ref), (dw_p, dw_ref)]:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        s = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / s < 1e-5


def test_dx_pallas_through_custom_vjp(rng, monkeypatch):
    """HTD_DCN_DX=pallas through deform_conv2d's vjp == fold gradients
    (d_off/d_w unchanged — both use the exact-gather vjp)."""
    x, wt, g, off = _inputs(rng, 0.3)

    def loss(xx, mode):
        monkeypatch.setenv("HTD_DCN_DX", mode)
        monkeypatch.setenv("HTD_DCN_IMPL", "pallas")
        import htd_tpu.ops.dcn_pallas as DPL
        monkeypatch.setattr(DPL, "_INTERPRET", True)
        out = D.deform_conv2d(xx, off, wt)
        return jnp.sum(out * g)

    d_pal = jax.grad(lambda xx: loss(xx, "pallas"))(x)
    d_fold = jax.grad(lambda xx: loss(xx, "fold"))(x)
    np.testing.assert_allclose(
        np.asarray(d_pal), np.asarray(d_fold), rtol=1e-4, atol=1e-5)
