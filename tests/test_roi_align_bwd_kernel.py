"""Pallas window-accumulation RoIAlign backward (round-5 kernel) vs the
corner-folded scatter oracle.

The kernel computes the exact gather-formulation feature gradient for
in-capacity rois (same tent matrices as the v4 forward, transposed) and
routes bin-capacity / window-coverage overflow through the capped folded
scatter — so with a sufficient cap it must match
`roi_align_pyramid_batched_grad_feats` everywhere.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import htd_tpu.ops.roi_align_pallas as rap
from htd_tpu.ops.boxes import map_roi_levels
from htd_tpu.ops.roi_align import roi_align_pyramid_batched_grad_feats

pytestmark = pytest.mark.fast

STRIDES = (4, 8, 16, 32)
B, C, OUT = 2, 64, 7


def _feats(rng, h0=32, w0=48):
    return [
        jnp.asarray(rng.normal(0, 1, (B, h0 >> i, w0 >> i, C))
                    .astype(np.float32))
        for i in range(4)
    ]


def _rois(rng, r, img_h=128.0, img_w=192.0, big=False):
    x1 = rng.uniform(0, img_w * 0.6, r)
    y1 = rng.uniform(0, img_h * 0.6, r)
    if big:
        w = rng.uniform(img_w * 0.3, img_w * 0.9, r)
        h = rng.uniform(img_h * 0.3, img_h * 0.9, r)
    else:
        w = rng.uniform(8, 60, r)
        h = rng.uniform(8, 60, r)
    x2 = np.minimum(x1 + w, img_w)
    y2 = np.minimum(y1 + h, img_h)
    return np.stack([x1, y1, x2, y2], axis=1).astype(np.float32)


def _case(rng, r=24, crowded=False, big=False, with_pad=False):
    feats = _feats(rng)
    rois = np.stack([_rois(rng, r, big=big) for _ in range(B)])
    if crowded:
        # >slots rois into one window: force slot overflow -> fallback
        base = np.array([10.0, 10.0, 30.0, 30.0], np.float32)
        for i in range(14):
            rois[0, i] = base + rng.uniform(-3, 3, 4).astype(np.float32)
    if with_pad:
        rois[:, -4:] = 0.0  # degenerate padding rois
    rois_j = jnp.asarray(rois)
    lvls = jax.vmap(lambda rr: map_roi_levels(rr, 4))(rois_j)
    g = jnp.asarray(
        rng.normal(0, 1, (B, r, OUT, OUT, C)).astype(np.float32))
    return feats, rois_j, lvls, g


def _compare(feats, rois, lvls, g, tol=2e-5):
    d_ker = rap.roi_align_fused_batched_grad_feats(
        feats, rois, STRIDES, lvls, g, out_size=OUT, max_samples=4)
    d_ref = roi_align_pyramid_batched_grad_feats(
        feats, rois, STRIDES, lvls, g, out_size=OUT, max_samples=4)
    for lvl, (a, bb) in enumerate(zip(d_ker, d_ref)):
        a = np.asarray(a, np.float64)
        bb = np.asarray(bb, np.float64)
        scale = max(np.abs(bb).max(), 1e-6)
        err = np.abs(a - bb).max() / scale
        assert err < tol, f"level {lvl}: rel err {err:.2e}"


def test_bwd_kernel_matches_fold_emulation(rng):
    """jnp emulation path (CPU dispatch): exact binning/table math."""
    _compare(*_case(rng))


def test_bwd_kernel_crowded_overflow(rng):
    """Slot overflow routes through the folded-scatter fallback."""
    _compare(*_case(rng, crowded=True))


def test_bwd_kernel_big_and_padded(rng):
    """Window-coverage overflow (big rois) + degenerate padding rois."""
    _compare(*_case(rng, big=True, with_pad=True))


def test_bwd_kernel_interpret_mode(rng, monkeypatch):
    """The REAL kernel body under pl.pallas_call interpret mode."""
    monkeypatch.setattr(rap, "_FORCE_KERNEL_INTERPRET", True)
    feats, rois, lvls, g = _case(rng, r=16)
    d_ker = rap.roi_align_fused_batched_grad_feats(
        feats, rois, STRIDES, lvls, g, out_size=OUT, max_samples=4,
        interpret=True)
    d_ref = roi_align_pyramid_batched_grad_feats(
        feats, rois, STRIDES, lvls, g, out_size=OUT, max_samples=4)
    for lvl, (a, bb) in enumerate(zip(d_ker, d_ref)):
        a = np.asarray(a, np.float64)
        bb = np.asarray(bb, np.float64)
        scale = max(np.abs(bb).max(), 1e-6)
        err = np.abs(a - bb).max() / scale
        assert err < 2e-5, f"level {lvl}: rel err {err:.2e}"


def test_train_backward_through_custom_vjp(rng, monkeypatch):
    """HTD_RA_BWD=pallas through the trainable wrapper == fold grads."""
    from htd_tpu.ops.roi_align_pallas import (
        roi_align_fused_batched_trainable as trainable,
    )

    feats, rois, lvls, g = _case(rng, r=12)

    def loss(fs, mode):
        monkeypatch.setenv("HTD_RA_BWD", mode)
        out = trainable(list(fs), rois, STRIDES, lvls,
                        out_size=OUT, max_samples=4)
        return jnp.sum(out * g)

    g_pal = jax.grad(lambda fs: loss(fs, "pallas"))(tuple(feats))
    g_fold = jax.grad(lambda fs: loss(fs, "fold"))(tuple(feats))
    for a, bb in zip(g_pal, g_fold):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-5)
