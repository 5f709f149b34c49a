import numpy as np
import jax
import jax.numpy as jnp

from htd_tpu.ops.roi_align import roi_align, roi_align_multilevel
from htd_tpu.ops.boxes import map_roi_levels
from tests.oracles import np_roi_align


def _feat(rng, h, w, c):
    return rng.normal(0, 1, (h, w, c)).astype(np.float32)


def _rois(rng, n, h, w, min_size=2.0, max_size=None):
    max_size = max_size or min(h, w) / 2
    b = np.zeros((n, 4), np.float32)
    b[:, 0] = rng.uniform(0, w - max_size, n)
    b[:, 1] = rng.uniform(0, h - max_size, n)
    b[:, 2] = b[:, 0] + rng.uniform(min_size, max_size, n)
    b[:, 3] = b[:, 1] + rng.uniform(min_size, max_size, n)
    return b


def test_roi_align_exact_small_grid(rng):
    """Adaptive grid <= max_samples -> bit-exact vs the mmcv-spec oracle."""
    feat = _feat(rng, 24, 32, 8)
    # rois sized so ceil(bin) <= 4 at scale 1.0: extent <= 28
    rois = _rois(rng, 12, 24, 32, min_size=3, max_size=11)
    rois_img = rois * 2.0  # feed at image scale, spatial_scale=0.5
    out = roi_align(jnp.asarray(feat), jnp.asarray(rois_img), 0.5, 7, 0, max_samples=4)
    ref = np_roi_align(feat, rois_img, 0.5, 7, 0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_roi_align_fixed_sampling(rng):
    feat = _feat(rng, 16, 16, 4)
    rois = _rois(rng, 8, 16, 16)
    out = roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, 2, max_samples=2)
    ref = np_roi_align(feat, rois, 1.0, 7, 2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_roi_align_border_and_outside(rng):
    """Rois partially/fully outside the map follow mmcv border semantics."""
    feat = _feat(rng, 10, 10, 2)
    rois = np.array(
        [
            [-5.0, -5.0, 4.0, 4.0],     # straddles the top-left corner
            [8.0, 8.0, 15.0, 15.0],     # straddles bottom-right
            [-30.0, -30.0, -20.0, -20.0],  # fully outside -> zeros
            [3.0, 3.0, 3.0, 3.0],       # degenerate (zero-area) -> zeros
        ],
        np.float32,
    )
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, 0, max_samples=2))
    ref = np_roi_align(feat, rois, 1.0, 7, 0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    assert np.abs(out[2]).max() == 0
    assert np.abs(out[3]).max() == 0


def test_roi_align_constant_feature(rng):
    """Averaging property: constant feature map -> constant output."""
    feat = np.full((20, 20, 3), 2.5, np.float32)
    rois = _rois(rng, 5, 20, 20, min_size=4, max_size=9)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0, 7, 0, max_samples=3))
    np.testing.assert_allclose(out, 2.5, rtol=1e-5)


def test_roi_align_multilevel_dispatch(rng):
    strides = (4, 8)
    feats = [_feat(rng, 32, 32, 4), _feat(rng, 16, 16, 4)]
    # one roi that maps to level 0 (small) and one to level 1 (large)
    rois = np.array([[0.0, 0.0, 40.0, 40.0], [0.0, 0.0, 120.0, 120.0]], np.float32)
    lvls = map_roi_levels(jnp.asarray(rois), 2)
    np.testing.assert_array_equal(np.asarray(lvls), [0, 1])
    out = roi_align_multilevel(
        [jnp.asarray(f) for f in feats], jnp.asarray(rois), strides, lvls,
        out_size=7, sampling_ratio=0, max_samples=4,
    )
    ref0 = np_roi_align(feats[0], rois[:1], 1 / 4, 7, 0)
    ref1 = np_roi_align(feats[1], rois[1:], 1 / 8, 7, 0)
    np.testing.assert_allclose(np.asarray(out[0]), ref0[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), ref1[0], rtol=1e-4, atol=1e-5)


def test_roi_align_batched_vmap(rng):
    feat = rng.normal(0, 1, (2, 12, 12, 4)).astype(np.float32)
    rois = np.stack([_rois(rng, 6, 12, 12), _rois(rng, 6, 12, 12)])
    out = jax.vmap(lambda f, r: roi_align(f, r, 1.0, 7, 0, max_samples=3))(
        jnp.asarray(feat), jnp.asarray(rois)
    )
    for b in range(2):
        ref = np_roi_align(feat[b], rois[b], 1.0, 7, 0)
        np.testing.assert_allclose(np.asarray(out[b]), ref, rtol=1e-4, atol=1e-5)


def test_pyramid_equals_dense_multilevel(rng):
    from htd_tpu.ops.roi_align import roi_align_pyramid

    strides = (4, 8, 16, 32)
    feats = [
        _feat(rng, 64 // (2 ** i), 96 // (2 ** i), 8) for i in range(4)
    ]
    rois = np.zeros((40, 4), np.float32)
    rois[:, 0] = rng.uniform(-20, 300, 40)
    rois[:, 1] = rng.uniform(-20, 200, 40)
    rois[:, 2] = rois[:, 0] + rng.uniform(5, 400, 40)
    rois[:, 3] = rois[:, 1] + rng.uniform(5, 400, 40)
    lvls = map_roi_levels(jnp.asarray(rois), 4)
    jf = [jnp.asarray(f) for f in feats]
    dense = roi_align_multilevel(jf, jnp.asarray(rois), strides, lvls, 7, 0, 4)
    pyr = roi_align_pyramid(jf, jnp.asarray(rois), strides, lvls, 7, 0, 4)
    np.testing.assert_allclose(np.asarray(pyr), np.asarray(dense), rtol=1e-5, atol=1e-6)


def test_pallas_fused_interpret_equals_pyramid(rng):
    """Pallas window kernel (interpret mode) == pyramid gather, incl. the
    elongated-roi fallback path."""
    from htd_tpu.ops.roi_align_pallas import roi_align_fused
    from htd_tpu.ops.roi_align import roi_align_pyramid

    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.normal(0, 1, (64 // (2 ** i), 96 // (2 ** i), 8)).astype(np.float32))
        for i in range(4)
    ]
    rois = np.zeros((16, 4), np.float32)
    rois[:, 0] = rng.uniform(-20, 350, 16)
    rois[:, 1] = rng.uniform(-20, 200, 16)
    rois[:, 2] = rois[:, 0] + rng.uniform(5, 300, 16)
    rois[:, 3] = rois[:, 1] + rng.uniform(5, 300, 16)
    lvls = map_roi_levels(jnp.asarray(rois), 4)
    p = roi_align_pyramid(feats, jnp.asarray(rois), strides, lvls, 7, 0, 4)
    k = roi_align_fused(feats, jnp.asarray(rois), strides, lvls, 7, 0, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(k), np.asarray(p), rtol=1e-4, atol=1e-5)


def test_trainable_fused_grad_matches_pyramid(rng):
    """custom_vjp backward (pyramid) == autodiff of the pyramid math."""
    from htd_tpu.ops.roi_align import roi_align_pyramid
    from htd_tpu.ops.roi_align_pallas import roi_align_fused_trainable

    strides = (4, 8)
    feats = [
        jnp.asarray(rng.normal(0, 1, (16, 24, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 1, (8, 12, 4)).astype(np.float32)),
    ]
    rois = np.zeros((5, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 50, 5)
    rois[:, 1] = rng.uniform(0, 30, 5)
    rois[:, 2] = rois[:, 0] + rng.uniform(10, 40, 5)
    rois[:, 3] = rois[:, 1] + rng.uniform(10, 30, 5)
    lvls = map_roi_levels(jnp.asarray(rois), 2)

    def loss_fused(fs):
        out = roi_align_fused_trainable(
            fs, jnp.asarray(rois), strides, lvls, 7, 0, 2, interpret=True
        )
        return jnp.sum(out ** 2)

    def loss_pyr(fs):
        out = roi_align_pyramid(list(fs), jnp.asarray(rois), strides, lvls, 7, 0, 2)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused)(tuple(feats))
    g2 = jax.grad(loss_pyr)(tuple(feats))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_adpt_align_trainable_interpret(rng):
    """Experimental multi-level kernel (interpret path) == per-level pyramid."""
    from htd_tpu.ops.roi_align import roi_align_pyramid
    from htd_tpu.ops.roi_align_pallas import adpt_align_trainable

    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.normal(0, 1, (64 // (2 ** i), 96 // (2 ** i), 8)).astype(np.float32))
        for i in range(4)
    ]
    rois = np.zeros((6, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 200, 6)
    rois[:, 1] = rng.uniform(0, 120, 6)
    rois[:, 2] = rois[:, 0] + rng.uniform(10, 60, 6)
    rois[:, 3] = rois[:, 1] + rng.uniform(10, 60, 6)
    out = adpt_align_trainable(
        feats, jnp.asarray(rois), strides, 7, 0, 2, interpret=True
    )
    for l in range(4):
        lv = jnp.full((6,), l, jnp.int32)
        ref = roi_align_pyramid(feats, jnp.asarray(rois), strides, lv, 7, 0, 2)
        np.testing.assert_allclose(
            np.asarray(out[:, l]), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"level {l}",
        )


def test_fast_oracle_matches_loop(rng):
    from tests.oracles import np_roi_align_fast

    feat = rng.normal(0, 1, (19, 23, 5))
    rois = np.stack([
        rng.uniform(-30, 80, 16), rng.uniform(-30, 60, 16),
        rng.uniform(0, 120, 16), rng.uniform(0, 100, 16)], 1)
    rois[:, 2] = rois[:, 0] + np.abs(rois[:, 2] - rois[:, 0]) + 1
    rois[:, 3] = rois[:, 1] + np.abs(rois[:, 3] - rois[:, 1]) + 1
    for sr in (0, 2):
        a = np_roi_align(feat, rois, 0.25, 7, sr)
        b = np_roi_align_fast(feat, rois, 0.25, 7, sr)
        assert np.abs(a - b).max() < 1e-12


def test_pyramid_batched_equals_per_image(rng):
    """roi_align_pyramid_batched == vmap-free per-image pyramid gather."""
    from htd_tpu.ops.roi_align import roi_align_pyramid, roi_align_pyramid_batched

    strides = (4, 8, 16, 32)
    b = 3
    feats = [
        jnp.asarray(rng.normal(0, 1, (b, 64 // (2 ** i), 96 // (2 ** i), 8))
                    .astype(np.float32))
        for i in range(4)
    ]
    rois = np.zeros((b, 20, 4), np.float32)
    rois[..., 0] = rng.uniform(-20, 300, (b, 20))
    rois[..., 1] = rng.uniform(-20, 200, (b, 20))
    rois[..., 2] = rois[..., 0] + rng.uniform(5, 400, (b, 20))
    rois[..., 3] = rois[..., 1] + rng.uniform(5, 400, (b, 20))
    lvls = jax.vmap(lambda r: map_roi_levels(r, 4))(jnp.asarray(rois))
    out = roi_align_pyramid_batched(feats, jnp.asarray(rois), strides, lvls, 7, 0, 4)
    for i in range(b):
        ref = roi_align_pyramid(
            [f[i] for f in feats], jnp.asarray(rois[i]), strides, lvls[i], 7, 0, 4
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref), rtol=1e-5, atol=1e-6
        )


def test_fused_batched_interpret_equals_per_image(rng):
    """roi_align_fused_batched (emulation path) == per-image fused, incl.
    the elongated-roi fallback with per-image row offsets."""
    from htd_tpu.ops.roi_align import roi_align_pyramid
    from htd_tpu.ops.roi_align_pallas import roi_align_fused_batched

    strides = (4, 8, 16, 32)
    b = 2
    feats = [
        jnp.asarray(rng.normal(0, 1, (b, 64 // (2 ** i), 96 // (2 ** i), 8))
                    .astype(np.float32))
        for i in range(4)
    ]
    rois = np.zeros((b, 12, 4), np.float32)
    rois[..., 0] = rng.uniform(-20, 350, (b, 12))
    rois[..., 1] = rng.uniform(-20, 200, (b, 12))
    rois[..., 2] = rois[..., 0] + rng.uniform(5, 300, (b, 12))
    rois[..., 3] = rois[..., 1] + rng.uniform(5, 300, (b, 12))
    lvls = jax.vmap(lambda r: map_roi_levels(r, 4))(jnp.asarray(rois))
    out = roi_align_fused_batched(
        feats, jnp.asarray(rois), strides, lvls, 7, 0, 4, interpret=True
    )
    for i in range(b):
        ref = roi_align_pyramid(
            [f[i] for f in feats], jnp.asarray(rois[i]), strides, lvls[i], 7, 0, 4
        )
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_fused_batched_trainable_grad(rng):
    """Batched custom_vjp backward == autodiff of the batched pyramid."""
    from htd_tpu.ops.roi_align import roi_align_pyramid_batched
    from htd_tpu.ops.roi_align_pallas import roi_align_fused_batched_trainable

    strides = (4, 8)
    b = 2
    feats = [
        jnp.asarray(rng.normal(0, 1, (b, 16, 24, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 1, (b, 8, 12, 4)).astype(np.float32)),
    ]
    rois = np.zeros((b, 5, 4), np.float32)
    rois[..., 0] = rng.uniform(0, 50, (b, 5))
    rois[..., 1] = rng.uniform(0, 30, (b, 5))
    rois[..., 2] = rois[..., 0] + rng.uniform(10, 40, (b, 5))
    rois[..., 3] = rois[..., 1] + rng.uniform(10, 30, (b, 5))
    lvls = jax.vmap(lambda r: map_roi_levels(r, 2))(jnp.asarray(rois))

    def loss_fused(fs):
        out = roi_align_fused_batched_trainable(
            fs, jnp.asarray(rois), strides, lvls, 7, 0, 2, interpret=True
        )
        return jnp.sum(out ** 2)

    def loss_pyr(fs):
        out = roi_align_pyramid_batched(
            list(fs), jnp.asarray(rois), strides, lvls, 7, 0, 2
        )
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss_fused)(tuple(feats))
    g2 = jax.grad(loss_pyr)(tuple(feats))
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)


def test_v4_degenerate_rois_trash_slot_and_fallback_priority(rng):
    """Zero-box padding must not consume v4 bin slots or fallback budget.

    Regression test (round-2 advisor, high): padded invalid proposals all
    map to level-0 bin (0,0); before the fix they slot-overflowed at score
    2.0, exhausted the fallback cap, and valid slot-overflow rois of later
    images silently kept the kernel's zero rows.
    """
    from htd_tpu.ops.roi_align_pallas import _v4_bin_rois

    r = 64
    slots = 8
    # 40 degenerate rois (start at origin) + 24 valid rois in the SAME bin
    start_h = jnp.zeros((r,), jnp.float32)
    start_w = jnp.zeros((r,), jnp.float32)
    hs = jnp.full((r,), 64.0)
    ws = jnp.full((r,), 64.0)
    row_off = jnp.zeros((r,), jnp.float32)
    valid = jnp.asarray(np.arange(r) >= 40)  # first 40 invalid

    ybin, xbin, roi_slot, slot_roi, ovf, _ = _v4_bin_rois(
        start_h, start_w, hs, ws, row_off, 4, 4, slots, roi_valid=valid
    )
    ovf = np.asarray(ovf)
    roi_slot = np.asarray(roi_slot)
    trash = 16 * slots
    # invalid rois: all in the trash slot, never reported as overflow
    assert (roi_slot[:40] == trash).all()
    assert not ovf[:40].any()
    # valid rois: the bin's `slots` capacity is theirs alone — exactly
    # (24 - slots) overflow, the rest hold real slots
    assert ovf[40:].sum() == 24 - slots
    held = roi_slot[40:][~ovf[40:]]
    assert (held != trash).all() and len(set(held.tolist())) == slots
    # without the validity mask the invalid rois would have eaten the bin
    _, _, _, _, ovf_nomask, _ = _v4_bin_rois(
        start_h, start_w, hs, ws, row_off, 4, 4, slots
    )
    assert np.asarray(ovf_nomask).sum() == r - slots


def test_v4_spill_bins_eliminate_slot_overflow(rng):
    """With n_spill = ceil(R/slots), _v4_bin_rois never reports slot
    overflow — every roi beyond its bin's capacity lands in a spill bin
    that duplicates the parent's window coordinates."""
    from htd_tpu.ops.roi_align_pallas import _v4_bin_rois

    r = 64
    slots = 8
    n_spill = (r + slots - 1) // slots
    # all 64 rois crowd into bin (0, 0); 24 of them invalid
    start_h = jnp.zeros((r,), jnp.float32)
    start_w = jnp.zeros((r,), jnp.float32)
    hs = jnp.full((r,), 64.0)
    ws = jnp.full((r,), 64.0)
    row_off = jnp.zeros((r,), jnp.float32)
    valid = jnp.asarray(np.arange(r) >= 24)

    ybin, xbin, roi_slot, slot_roi, ovf, spill_parent = _v4_bin_rois(
        start_h, start_w, hs, ws, row_off, 4, 4, slots,
        roi_valid=valid, n_spill=n_spill,
    )
    n_bins, n_all = 16, 16 + n_spill
    ovf = np.asarray(ovf)
    roi_slot = np.asarray(roi_slot)
    slot_roi = np.asarray(slot_roi)
    spill_parent = np.asarray(spill_parent)
    trash = n_all * slots
    assert not ovf.any()                       # spill absorbs everything
    assert (roi_slot[:24] == trash).all()      # invalid rois: trash only
    held = roi_slot[24:]
    assert (held != trash).all()
    assert len(set(held.tolist())) == 40       # every valid roi has a slot
    # 8 primary + 32 spilled -> spill rounds 0..3 used, all parented to bin 0
    used_spill = sorted({s // slots - n_bins for s in held if s >= n_bins * slots})
    assert used_spill == [0, 1, 2, 3]
    assert (spill_parent[:4] == 0).all()
    # slot_roi inverse mapping is consistent
    for roi, s in enumerate(held.tolist(), start=24):
        assert slot_roi[s] == roi


def test_v4_capped_spill_budget_reports_residual_overflow(rng):
    """With n_spill SMALLER than ceil(R/slots) (HTD_V4_SPILL=k budget
    mode), the first k spill rounds absorb overflow in-kernel and the
    residual is reported as overflow so the caller's exact gather
    fallback patches it — correctness never depends on the budget."""
    from htd_tpu.ops.roi_align_pallas import _v4_bin_rois

    r = 64
    slots = 8
    n_spill = 2                                 # budget: 2 of the 7 rounds needed
    start_h = jnp.zeros((r,), jnp.float32)
    start_w = jnp.zeros((r,), jnp.float32)
    hs = jnp.full((r,), 64.0)
    ws = jnp.full((r,), 64.0)
    row_off = jnp.zeros((r,), jnp.float32)

    _, _, roi_slot, slot_roi, ovf, spill_parent = _v4_bin_rois(
        start_h, start_w, hs, ws, row_off, 4, 4, slots, n_spill=n_spill,
    )
    n_bins, n_all = 16, 16 + n_spill
    ovf = np.asarray(ovf)
    roi_slot = np.asarray(roi_slot)
    slot_roi = np.asarray(slot_roi)
    trash = n_all * slots
    # 8 primary + 16 spill slots held; the remaining 40 overflow to trash
    assert ovf.sum() == r - slots - n_spill * slots
    assert (roi_slot[ovf] == trash).all()
    held = roi_slot[~ovf]
    assert (held != trash).all()
    assert len(set(held.tolist())) == slots + n_spill * slots
    assert (np.asarray(spill_parent) == 0).all()   # both rounds parent bin 0
    for roi, s in zip(np.flatnonzero(~ovf).tolist(), held.tolist()):
        assert slot_roi[s] == roi


def test_fused_batched_padded_rois_do_not_starve_fallback(rng):
    """End-to-end (emulation path): valid rois stay exact even when earlier
    images carry far more zero-padded rois than the fallback cap."""
    from htd_tpu.ops.roi_align import roi_align_pyramid
    from htd_tpu.ops.roi_align_pallas import roi_align_fused_batched

    strides = (4, 8, 16, 32)
    b = 2
    feats = [
        jnp.asarray(rng.normal(0, 1, (b, 64 // (2 ** i), 96 // (2 ** i), 8))
                    .astype(np.float32))
        for i in range(4)
    ]
    r = 48
    rois = np.zeros((b, r, 4), np.float32)  # image 0: ALL zero padding
    # image 1: valid rois crowded into one corner (one v4 bin)
    rois[1, :, 0] = rng.uniform(0, 30, r)
    rois[1, :, 1] = rng.uniform(0, 30, r)
    rois[1, :, 2] = rois[1, :, 0] + rng.uniform(5, 25, r)
    rois[1, :, 3] = rois[1, :, 1] + rng.uniform(5, 25, r)
    lvls = jax.vmap(lambda rr: map_roi_levels(rr, 4))(jnp.asarray(rois))
    out = roi_align_fused_batched(
        feats, jnp.asarray(rois), strides, lvls, 7, 0, 4,
        interpret=True, fallback_cap=8,
    )
    ref = roi_align_pyramid(
        [f[1] for f in feats], jnp.asarray(rois[1]), strides, lvls[1], 7, 0, 4
    )
    np.testing.assert_allclose(
        np.asarray(out[1]), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_v4_kernel_bodies_interpret_match_emulation(rng, monkeypatch):
    """The REAL v4 Pallas kernel bodies (default and HTD_V4_PACKED=1),
    run under pallas interpret mode, must match the jnp emulation branch
    (which the rest of the suite oracle-tests). Guards the packed-2D
    kernel rewrite: identical ay/ax math, different data movement."""
    import htd_tpu.ops.roi_align_pallas as rap

    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(
            rng.normal(0, 1, (64 // (2 ** i), 96 // (2 ** i), 8))
            .astype(np.float32)
        )
        for i in range(4)
    ]
    n = 12
    rois = np.zeros((n, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 300, n)
    rois[:, 1] = rng.uniform(0, 180, n)
    rois[:, 2] = rois[:, 0] + rng.uniform(5, 60, n)
    rois[:, 3] = rois[:, 1] + rng.uniform(5, 60, n)
    lvls = map_roi_levels(jnp.asarray(rois), 4)

    ref, ovf_ref = rap.roi_align_pallas_v4(
        feats, jnp.asarray(rois), strides, lvls, 7, 0, 4, interpret=True
    )

    monkeypatch.setattr(rap, "_FORCE_KERNEL_INTERPRET", True)
    for packed in ("0", "1"):
        monkeypatch.setenv("HTD_V4_PACKED", packed)
        out, ovf = rap.roi_align_pallas_v4(
            feats, jnp.asarray(rois), strides, lvls, 7, 0, 4,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ovf), np.asarray(ovf_ref))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2,
            err_msg=f"packed={packed}",
        )


def test_v4_kernel_body_spill_bins_match_emulation(rng, monkeypatch):
    """The REAL kernel body with CROWDED rois (slot overflow absorbed by
    spill bins) must match the jnp emulation: spill-bin rois get the same
    two-matmul treatment as primary-bin rois, and none report overflow."""
    import htd_tpu.ops.roi_align_pallas as rap

    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(
            rng.normal(0, 1, (64 // (2 ** i), 96 // (2 ** i), 8))
            .astype(np.float32)
        )
        for i in range(4)
    ]
    # 40 small rois crowded into one 56x128 px corner: with slots=8 the
    # first bin overflows into ceil(40/8) spill rounds
    n = 40
    rois = np.zeros((n, 4), np.float32)
    rois[:, 0] = rng.uniform(0, 40, n)
    rois[:, 1] = rng.uniform(0, 40, n)
    rois[:, 2] = rois[:, 0] + rng.uniform(5, 30, n)
    rois[:, 3] = rois[:, 1] + rng.uniform(5, 30, n)
    lvls = map_roi_levels(jnp.asarray(rois), 4)

    ref, ovf_ref = rap.roi_align_pallas_v4(
        feats, jnp.asarray(rois), strides, lvls, 7, 0, 4, interpret=True,
        slots=8,
    )
    assert not np.asarray(ovf_ref).any()

    monkeypatch.setattr(rap, "_FORCE_KERNEL_INTERPRET", True)
    out, ovf = rap.roi_align_pallas_v4(
        feats, jnp.asarray(rois), strides, lvls, 7, 0, 4, interpret=True,
        slots=8,
    )
    assert not np.asarray(ovf).any()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )
    # with spill disabled the same layout must overflow
    monkeypatch.setenv("HTD_V4_SPILL", "0")
    _, ovf_off = rap.roi_align_pallas_v4(
        feats, jnp.asarray(rois), strides, lvls, 7, 0, 4, interpret=True,
        slots=8,
    )
    assert np.asarray(ovf_off).any()


def test_build_pyramid_pallas_matches_xla(rng):
    """io-aliased Pallas level writes == XLA pad+concat build, both
    arities, incl. widths not divisible by 8 (in-kernel pad path) and a
    height forcing the stripe to shrink below 8."""
    from htd_tpu.ops.roi_align_pallas import (
        _build_pyramid, _build_pyramid_pallas, V4_RES_H, V4_X_BLOCK,
        V4_Y_STRIPE,
    )

    for batched, shapes in (
        (False, [(32, 48), (16, 24), (8, 12)]),
        (True, [(32, 48), (16, 24), (8, 12)]),
        (False, [(12, 20), (6, 10)]),  # h=12 -> stripe 4, h=6 -> stripe 2
    ):
        mk = lambda h, w: ((2, h, w, 8) if batched else (h, w, 8))
        feats = [
            jnp.asarray(rng.normal(0, 1, mk(h, w)).astype(np.float32))
            for h, w in shapes
        ]
        max_w = max(int(f.shape[-2]) for f in feats)
        win_w = ((max_w - 1) // V4_X_BLOCK + 2) * V4_X_BLOCK - V4_X_BLOCK
        a, offs_a, wp_a, rp_a, ir_a = _build_pyramid(
            feats, V4_RES_H, win_w, V4_X_BLOCK, V4_Y_STRIPE)
        b, offs_b, wp_b, rp_b, ir_b = _build_pyramid_pallas(
            feats, V4_RES_H, win_w, V4_X_BLOCK, V4_Y_STRIPE,
            interpret=True)
        assert (offs_a, wp_a, rp_a, ir_a) == (offs_b, wp_b, rp_b, ir_b)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_pyramid_pallas_vjp_matches_xla(rng):
    """custom VJP of the Pallas builder (per-level row/col slices) ==
    autodiff of the XLA pad+concat build, both arities."""
    from htd_tpu.ops.roi_align_pallas import (
        _build_pyramid_pallas, _build_pyramid_xla, V4_RES_H, V4_X_BLOCK,
        V4_Y_STRIPE,
    )

    for batched in (False, True):
        mk = lambda h, w: ((2, h, w, 8) if batched else (h, w, 8))
        feats = [
            jnp.asarray(rng.normal(0, 1, mk(32 // (2 ** i), 48 // (2 ** i)))
                        .astype(np.float32))
            for i in range(3)
        ]
        args = (V4_RES_H, 96, V4_X_BLOCK, V4_Y_STRIPE)
        fa = lambda *fs: jnp.sum(
            jnp.sin(_build_pyramid_pallas(list(fs), *args, interpret=True)[0])
        )
        fb = lambda *fs: jnp.sum(jnp.sin(_build_pyramid_xla(list(fs), *args)[0]))
        ga = jax.grad(fa, argnums=(0, 1, 2))(*feats)
        gb = jax.grad(fb, argnums=(0, 1, 2))(*feats)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


def test_adpt_levels_pyramid_matches_per_level(rng):
    """roi_align_levels_pyramid == per-level flat gathers (the BA
    extractor's previous formulation), values and gradients."""
    from htd_tpu.ops.roi_align import roi_align
    from htd_tpu.ops.roi_align_pallas import roi_align_levels_pyramid

    strides = (4, 8, 16, 32)
    b, r = 2, 6
    feats = [
        jnp.asarray(
            rng.normal(0, 1, (b, 64 // (2 ** i), 96 // (2 ** i), 8))
            .astype(np.float32)
        )
        for i in range(4)
    ]
    rois = np.zeros((b, r, 4), np.float32)
    rois[..., 0] = rng.uniform(-10, 300, (b, r))
    rois[..., 1] = rng.uniform(-10, 200, (b, r))
    rois[..., 2] = rois[..., 0] + rng.uniform(5, 200, (b, r))
    rois[..., 3] = rois[..., 1] + rng.uniform(5, 200, (b, r))
    jrois = jnp.asarray(rois)

    got = roi_align_levels_pyramid(feats, jrois, strides, 7, 0, 2)
    for lvl, stride in enumerate(strides):
        want = jax.vmap(
            lambda f, rr: roi_align(
                f, rr, spatial_scale=1.0 / stride, out_size=7,
                sampling_ratio=0, max_samples=2,
            )
        )(feats[lvl], jrois)
        np.testing.assert_allclose(
            np.asarray(got[lvl]), np.asarray(want), rtol=1e-5, atol=1e-5,
            err_msg=f"level {lvl}",
        )

    fa = lambda *fs: sum(
        jnp.sum(jnp.sin(o))
        for o in roi_align_levels_pyramid(list(fs), jrois, strides, 7, 0, 2)
    )
    fb = lambda *fs: sum(
        jnp.sum(jnp.sin(jax.vmap(
            lambda f, rr: roi_align(
                f, rr, spatial_scale=1.0 / s, out_size=7,
                sampling_ratio=0, max_samples=2,
            )
        )(fs[l], jrois)))
        for l, s in enumerate(strides)
    )
    ga = jax.grad(fa, argnums=tuple(range(4)))(*feats)
    gb = jax.grad(fb, argnums=tuple(range(4)))(*feats)
    for a, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_adpt_levels_pyramid_quad_matches_corner(rng, monkeypatch):
    """HTD_QUAD_BA quad-concat gather == 4-corner gather (values + grads)."""
    from htd_tpu.ops.roi_align_pallas import roi_align_levels_pyramid

    strides = (4, 8, 16, 32)
    b, r = 2, 5
    feats = [
        jnp.asarray(
            rng.normal(0, 1, (b, 48 // (2 ** i), 64 // (2 ** i), 8))
            .astype(np.float32)
        )
        for i in range(4)
    ]
    rois = np.zeros((b, r, 4), np.float32)
    rois[..., 0] = rng.uniform(-10, 200, (b, r))
    rois[..., 1] = rng.uniform(-10, 150, (b, r))
    rois[..., 2] = rois[..., 0] + rng.uniform(5, 150, (b, r))
    rois[..., 3] = rois[..., 1] + rng.uniform(5, 150, (b, r))
    jrois = jnp.asarray(rois)

    def run():
        return roi_align_levels_pyramid(feats, jrois, strides, 7, 0, 2)

    def grad():
        f = lambda *fs: sum(
            jnp.sum(jnp.sin(o))
            for o in roi_align_levels_pyramid(list(fs), jrois, strides, 7, 0, 2)
        )
        return jax.grad(f, argnums=tuple(range(4)))(*feats)

    monkeypatch.setenv("HTD_QUAD_BA", "0")
    corner_v, corner_g = run(), grad()
    monkeypatch.setenv("HTD_QUAD_BA", "1")
    quad_v, quad_g = run(), grad()
    for a, b_ in zip(quad_v, corner_v):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
    for a, b_ in zip(quad_g, corner_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_build_pyramid_xmajor_matches_transposed(rng):
    """x-major builder == swapaxes(row-major builder) for both arities."""
    from htd_tpu.ops.roi_align_pallas import (
        _build_pyramid, _build_pyramid_xmajor, V4_RES_H, V4_X_BLOCK,
        V4_Y_STRIPE,
    )

    for batched in (False, True):
        shape = lambda h, w: ((2, h, w, 8) if batched else (h, w, 8))
        feats = [jnp.asarray(rng.normal(0, 1, shape(32 // (2 ** i), 48 // (2 ** i)))
                             .astype(np.float32)) for i in range(3)]
        max_w = max(int(f.shape[-2]) for f in feats)
        wpt = ((max_w - 1) // V4_X_BLOCK + 2) * V4_X_BLOCK
        a, offs_a, wp_a, rp_a, ir_a = _build_pyramid(
            feats, V4_RES_H, wpt - V4_X_BLOCK, V4_X_BLOCK, V4_Y_STRIPE)
        b, offs_b, wp_b, rp_b, ir_b = _build_pyramid_xmajor(
            feats, V4_RES_H, wpt - V4_X_BLOCK, V4_X_BLOCK, V4_Y_STRIPE)
        assert (offs_a, wp_a, rp_a, ir_a) == (offs_b, wp_b, rp_b, ir_b)
        np.testing.assert_array_equal(
            np.asarray(jnp.swapaxes(a, 0, 1)), np.asarray(b))


def test_folded_backward_matches_autodiff(rng):
    """roi_align_pyramid_batched_grad_feats (corner-folded scatter, the
    TPU train-step backward) == autodiff of the gather formulation."""
    import jax

    from htd_tpu.ops.boxes import map_roi_levels
    from htd_tpu.ops.roi_align import (
        roi_align_pyramid_batched,
        roi_align_pyramid_batched_grad_feats,
    )

    b, r, c = 2, 40, 16
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.normal(
            0, 1, (b, 64 // 2 ** i, 96 // 2 ** i, c)).astype(np.float32))
        for i in range(4)
    ]
    boxes = []
    for _ in range(b * r):
        sc = rng.uniform(8, 500)
        ar = np.exp(rng.uniform(-1.2, 1.2))
        w, h = sc * np.sqrt(ar), sc / np.sqrt(ar)
        x1, y1 = rng.uniform(-10, 300), rng.uniform(-10, 200)
        boxes.append([x1, y1, x1 + w, y1 + h])
    rois = jnp.asarray(np.asarray(boxes, np.float32).reshape(b, r, 4))
    lvls = jax.vmap(lambda rr: map_roi_levels(rr, 4))(rois)
    g = jnp.asarray(rng.normal(0, 1, (b, r, 7, 7, c)).astype(np.float32))

    _, vjp = jax.vjp(
        lambda fs: roi_align_pyramid_batched(list(fs), rois, strides, lvls),
        feats,
    )
    (ref,) = vjp(g)
    got = roi_align_pyramid_batched_grad_feats(
        list(feats), rois, strides, lvls, g)
    for lvl in range(4):
        a, bb = np.asarray(ref[lvl]), np.asarray(got[lvl])
        assert np.abs(a).max() > 0  # every level exercised
        np.testing.assert_allclose(bb, a, rtol=2e-5, atol=2e-6)


def test_ba_folded_backward_matches_autodiff(rng, monkeypatch):
    """The BA extractor's corner-folded backward (HTD_BA_BWD=fold default)
    == autodiff of the gather formulation (HTD_BA_BWD=vjp)."""
    import jax

    from htd_tpu.ops.roi_align_pallas import roi_align_levels_pyramid

    b, r, c = 2, 24, 16
    strides = (4, 8, 16, 32)
    feats = [
        jnp.asarray(rng.normal(
            0, 1, (b, 64 // 2 ** i, 96 // 2 ** i, c)).astype(np.float32))
        for i in range(4)
    ]
    boxes = []
    for _ in range(b * r):
        sc = rng.uniform(8, 400)
        ar = np.exp(rng.uniform(-1.0, 1.0))
        w, h = sc * np.sqrt(ar), sc / np.sqrt(ar)
        x1, y1 = rng.uniform(-10, 300), rng.uniform(-10, 200)
        boxes.append([x1, y1, x1 + w, y1 + h])
    rois = jnp.asarray(np.asarray(boxes, np.float32).reshape(b, r, 4))
    gs = [jnp.asarray(rng.normal(0, 1, (b, r, 7, 7, c)).astype(np.float32))
          for _ in range(4)]

    def loss(fs):
        outs = roi_align_levels_pyramid(list(fs), rois, strides, 7, 0, 1)
        return sum(jnp.sum(o * g) for o, g in zip(outs, gs))

    monkeypatch.setenv("HTD_BA_BWD", "fold")
    g_fold = jax.grad(loss)(feats)
    monkeypatch.setenv("HTD_BA_BWD", "vjp")
    g_vjp = jax.grad(loss)(feats)
    for lvl in range(4):
        a, bb = np.asarray(g_vjp[lvl]), np.asarray(g_fold[lvl])
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(bb, a, rtol=2e-5, atol=2e-6)
