import numpy as np
import jax
import jax.numpy as jnp

from htd_tpu.ops.dcn import _dcn_xla_impl, deform_conv2d


def np_deform_conv(x_nhwc, offsets, weight, stride=1, dilation=1):
    """Slow oracle: DCNv1 semantics with zero padding, deform_groups=1."""
    n, h, w, cin = x_nhwc.shape
    kh, kw, _, cout = weight.shape
    pad = (kh - 1) // 2 * dilation
    ho, wo = offsets.shape[1], offsets.shape[2]
    out = np.zeros((n, ho, wo, cout))

    def bilinear(img, y, x):
        if y <= -1 or y >= h or x <= -1 or x >= w:
            return np.zeros(cin)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        ly, lx = y - y0, x - x0
        val = np.zeros(cin)
        for dy, wy in ((0, 1 - ly), (1, ly)):
            for dx, wx in ((0, 1 - lx), (1, lx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    val += wy * wx * img[yy, xx]
        return val

    for b in range(n):
        for i in range(ho):
            for j in range(wo):
                acc = np.zeros(cout)
                for ki in range(kh):
                    for kj in range(kw):
                        tap = ki * kw + kj
                        dy = offsets[b, i, j, 2 * tap]
                        dx = offsets[b, i, j, 2 * tap + 1]
                        y = i * stride - pad + ki * dilation + dy
                        x = j * stride - pad + kj * dilation + dx
                        v = bilinear(x_nhwc[b], y, x)
                        acc += v @ weight[ki, kj]
                out[b, i, j] = acc
    return out


def test_zero_offset_equals_conv(rng):
    """With zero offsets, DCN == plain 3x3 conv."""
    x = rng.normal(0, 1, (1, 8, 9, 4)).astype(np.float32)
    wgt = rng.normal(0, 0.5, (3, 3, 4, 6)).astype(np.float32)
    off = np.zeros((1, 8, 9, 18), np.float32)
    ours = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt)))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(wgt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_matches_oracle_random_offsets(rng):
    x = rng.normal(0, 1, (2, 6, 7, 3)).astype(np.float32)
    wgt = rng.normal(0, 0.5, (3, 3, 3, 5)).astype(np.float32)
    off = rng.normal(0, 1.5, (2, 6, 7, 18)).astype(np.float32)
    ours = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt)))
    ref = np_deform_conv(x, off, wgt)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_quad_gather_matches_oracle(rng, monkeypatch):
    """HTD_DCN_QUAD=1 (one wide row-gather per tap) matches the oracle."""
    monkeypatch.setenv("HTD_DCN_QUAD", "1")
    x = rng.normal(0, 1, (2, 6, 7, 3)).astype(np.float32)
    wgt = rng.normal(0, 0.5, (3, 3, 3, 5)).astype(np.float32)
    off = rng.normal(0, 1.5, (2, 6, 7, 18)).astype(np.float32)
    ours = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt)))
    ref = np_deform_conv(x, off, wgt)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_quad_equals_corner_path(rng, monkeypatch):
    """Quad-concat and 4-corner formulations agree bitwise-close in f32,
    including far out-of-image offsets and deform_groups=2."""
    x = rng.normal(0, 1, (2, 9, 8, 4)).astype(np.float32)
    wgt = rng.normal(0, 0.5, (3, 3, 4, 6)).astype(np.float32)
    for dg, scale in ((1, 1.5), (1, 30.0), (2, 2.0)):
        off = rng.normal(0, scale, (2, 9, 8, dg * 18)).astype(np.float32)
        monkeypatch.setenv("HTD_DCN_QUAD", "0")
        corner = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt), deform_groups=dg))
        monkeypatch.setenv("HTD_DCN_QUAD", "1")
        quad = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt), deform_groups=dg))
        np.testing.assert_allclose(quad, corner, rtol=1e-5, atol=1e-5)


def test_stride2(rng):
    x = rng.normal(0, 1, (1, 8, 8, 2)).astype(np.float32)
    wgt = rng.normal(0, 0.5, (3, 3, 2, 4)).astype(np.float32)
    off = rng.normal(0, 1.0, (1, 4, 4, 18)).astype(np.float32)
    ours = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt), stride=2)
    )
    ref = np_deform_conv(x, off, wgt, stride=2)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_window_equals_corner_path(rng, monkeypatch):
    """HTD_DCN_IMPL=window (shifted-view select-MAC + capped gather
    fallback) is bit-identical to the 4-corner gather path in f32 across
    offset regimes: in-window, fallback-heavy, mostly-outside, grouped,
    and stride 2."""
    x = rng.normal(0, 1, (2, 9, 8, 4)).astype(np.float32)
    wgt = rng.normal(0, 0.5, (3, 3, 4, 6)).astype(np.float32)
    for dg, scale, stride, m in (
        (1, 0.3, 1, 1),   # all in-window at m=1
        (1, 2.5, 1, 1),   # heavy fallback
        (1, 30.0, 1, 2),  # mostly outside the image
        (2, 2.0, 1, 1),   # deform groups
        (1, 2.0, 2, 1),   # strided (stage-entry DCN blocks)
    ):
        ho = 9 if stride == 1 else 5
        wo = 8 if stride == 1 else 4
        off = rng.normal(0, scale, (2, ho, wo, dg * 18)).astype(np.float32)
        monkeypatch.setenv("HTD_DCN_IMPL", "gather")
        corner = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt),
            stride=stride, deform_groups=dg))
        monkeypatch.setenv("HTD_DCN_IMPL", "window")
        monkeypatch.setenv("HTD_DCN_WINDOW_M", str(m))
        win = np.asarray(deform_conv2d(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt),
            stride=stride, deform_groups=dg))
        np.testing.assert_array_equal(win, corner)


def test_window_bf16_matches_gather_bf16(rng, monkeypatch):
    """bf16 feature path: windowed and gather samplers share the same
    per-corner products and accumulation order, so they agree to bf16
    rounding on the conv output."""
    x = rng.normal(0, 1, (1, 9, 8, 4)).astype(np.float32)
    wgt = rng.normal(0, 0.5, (3, 3, 4, 6)).astype(np.float32)
    off = rng.normal(0, 1.5, (1, 9, 8, 18)).astype(np.float32)
    args = (jnp.asarray(x, jnp.bfloat16), jnp.asarray(off, jnp.bfloat16),
            jnp.asarray(wgt, jnp.bfloat16))
    monkeypatch.setenv("HTD_DCN_IMPL", "gather")
    corner = np.asarray(deform_conv2d(*args).astype(jnp.float32))
    monkeypatch.setenv("HTD_DCN_IMPL", "window")
    win = np.asarray(deform_conv2d(*args).astype(jnp.float32))
    np.testing.assert_allclose(win, corner, rtol=2e-2, atol=2e-2)


def test_window_grads_match_gather(rng, monkeypatch):
    """The windowed path autodiffs: grads w.r.t. input, offsets and weight
    match the gather formulation's grads (same math, shifted-view form)."""
    import jax

    x = jnp.asarray(rng.normal(0, 1, (1, 7, 6, 3)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.5, (3, 3, 3, 4)).astype(np.float32))
    off = jnp.asarray(rng.normal(0, 1.0, (1, 7, 6, 18)).astype(np.float32))

    def loss_fn(x_, off_, wgt_):
        return jnp.sum(jnp.sin(deform_conv2d(x_, off_, wgt_)))

    monkeypatch.setenv("HTD_DCN_IMPL", "gather")
    g_ref = jax.grad(loss_fn, argnums=(0, 1, 2))(x, off, wgt)
    monkeypatch.setenv("HTD_DCN_IMPL", "window")
    g_win = jax.grad(loss_fn, argnums=(0, 1, 2))(x, off, wgt)
    for a, b in zip(g_win, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_kernel_matches_gather(rng, monkeypatch):
    """The fused windowed Pallas kernel (interpret mode) + capped
    correction matches the gather formulation, including fallback-heavy
    offsets and the conv contraction."""
    import jax

    from htd_tpu.ops import dcn_pallas

    monkeypatch.setattr(dcn_pallas, "_INTERPRET", True)
    x = jnp.asarray(rng.normal(0, 1, (2, 11, 13, 8)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.5, (3, 3, 8, 16)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        for scale, cap in ((0.3, 8), (2.5, 256), (30.0, 256)):
            off = jnp.asarray(
                rng.normal(0, scale, (2, 11, 13, 18)).astype(np.float32))
            ref = np.asarray(_dcn_xla_impl(
                x, off, wgt, 1, 1, 1, "gather", 1, cap))
            out = np.asarray(dcn_pallas.dcn_conv_windowed(
                x, off, wgt, pad=1, dilation=1, m=1, cap=cap))
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_custom_vjp_grads(rng, monkeypatch):
    """The pallas-path custom_vjp routes gradients through the gather
    formulation; check against gather-impl autodiff."""
    import jax

    from htd_tpu.ops import dcn_pallas
    from htd_tpu.ops.dcn import _pallas_dcn_fn

    monkeypatch.setattr(dcn_pallas, "_INTERPRET", True)
    _pallas_dcn_fn.cache_clear()
    x = jnp.asarray(rng.normal(0, 1, (1, 9, 10, 4)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.5, (3, 3, 4, 8)).astype(np.float32))
    off = jnp.asarray(rng.normal(0, 1.0, (1, 9, 10, 18)).astype(np.float32))

    # cap = every pixel: the capacity approximation must not engage here,
    # since the sin-loss cotangent depends on the forward value
    fn = _pallas_dcn_fn(1, 1, 1, 90)

    def loss_p(x_, off_, wgt_):
        return jnp.sum(jnp.sin(fn(x_, off_, wgt_)))

    def loss_g(x_, off_, wgt_):
        return jnp.sum(jnp.sin(_dcn_xla_impl(
            x_, off_, wgt_, 1, 1, 1, "gather", 1, 90)))

    with jax.default_matmul_precision("highest"):
        g_p = jax.grad(loss_p, argnums=(0, 1, 2))(x, off, wgt)
        g_r = jax.grad(loss_g, argnums=(0, 1, 2))(x, off, wgt)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_kernel_asym_window_matches_gather(rng, monkeypatch):
    """The asymmetric (-1, 0) floor-displacement window (9 select-MAC
    shifts; HTD_DCN_WIN=asym) + capped correction matches the gather
    formulation for small and fallback-heavy offsets alike."""
    import jax

    from htd_tpu.ops import dcn_pallas

    monkeypatch.setattr(dcn_pallas, "_INTERPRET", True)
    x = jnp.asarray(rng.normal(0, 1, (2, 11, 13, 8)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.5, (3, 3, 8, 16)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        for scale, cap in ((0.2, 256), (2.5, 256)):
            off = jnp.asarray(
                rng.normal(0, scale, (2, 11, 13, 18)).astype(np.float32))
            ref = np.asarray(_dcn_xla_impl(
                x, off, wgt, 1, 1, 1, "gather", 1, cap))
            out = np.asarray(dcn_pallas.dcn_conv_windowed(
                x, off, wgt, pad=1, dilation=1, m=1, cap=cap, lo=-1, hi=0))
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_deform_conv2d_asym_env_dispatch(rng, monkeypatch):
    """HTD_DCN_WIN=asym routes the pallas impl through the (-1, 0) bounds
    and still matches the gather formulation (kernel in interpret mode)."""
    from htd_tpu.ops import dcn_pallas
    from htd_tpu.ops.dcn import _pallas_dcn_fn

    monkeypatch.setattr(dcn_pallas, "_INTERPRET", True)
    _pallas_dcn_fn.cache_clear()
    x = jnp.asarray(rng.normal(0, 1, (1, 9, 10, 4)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.5, (3, 3, 4, 8)).astype(np.float32))
    off = jnp.asarray(
        rng.uniform(-0.95, 0.95, (1, 9, 10, 18)).astype(np.float32))
    ref = np.asarray(_dcn_xla_impl(x, off, wgt, 1, 1, 1, "gather", 1, 128))
    monkeypatch.setenv("HTD_DCN_WIN", "asym")
    monkeypatch.setenv("HTD_DCN_IMPL", "pallas")
    with jax.default_matmul_precision("highest"):
        out = np.asarray(deform_conv2d(x, off, wgt))
    _pallas_dcn_fn.cache_clear()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_stride2_matches_gather(rng, monkeypatch):
    """The stride-2 parity-plane (space-to-depth) kernel variant + capped
    correction matches the gather formulation, sym and asym windows,
    including out-of-window offsets and odd input extents."""
    import jax

    from htd_tpu.ops import dcn_pallas

    monkeypatch.setattr(dcn_pallas, "_INTERPRET", True)
    with jax.default_matmul_precision("highest"):
        for h, w in ((14, 17), (16, 16)):
            ho = (h + 2 - 3) // 2 + 1
            wo = (w + 2 - 3) // 2 + 1
            x = jnp.asarray(
                rng.normal(0, 1, (2, h, w, 8)).astype(np.float32))
            wgt = jnp.asarray(
                rng.normal(0, 0.5, (3, 3, 8, 16)).astype(np.float32))
            for scale in (0.3, 2.5):
                off = jnp.asarray(
                    rng.normal(0, scale, (2, ho, wo, 18)).astype(np.float32))
                ref = np.asarray(_dcn_xla_impl(
                    x, off, wgt, 2, 1, 1, "gather", 1, 256))
                for lo, hi in ((-1, 1), (-1, 0)):
                    out = np.asarray(dcn_pallas.dcn_conv_windowed(
                        x, off, wgt, pad=1, dilation=1, m=1, cap=256,
                        lo=lo, hi=hi, stride=2))
                    np.testing.assert_allclose(
                        out, ref, rtol=1e-4, atol=1e-4,
                        err_msg=f"h={h} w={w} scale={scale} win=({lo},{hi})")


def test_dx_folded_matches_autodiff(rng):
    """_dcn_dx_folded (corner-folded d_x scatter, the TPU training path)
    == autodiff of the gather formulation, stride 1 and 2."""
    import jax

    from htd_tpu.ops import dcn as D

    for stride in (1, 2):
        n, h, w, c, cout = 2, 14, 18, 8, 12
        ho, wo = (h + stride - 1) // stride, (w + stride - 1) // stride
        x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)).astype(np.float32))
        offs = jnp.asarray(
            rng.normal(0, 1.3, (n, ho, wo, 18)).astype(np.float32))
        wt = jnp.asarray(
            rng.normal(0, 0.1, (3, 3, c, cout)).astype(np.float32))
        g = jnp.asarray(
            rng.normal(0, 1, (n, ho, wo, cout)).astype(np.float32))

        d_ref = jax.grad(lambda xx: jnp.sum(
            D._dcn_xla_impl(xx, offs, wt, stride, 1, 1, "gather", 1, 64) * g
        ))(x)
        d_fold = D._dcn_dx_folded(x, offs, wt, g, 3, 3, stride, 1, 1)
        np.testing.assert_allclose(
            np.asarray(d_fold), np.asarray(d_ref), rtol=2e-5, atol=2e-6)


def test_dx_window_transpose_matches_autodiff(rng):
    """_dcn_dx_window (select-MAC transpose, HTD_DCN_DX=window) ==
    autodiff of the gather formulation, both in-window and with the
    exact correction engaged (cap covering every flagged pixel)."""
    import jax

    from htd_tpu.ops import dcn as D

    n, h, w, c, cout = 2, 14, 18, 8, 12
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, c)).astype(np.float32))
    wt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, cout)).astype(np.float32))
    g = jnp.asarray(rng.normal(0, 1, (n, h, w, cout)).astype(np.float32))
    for std, cap in ((0.3, 64), (2.0, h * w)):
        offs = jnp.asarray(
            rng.normal(0, std, (n, h, w, 18)).astype(np.float32))
        d_ref = jax.grad(lambda xx: jnp.sum(
            D._dcn_xla_impl(xx, offs, wt, 1, 1, 1, "gather", 1, 64) * g
        ))(x)
        d_win = D._dcn_dx_window(x, offs, wt, g, 3, 3, 1, 1, -1, 1, cap)
        np.testing.assert_allclose(
            np.asarray(d_win), np.asarray(d_ref), rtol=2e-5, atol=2e-6)
