import numpy as np
import jax
import jax.numpy as jnp

from htd_tpu.ops.dcn import deform_conv2d


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
