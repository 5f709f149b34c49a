"""Shared NN building blocks (flax.linen, NHWC)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored running statistics.

    Matches the reference's `norm_eval=True` backbone BN (resnet.py:640-652):
    running mean/var are frozen buffers; gamma/beta remain parameters (their
    trainability is decided by the optimizer mask, mirroring `frozen_stages`).
    Stats live in the `batch_stats` collection so checkpoint converters can
    address them separately.
    """

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        ).value
        # fold into a single scale/shift (cheap, fusable)
        mul = scale * jax.lax.rsqrt(var + self.eps)
        add = bias - mean * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class MXUGroupNorm(nn.Module):
    """GroupNorm with MXU-contracted statistics (drop-in for nn.GroupNorm).

    flax's nn.GroupNorm lowers the per-sample mean/variance to f32 VPU
    convert+reduce fusions; on the 1000-roi BA reg conv stack those reduces
    cost ~7.5 ms/image (xplane, PERF.md round 3c) — more than the conv
    stack's own MXU time. Here the (spatial x group) reduction is expressed
    as one matmul per moment against a constant 0/1 group-selection matrix
    (bf16 inputs, f32 MXU accumulation), and the normalize is a single
    elementwise fusion. Statistics formula matches flax (E[x^2] - E[x]^2).

    Semantics: torch nn.GroupNorm over (C/g, *spatial) of each leading-axis
    sample — the mmdet ConvModule GN used by the reference BA branch
    (htd_bbox_head.py:103-117). Param names/shapes are identical to
    nn.GroupNorm (scale/bias, (C,), f32) so checkpoints are interchangeable.

    OPT-IN via HTD_MXU_GN=1: the 2026-08-18 on-chip A/B on the R-50 bench
    was neutral-to-slightly-worse (23.42 vs 23.57 img/s with flax GN) —
    the per-roi GN reduces are not a measurable cost in the production
    program, so the simpler flax form stays the default.
    """

    num_groups: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = int(x.shape[-1])
        g = self.num_groups
        assert c % g == 0, (c, g)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x = jnp.asarray(x, self.dtype)
        n = int(x.shape[0])
        k = 1
        for d in x.shape[1:]:
            k *= int(d)
        spatial = k // c
        xf = x.reshape(n, k)
        # constant (K, g) 0/1 selection: column j sums every spatial position
        # of group j's channels. Flattening order of x is (spatial..., C),
        # so the matrix is the (C, g) group one-hot tiled over spatial.
        sel = jnp.repeat(jnp.eye(g, dtype=x.dtype), c // g, axis=0)  # (C, g)
        m = jnp.broadcast_to(sel[None], (spatial, c, g)).reshape(k, g)
        # f32 inputs must not be demoted to bf16 passes (platform quirk);
        # bf16 inputs accumulate in f32 on the MXU natively.
        prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        s1 = jax.lax.dot(xf, m, precision=prec,
                         preferred_element_type=jnp.float32)
        s2 = jax.lax.dot(xf * xf, m, precision=prec,
                         preferred_element_type=jnp.float32)
        cnt = float(k // g)
        mean = s1 / cnt                                   # (n, g) f32
        var = s2 / cnt - mean * mean
        rstd = jax.lax.rsqrt(var + self.epsilon)
        rstd_c = jnp.repeat(rstd, c // g, axis=1)         # (n, C)
        mean_c = jnp.repeat(mean, c // g, axis=1)
        mul = scale[None, :] * rstd_c
        add = bias[None, :] - mean_c * mul
        shape = (n,) + (1,) * (x.ndim - 2) + (c,)
        return x * mul.astype(x.dtype).reshape(shape) + add.astype(
            x.dtype
        ).reshape(shape)


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    use_bias: bool = True,
    name: Optional[str] = None,
    dtype: Any = jnp.float32,
) -> nn.Conv:
    """3x3/1x1/NxN conv with torch-style 'same' padding for odd kernels."""
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class ConvGNReLU(nn.Module):
    """Conv -> optional GroupNorm -> optional ReLU (the ConvModule pattern)."""

    features: int
    kernel: int = 3
    stride: int = 1
    gn_groups: Optional[int] = None
    use_bias: bool = True
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = conv(
            self.features,
            self.kernel,
            self.stride,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.gn_groups is not None:
            x = nn.GroupNorm(
                num_groups=self.gn_groups, epsilon=1e-5, dtype=self.dtype, name="gn"
            )(x)
        if self.act:
            x = nn.relu(x)
        return x


def max_pool(x: Array, window: int, stride: int, padding) -> Array:
    """Max pool with explicit torch-style padding ((lo, hi) per spatial dim)."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding=padding
    )


def resize_nearest(x: Array, size: Tuple[int, int]) -> Array:
    """Nearest-neighbor resize of NHWC (or HWC) to (H, W) = size.

    Exact integer upscales use broadcast+reshape: jax.image.resize lowers
    to a resize op whose T(2,128) output layout poisoned the downstream
    FPN/RPN convolutions (measured 7x slower on P2; PERF.md round 2).
    A flat row-gather formulation was also tried and was WORSE in-program
    (backbone+FPN 3.9 -> 10.0 ms; PERF.md round-3 negative results).
    """
    h, w = int(x.shape[-3]), int(x.shape[-2])
    th, tw = int(size[0]), int(size[1])
    if th % h == 0 and tw % w == 0:
        fy, fx = th // h, tw // w
        lead = x.shape[:-3]
        b = x.reshape(lead + (h, 1, w, 1, x.shape[-1]))
        b = jnp.broadcast_to(
            b, lead + (h, fy, w, fx, x.shape[-1])
        )
        return b.reshape(lead + (th, tw, x.shape[-1]))
    shape = x.shape[:-3] + (th, tw, x.shape[-1])
    return jax.image.resize(x, shape, method="nearest")
