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
