"""3x3 stride-1 'same' convolution as 9 shifted flat matmuls (TPU).

Why this exists: XLA's TPU convolution emitter handles the batch-1,
256-channel FPN/RPN head convs with an `EmitAllBatchInSublanes` strategy
whose output comes back in a {3,0,2,1:T(2,128)} layout at ~20% MXU
efficiency — the 2026-08-18 xplane trace of the full R-50 program showed
the P2 FPN output conv at 2.67 ms and the P2 RPN conv at 2.08 ms
(~0.4 ms of MXU work each), plus relayout copies between them.

The same contraction expressed as nine matmuls over shifted row-views of
the zero-padded feature map is a plain (H*Wp, C) x (C, C') GEMM chain the
MXU executes near peak, with no layout freedom for XLA to negotiate away:

  out(i, j) = sum_{dy,dx in 0..2} xp(i+dy, j+dx) @ K[dy, dx]

on the flattened padded buffer, a tap's operand is ONE contiguous row
slice (offset dy*Wp + dx), so all nine operands are zero-copy views of
the same array. Wrap-around columns at the x edges land in the padded
output columns, which are sliced away at the end; the top/bottom taps
read the zero row-pads. Bit-exactness vs lax.conv is not guaranteed
(different accumulation order) but both are f32-accumulated GEMMs; the
unit test checks <=1e-5 relative in f32.

Reference parity: used (when HTD_TAPDOT_CONV=1) for the FPN output convs
(reference mmdet/models/necks/fpn.py:108-118) and the RPN 3x3 conv
(reference mmdet/models/dense_heads/rpn_head.py:37-45) — numerics are the
same convolution, only the schedule differs.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jnp.ndarray


def conv3x3_tapdot(x: Array, kernel: Array, bias: Optional[Array] = None) -> Array:
    """3x3, stride 1, padding 1 convolution of NHWC (or HWC) `x`.

    kernel: (3, 3, Cin, Cout) HWIO (same as flax nn.Conv). Computation runs
    in x.dtype with the MXU's native f32 accumulation inside each GEMM;
    the 9 tap partials are summed in x.dtype.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = (int(s) for s in x.shape)
    co = int(kernel.shape[-1])
    wp = w + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # flat padded rows, plus ONE leading zero row (tap offset dy*wp+dx-1
    # has min -1) and ONE trailing zero row (the sliced-away garbage
    # column q=wp-1 at dx=2 reads one element past the buffer)
    flat = jnp.pad(xp.reshape(b, (h + 2) * wp, c), ((0, 0), (1, 1), (0, 0)))
    m = h * wp
    kern = kernel.astype(x.dtype)
    out = None
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice_in_dim(flat, dy * wp + dx, dy * wp + dx + m, axis=1)
            t = jax.lax.dot_general(
                sl,
                kern[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=x.dtype,
            )
            out = t if out is None else out + t
    out = out.reshape(b, h, wp, co)[:, :, 1 : w + 1, :]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out[0] if squeeze else out


class TapDotConv3x3(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), padding 1): same param names
    ('kernel' HWIO, 'bias'), same init — checkpoints are interchangeable."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = int(x.shape[-1])
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features), jnp.float32
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return conv3x3_tapdot(x.astype(self.dtype), kernel, bias)
