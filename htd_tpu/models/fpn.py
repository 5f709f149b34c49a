"""Feature Pyramid Network neck.

Behavioral spec: reference mmdet/models/necks/fpn.py:10-199 with the HTD
config (in_channels [256,512,1024,2048] -> 256, num_outs=5, no extra convs):
lateral 1x1 convs, top-down nearest-upsample adds, 3x3 output convs, and an
extra P6 = max_pool(P5, 1, stride 2).
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from htd_tpu.models.layers import conv, max_pool, resize_nearest
from htd_tpu.ops.upsample import upsample2x_add

Array = jnp.ndarray


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[Array]) -> Tuple[Array, ...]:
        n = len(inputs)
        laterals = [
            conv(self.out_channels, 1, 1, dtype=self.dtype, name=f"lateral_{i}")(
                inputs[i]
            )
            for i in range(n)
        ]
        for i in range(n - 1, 0, -1):
            target = laterals[i - 1].shape[-3:-1]
            lo, hi = laterals[i], laterals[i - 1]
            if (
                lo.ndim == 4
                and target[0] == 2 * lo.shape[-3]
                and target[1] == 2 * lo.shape[-2]
            ):
                # upsample2x_add: XLA broadcast+add by default; the Pallas
                # form (HTD_PALLAS_UPSAMPLE=1) pins row-major layouts at the
                # custom-call boundary so XLA cannot flip the surrounding
                # convs into the slow T(2,128) layout (see ops/upsample.py)
                laterals[i - 1] = upsample2x_add(lo, hi)
            else:
                laterals[i - 1] = hi + resize_nearest(lo, target)
        if (
            jax.default_backend() != "cpu"
            and os.environ.get(
                "HTD_TAPDOT_FPN", os.environ.get("HTD_TAPDOT_CONV", "1")
            )
            == "1"
        ):
            # 9-shifted-flat-matmul 3x3 conv (ops/conv3x3.py): the XLA
            # emitter ran the P2 output conv at ~20% MXU efficiency
            # (2.67 ms, T(2,128) output) in the full program
            from htd_tpu.ops.conv3x3 import TapDotConv3x3

            out_conv = lambda i: TapDotConv3x3(  # noqa: E731
                self.out_channels, dtype=self.dtype, name=f"fpn_{i}"
            )
        else:
            out_conv = lambda i: conv(  # noqa: E731
                self.out_channels, 3, 1, dtype=self.dtype, name=f"fpn_{i}"
            )
        outs = [out_conv(i)(laterals[i]) for i in range(n)]
        for _ in range(self.num_outs - n):
            outs.append(max_pool(outs[-1], 1, 2, 0))
        return tuple(outs)
