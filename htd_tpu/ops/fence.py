"""layout_fence: identity Pallas op that pins row-major layouts.

XLA layout assignment negotiates layouts END TO END: a gather/reshape
consumer can flip its producing convolution into a slow layout (measured
0.38 -> 2.69 ms on the FPN P2 conv, PERF.md round 3). A Pallas custom
call's operands/results are pinned row-major at ITS boundary only, so
`layout_fence(x)` placed between a conv and a hostile consumer keeps the
conv native and localizes the cost to one relayout copy of `x`.

Cost: 2x DMA of the tensor (read+write) ≈ 2*bytes/819GB/s on v5e; only
worth it where a trace shows conv-layout poisoning (A/B gated at call
sites, e.g. HTD_DCN_FENCE=1 in ops/dcn.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray

_INTERPRET = False  # test hook


def _kernel(src_ref, dst_ref):
    dst_ref[...] = src_ref[...]


@jax.custom_vjp
def layout_fence(x: Array) -> Array:
    """Identity. On TPU, a Pallas copy pinning row-major at its boundary;
    elsewhere a no-op. Gradient passes through unfenced."""
    return _fence_impl(x)


def _fence_impl(x: Array) -> Array:
    if jax.default_backend() == "cpu" and not _INTERPRET:
        return x
    shape = x.shape
    x3 = x.reshape((-1,) + tuple(shape[-2:])) if x.ndim != 3 else x
    n, h, c = (int(s) for s in x3.shape)
    stripe = 8
    block_bytes = lambda s: s * h * c * x3.dtype.itemsize
    while stripe > 1 and (n % stripe or block_bytes(stripe) > 2_500_000):
        stripe //= 2
    out = pl.pallas_call(
        _kernel,
        grid=(n // stripe,),
        in_specs=[pl.BlockSpec((stripe, h, c), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((stripe, h, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x3.dtype),
        interpret=_INTERPRET,
    )(x3)
    return out.reshape(shape)


def _fwd(x):
    return _fence_impl(x), None


def _bwd(_, g):
    return (g,)


layout_fence.defvjp(_fwd, _bwd)
