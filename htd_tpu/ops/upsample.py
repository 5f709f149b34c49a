"""Fused nearest-2x upsample + add (the FPN top-down step) as a Pallas op.

Status: OPT-IN experiment (HTD_PALLAS_UPSAMPLE=1); the XLA broadcast form
is the production default. Rationale history: xplane profiling with the
round-2 XLA pad+concat pyramid showed the broadcast lowering's T(2,128)
layout propagating back into the FPN convs (P2 3x3 conv 0.38 -> 2.7 ms),
which motivated this kernel — pinning {2,1,0} row-major at a custom-call
boundary. But once the Pallas pyramid builder took over the downstream
side (round 3), the on-chip A/B showed this kernel costing ~5 ms MORE
end-to-end than the XLA form (backbone_fpn 9.85 -> 4.54 ms with it off,
both-gates bisection, v5e 800x1344 R-50): the layout war it was built to
win no longer exists, and its own relayout copies now dominate.

Semantics match `resize_nearest(low, 2x) + lat` exactly (pure duplication,
no resampling), reference FPN top-down step mmdet/models/necks/fpn.py:152
(`F.interpolate(..., scale_factor=2, mode='nearest')` + add).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# test hook: run the Pallas kernel in interpret mode on CPU (the normal
# CPU path short-circuits to the XLA broadcast form and would never
# exercise the kernel body under the CPU-only test suite)
_INTERPRET = False


def _xla_up2_add(low: Array, lat: Array) -> Array:
    import os

    b, h, w, c = low.shape
    x = jnp.broadcast_to(
        low[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)
    out = lat + x
    # The broadcast+reshape lowering prefers T(2,128); in the FULL program
    # XLA fuses it into the downstream 3x3 FPN output conv and flips that
    # conv onto the slow EmitAllBatchInSublanes emitter (P2 conv 0.38 ->
    # 2.8 ms, xplane round-3b). A row-major fence on the sum localizes the
    # cost to one ~0.1 ms copy. A/B gate: HTD_FPN_FENCE=1.
    if (
        jax.default_backend() != "cpu"
        and os.environ.get("HTD_FPN_FENCE", "0") == "1"
    ):
        from htd_tpu.ops.fence import layout_fence

        out = layout_fence(out)
    return out


def _kernel(low_ref, lat_ref, out_ref):
    x = low_ref[0]  # (yb, w, c)
    yb, w, c = x.shape
    # y-interleave: leading (loop) dim, broadcast+reshape is free
    x = jnp.broadcast_to(x[:, None], (yb, 2, w, c)).reshape(2 * yb, w, c)
    # x-interleave on the sublane dim
    x = pltpu.repeat(x[:, :, None, :], 2, axis=2).reshape(2 * yb, 2 * w, c)
    out_ref[0] = lat_ref[0] + x.astype(lat_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def upsample2x_add(low: Array, lat: Array) -> Array:
    """lat + nearest_2x_upsample(low).

    low: (B, h, w, C); lat: (B, 2h, 2w, C). Falls back to the XLA
    broadcast form off-TPU or on non-exact shapes.
    """
    return _up2_add_impl(low, lat)


def _up2_add_impl(low: Array, lat: Array) -> Array:
    import os

    b, h, w, c = low.shape
    b2, h2, w2, c2 = lat.shape
    if h2 != 2 * h or w2 != 2 * w or b2 != b or c2 != c:
        from htd_tpu.models.layers import resize_nearest

        return lat + resize_nearest(low, (h2, w2))
    # On-chip A/B (round 3, v5e, 800x1344 R-50): the Pallas form measured
    # ~5 ms SLOWER end-to-end than the XLA broadcast form (it pinned
    # layouts at the custom-call boundary but lost more than it saved),
    # so XLA is the default; HTD_PALLAS_UPSAMPLE=1 opts in for A/B.
    if (
        jax.default_backend() == "cpu"
        or os.environ.get("HTD_PALLAS_UPSAMPLE", "0") != "1"
        or os.environ.get("HTD_XLA_UPSAMPLE", "0") == "1"
    ) and not _INTERPRET:
        return _xla_up2_add(low, lat)
    # yb rows of `low` per grid step. Budget the lat/out block to ~2.5 MB
    # so the six pipeline buffers (in+lat+out, double-buffered) stay well
    # inside the ~16 MB VMEM even at the X-101 test scale (1600-wide P2).
    yb = 8
    lat_block_bytes = lambda y: 2 * y * w2 * c * lat.dtype.itemsize
    while yb > 1 and (h % yb or lat_block_bytes(yb) > 2_500_000):
        yb //= 2
    grid = (b, h // yb)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, yb, w, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, 2 * yb, w2, c), lambda bi, i: (bi, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * yb, w2, c), lambda bi, i: (bi, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(lat.shape, lat.dtype),
        interpret=_INTERPRET,
    )(low, lat)


def _fwd(low, lat):
    return _up2_add_impl(low, lat), None


def _bwd(_, g):
    # d/dlat = g; d/dlow = 2x2 sum-pool of g (each low pixel fans out to a
    # 2x2 block of the upsampled grid)
    b, h2, w2, c = g.shape
    d_low = g.reshape(b, h2 // 2, 2, w2 // 2, 2, c).sum(axis=(2, 4))
    return d_low, g


upsample2x_add.defvjp(_fwd, _bwd)
