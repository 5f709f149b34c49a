"""Exact tiled top-k.

`jax.lax.top_k` over a couple hundred thousand RPN scores lowers to a
sort-bound path on TPU; the two-stage form (per-tile top-k, then top-k of
the ~t*k candidates) is exact because every global top-k element is in its
tile's top-k (k candidates kept per tile). Only the ORDER AMONG EXACTLY
TIED values at the cut boundary can differ from the flat call (the flat
call breaks ties by global index, the tiled form by (tile, within-tile)
index) — f32 sigmoid scores make ties measure-zero, and the reference's
torch.topk pins no tie order either (mmdet anchor_head.py topk use).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def top_k_tiled(x: Array, k: int, tile: int = 8192):
    """top-k of a 1-D array via per-tile prefilter. Returns (values, idx),
    both (k,), descending — same contract as jax.lax.top_k."""
    n = int(x.shape[0])
    if n <= max(2 * k, tile):
        return jax.lax.top_k(x, k)
    t = (n + tile - 1) // tile
    pad = t * tile - n
    if pad:
        x = jnp.pad(x, (0, pad), constant_values=-jnp.inf)
    xr = x.reshape(t, tile)
    kk = min(k, tile)
    s, i = jax.lax.top_k(xr, kk)  # (t, kk)
    gi = i + (jnp.arange(t, dtype=i.dtype) * tile)[:, None]
    vals, j = jax.lax.top_k(s.reshape(-1), k)
    return vals, gi.reshape(-1)[j]
