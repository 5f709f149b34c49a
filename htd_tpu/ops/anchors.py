"""Anchor generation for RPN.

Behavioral spec: /root/reference/mmdet/core/anchor/anchor_generator.py
(base anchors from scales x ratios per stride, grid shifting, valid flags).
All anchors for a static feature-map size are precomputable constants, so
grid generation happens at trace time with numpy and the results are baked
into the compiled program.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class AnchorGenerator:
    """Standard 2D anchor generator (scale-major=False ordering like mmdet).

    Args:
      strides: anchor strides per FPN level, e.g. (4, 8, 16, 32, 64).
      ratios: h/w aspect ratios, e.g. (0.5, 1.0, 2.0).
      scales: anchor scales (multiples of stride), e.g. (8,).
      center_offset: offset of the anchor center relative to the stride grid.
    """

    def __init__(
        self,
        strides: Sequence[int] = (4, 8, 16, 32, 64),
        ratios: Sequence[float] = (0.5, 1.0, 2.0),
        scales: Sequence[float] = (8,),
        center_offset: float = 0.0,
    ):
        self.strides = tuple(int(s) for s in strides)
        self.ratios = np.asarray(ratios, dtype=np.float32)
        self.scales = np.asarray(scales, dtype=np.float32)
        self.center_offset = center_offset
        self.base_anchors = [
            self._base_anchors_for_stride(s) for s in self.strides
        ]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> int:
        return len(self.ratios) * len(self.scales)

    def _base_anchors_for_stride(self, stride: int) -> np.ndarray:
        """(A, 4) base anchors centered at `center_offset * stride`.

        Ordering: ratio-major, scale-minor (ratio varies slowest) — this must
        match the conv-head channel layout used when flattening predictions.
        """
        w = h = float(stride)
        xc = self.center_offset * w
        yc = self.center_offset * h
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        base = np.stack(
            [xc - 0.5 * ws, yc - 0.5 * hs, xc + 0.5 * ws, yc + 0.5 * hs],
            axis=-1,
        )
        return base.astype(np.float32)

    def grid_anchors_level(
        self, level: int, featmap_size: Tuple[int, int]
    ) -> jnp.ndarray:
        """All anchors of one level for a (H, W) feature map.

        Returns `(H*W*A, 4)`, location-major (anchor index varies fastest),
        matching a `(H, W, A*C) -> (-1, C)` flattening of head outputs.
        """
        fh, fw = featmap_size
        stride = self.strides[level]
        shift_x = np.arange(fw, dtype=np.float32) * stride
        shift_y = np.arange(fh, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)  # (H, W)
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        anchors = shifts + self.base_anchors[level][None, :, :]
        return jnp.asarray(anchors.reshape(-1, 4))

    def grid_anchors(
        self, featmap_sizes: Sequence[Tuple[int, int]]
    ) -> List[jnp.ndarray]:
        return [
            self.grid_anchors_level(i, s) for i, s in enumerate(featmap_sizes)
        ]

    def valid_flags_level(
        self,
        level: int,
        featmap_size: Tuple[int, int],
        valid_shape,
    ) -> jnp.ndarray:
        """Per-anchor validity for an image whose un-padded (resized) shape is
        `valid_shape` = (h, w) (may be traced values).

        A grid cell is valid when its index is inside ceil(valid/stride);
        all A anchors of a cell share the flag. Returns bool `(H*W*A,)`.
        """
        fh, fw = featmap_size
        stride = self.strides[level]
        vh = jnp.minimum(
            jnp.ceil(jnp.asarray(valid_shape[0], jnp.float32) / stride), fh
        ).astype(jnp.int32)
        vw = jnp.minimum(
            jnp.ceil(jnp.asarray(valid_shape[1], jnp.float32) / stride), fw
        ).astype(jnp.int32)
        ys = jnp.arange(fh, dtype=jnp.int32) < vh
        xs = jnp.arange(fw, dtype=jnp.int32) < vw
        cell = ys[:, None] & xs[None, :]
        flags = jnp.repeat(cell.reshape(-1), self.num_base_anchors)
        return flags

    def valid_flags(
        self, featmap_sizes: Sequence[Tuple[int, int]], valid_shape
    ) -> List[jnp.ndarray]:
        return [
            self.valid_flags_level(i, s, valid_shape)
            for i, s in enumerate(featmap_sizes)
        ]


def anchor_inside_flags(
    flat_anchors: jnp.ndarray,
    valid_flags: jnp.ndarray,
    img_shape,
    allowed_border: float = 0.0,
) -> jnp.ndarray:
    """Anchors fully inside the (resized, un-padded) image + border.

    Behavioral spec: reference anchor_head.py / core/anchor utils; used in
    RPN training to restrict assignment to in-image anchors.
    """
    if allowed_border < 0:
        return valid_flags
    h = jnp.asarray(img_shape[0], flat_anchors.dtype)
    w = jnp.asarray(img_shape[1], flat_anchors.dtype)
    inside = (
        (flat_anchors[:, 0] >= -allowed_border)
        & (flat_anchors[:, 1] >= -allowed_border)
        & (flat_anchors[:, 2] < w + allowed_border)
        & (flat_anchors[:, 3] < h + allowed_border)
    )
    return valid_flags & inside
