"""RoI feature extractors.

Behavioral specs:
  * SingleRoIExtractor: reference single_level_roi_extractor.py:9-98 —
    RoIAlign on the FPN level selected by floor(log2(sqrt(area)/56)).
  * AdptRoIExtractor (the BA extractor): reference
    adaptative_roi_extractor.py:24-91 — RoIAlign on ALL levels, per-level
    scalar attention (GAP -> 1x1 conv 256->128 -> tanh -> 1x1 conv 128->1),
    softmax over levels, weighted sum, plus a level-0 "border ring" feature
    (interior zeroed at `edge` pixels).

All functions take one image's (H_l, W_l, C) features + a fixed-capacity
(R, 4) roi array; batch via vmap at the call site.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from htd_tpu.config import RoIExtractorConfig
from htd_tpu.ops.boxes import map_roi_levels
from htd_tpu.ops.roi_align import roi_align, roi_align_pyramid  # noqa: F401

Array = jnp.ndarray


def single_roi_extract(
    feats: Sequence[Array],
    rois: Array,
    cfg: RoIExtractorConfig,
) -> Array:
    """Level-mapped RoIAlign. feats: per-level (H,W,C); rois (R,4) -> (R,7,7,C)."""
    lvls = map_roi_levels(rois, len(cfg.featmap_strides), cfg.finest_scale)
    impl = cfg.impl
    if impl == "auto":
        impl = "gather" if jax.default_backend() == "cpu" else "pallas"
    if impl == "pallas":
        from htd_tpu.ops.roi_align_pallas import roi_align_fused_trainable

        return roi_align_fused_trainable(
            feats,
            rois,
            cfg.featmap_strides,
            lvls,
            out_size=cfg.out_size,
            sampling_ratio=cfg.sampling_ratio,
            max_samples=cfg.max_samples,
        )
    return roi_align_pyramid(
        feats,
        rois,
        cfg.featmap_strides,
        lvls,
        out_size=cfg.out_size,
        sampling_ratio=cfg.sampling_ratio,
        max_samples=cfg.max_samples,
    )


def single_roi_extract_batched(
    feats: Sequence[Array],
    rois: Array,
    cfg: RoIExtractorConfig,
) -> Array:
    """Batched level-mapped RoIAlign: feats per-level (B,H,W,C), rois
    (B,R,4) -> (B,R,7,7,C).

    One Pallas grid over all B*R rois via an image-major pyramid — NOT
    vmap(single_roi_extract): vmapping the kernel's batching rule measured
    ~2.6x slower in-model (PERF.md round 2), and a shared grid lets window
    sorting amortize across images.
    """
    lvls = jax.vmap(
        lambda r: map_roi_levels(r, len(cfg.featmap_strides), cfg.finest_scale)
    )(rois)
    impl = cfg.impl
    if impl == "auto":
        impl = "gather" if jax.default_backend() == "cpu" else "pallas"
    if impl not in ("pallas", "pallas_v3", "pallas_v4", "gather"):
        raise ValueError(
            f"unknown roi extractor impl {impl!r}; expected one of "
            "auto/pallas/pallas_v3/pallas_v4/gather"
        )
    if impl.startswith("pallas"):
        from htd_tpu.ops.roi_align_pallas import (
            roi_align_fused_batched_trainable,
        )

        return roi_align_fused_batched_trainable(
            feats,
            rois,
            cfg.featmap_strides,
            lvls,
            out_size=cfg.out_size,
            sampling_ratio=cfg.sampling_ratio,
            max_samples=cfg.max_samples,
            kernel="v3" if impl == "pallas_v3" else "v4",
        )
    from htd_tpu.ops.roi_align import roi_align_pyramid_batched

    return roi_align_pyramid_batched(
        feats,
        rois,
        cfg.featmap_strides,
        lvls,
        out_size=cfg.out_size,
        sampling_ratio=cfg.sampling_ratio,
        max_samples=cfg.max_samples,
    )


class AdptRoIExtractor(nn.Module):
    """BA extractor: attention-weighted all-level fusion + border ring."""

    cfg: RoIExtractorConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: Sequence[Array],
        rois: Array,
        target_feats: Optional[Array] = None,
        target_lvls: Optional[Array] = None,
    ) -> Array:
        """feats: per-level (B, H, W, C); rois (B, R, 4) -> (B, R, 7, 7, C).

        target_feats/target_lvls (optional): each roi's SingleRoIExtractor
        features on its mapped level ((B, R, 7, 7, C) / (B, R)) — already
        computed by the cascade on the same rois. When given, they replace
        the roi's own-level row of the all-level stack, so the dominant
        -attention level keeps the exact adaptive-grid sampling while the
        off-target levels use the cheaper `adpt_max_samples` clamp.
        """
        att_conv1 = nn.Dense(128, dtype=self.dtype, name="att_conv1")
        att_conv2 = nn.Dense(1, dtype=self.dtype, name="att_conv2")

        # NOTE: the windowed Pallas kernel is a measured NO-WIN here (see
        # PERF.md): a large roi sampling a finer level intrinsically exceeds
        # any bounded window, so ~20% of (roi, level) pairs fall back to the
        # gather anyway. The gathers instead ride the SHARED v4 pyramid
        # buffer (roi_align_levels_pyramid) — bit-identical to per-level
        # flat gathers, CSEs with the fused extraction kernel's build, and
        # keeps reshape/gather consumers off the FPN conv outputs (layout
        # war, PERF.md round 3).
        from htd_tpu.ops.roi_align_pallas import roi_align_levels_pyramid

        num_levels = len(self.cfg.featmap_strides)
        aligned = roi_align_levels_pyramid(
            feats,
            rois,
            self.cfg.featmap_strides,
            out_size=self.cfg.out_size,
            sampling_ratio=self.cfg.sampling_ratio,
            max_samples=self.cfg.adpt_max_samples,
        )
        per_level = []
        for lvl in range(num_levels):
            rf = aligned[lvl]  # (B, R, 7, 7, C)
            if target_feats is not None:
                sel = (target_lvls == lvl)[..., None, None, None]
                rf = jnp.where(sel, target_feats.astype(rf.dtype), rf)
            per_level.append(rf)

        att_logits = []
        for lvl in range(num_levels):
            pooled = per_level[lvl].mean(axis=(2, 3))  # GAP -> (B, R, C)
            a = att_conv2(jnp.tanh(att_conv1(pooled)))  # (B, R, 1)
            att_logits.append(a[..., 0])

        att = jax.nn.softmax(jnp.stack(att_logits, axis=0), axis=0)  # (L, B, R)
        stacked = jnp.stack(per_level, axis=0)  # (L, B, R, 7, 7, C)
        fused = jnp.einsum("lbrhwc,lbr->brhwc", stacked, att.astype(stacked.dtype))

        # border ring from the finest level: zero the interior
        ring = per_level[0]
        e = self.cfg.adpt_edge
        o = self.cfg.out_size
        ys = jnp.arange(o)
        border = (ys < e) | (ys >= o - e)
        keep = border[:, None] | border[None, :]  # (7, 7) True on the ring
        ring = ring * keep[None, None, :, :, None].astype(ring.dtype)
        return fused + ring
