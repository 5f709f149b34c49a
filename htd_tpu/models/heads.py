"""RoI heads: SFA global-context head, stage-0 Shared2FC head, and the
stage-1 heterogeneous HTD head (PGraph classification + BA regression).

Behavioral specs:
  * GlobalContextHead (SFA): reference global_context_head.py:323-401 —
    4x (3x3 conv + ReLU) on the TOPMOST FPN level, GAP, FC -> C+1 logits;
    the pooled 256-d vector is the per-image global feature fused into
    every RoI (the ISC mechanism).
  * Shared2FCBBoxHead: reference convfc_bbox_head.py:135-191 — flatten ->
    2x FC(1024)+ReLU -> cls(C+1) / reg(4, class-agnostic).
  * HTDBBoxHead: reference htd_bbox_head.py:34-230. The reference's
    per-image-per-level Python loop over graph blocks (lines 198-219) is
    re-derived here as batched masked dense ops over (R, R) matrices —
    mathematically identical because the (image, level) groups are disjoint
    (see SURVEY.md §7 step 5).

Shapes: heads take batched (B, R, ...) inputs; PGraph's block structure is
expressed with per-image masks, vmapped over B.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from htd_tpu.config import GlobalContextConfig, HTDHeadConfig
from htd_tpu.models.layers import MXUGroupNorm
from htd_tpu.ops.boxes import bbox_overlaps, map_roi_levels

Array = jnp.ndarray

xavier_uniform = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


class GlobalContextHead(nn.Module):
    """SFA head. Returns (mc_logits (B, C+1), global_feat (B, conv_out))."""

    cfg: GlobalContextConfig
    num_classes_p1: int = 81
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, top_feat: Array) -> Tuple[Array, Array]:
        x = top_feat  # (B, H, W, C) — the topmost FPN level (feats[-1])
        for i in range(self.cfg.num_convs):
            x = nn.Conv(
                self.cfg.conv_out_channels, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        pooled = x.mean(axis=(1, 2))  # (B, C)
        logits = nn.Dense(
            self.num_classes_p1,
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="fc",
        )(pooled)
        return logits, pooled


class Shared2FCBBoxHead(nn.Module):
    """Stage-0 head. cls params are explicit so PGraph can read the prototype."""

    num_classes: int = 80
    fc_out: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(self.fc_out, kernel_init=xavier_uniform, dtype=self.dtype)
        self.fc2 = nn.Dense(self.fc_out, kernel_init=xavier_uniform, dtype=self.dtype)
        self.cls_kernel = self.param(
            "fc_cls_kernel",
            nn.initializers.normal(0.01),
            (self.fc_out, self.num_classes + 1),
            jnp.float32,
        )
        self.cls_bias = self.param(
            "fc_cls_bias", nn.initializers.zeros, (self.num_classes + 1,), jnp.float32
        )
        self.fc_reg = nn.Dense(
            4, kernel_init=nn.initializers.normal(0.001), dtype=self.dtype
        )

    def __call__(self, roi_feats: Array) -> Tuple[Array, Array]:
        """roi_feats: (..., 7, 7, C) -> cls (..., C+1), reg (..., 4)."""
        flat = roi_feats.reshape(roi_feats.shape[:-3] + (-1,))
        x = nn.relu(self.fc1(flat))
        x = nn.relu(self.fc2(x))
        cls = x @ self.cls_kernel.astype(x.dtype) + self.cls_bias.astype(x.dtype)
        reg = self.fc_reg(x)
        return cls, reg

    def cls_params(self) -> Tuple[Array, Array]:
        return self.cls_kernel, self.cls_bias


def _pgraph_single(
    x_feat: Array,      # (R, F) post-fcs cls features (un-fused)
    sam: Array,         # (R, S) semantic activation map rows
    rois: Array,        # (R, 4)
    lvls: Array,        # (R,) int32
    valid: Array,       # (R,) bool
) -> Array:
    """One image's graph mixing: returns A_global @ (A_local @ x_feat), (R, F).

    Reproduces htd_bbox_head.py:198-219 for all (image, level) blocks at
    once: adjacency/softmax are masked to the (same level ∧ valid) group.
    """
    r = rois.shape[0]
    f32 = jnp.float32
    eye = jnp.eye(r, dtype=bool)
    group = (lvls[:, None] == lvls[None, :]) & valid[:, None] & valid[None, :]
    group = group | eye  # padded rois form singleton groups (avoids NaNs)

    iou = bbox_overlaps(rois.astype(f32), rois.astype(f32))
    adj = ((iou > 0) | eye) & group  # binarized local adjacency, self-loops

    deg = jnp.sum(adj.astype(f32), axis=-1)
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    a_local = adj.astype(f32) * dinv[:, None] * dinv[None, :]
    mixed = a_local.astype(x_feat.dtype) @ x_feat  # (R, F)

    sim = (sam @ sam.T).astype(f32)  # (R, R)
    # reference: softmax((1 - local_mask) * sim) over the group row —
    # local entries contribute score 0, non-group entries are excluded.
    score = jnp.where(adj, 0.0, sim)
    score = jnp.where(group, score, -jnp.inf)
    a_global = jax.nn.softmax(score, axis=-1)
    return a_global.astype(mixed.dtype) @ mixed


class HTDBBoxHead(nn.Module):
    """Stage-1 heterogeneous head (PGraph cls + BA reg)."""

    cfg: HTDHeadConfig
    num_levels: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.fcs1 = nn.Dense(c.fc_out_channels, kernel_init=xavier_uniform, dtype=self.dtype)
        self.fcs2 = nn.Dense(c.fc_out_channels, kernel_init=xavier_uniform, dtype=self.dtype)
        self.fc_cls = nn.Dense(
            c.num_classes + 1, kernel_init=nn.initializers.normal(0.01), dtype=self.dtype
        )
        self.fc_reg = nn.Dense(
            4, kernel_init=nn.initializers.normal(0.001), dtype=self.dtype
        )
        # 4 per-level GCN linears, stored stacked for a batched einsum
        self.graph_kernel = self.param(
            "graph_kernel",
            xavier_uniform,
            (self.num_levels, c.fc_out_channels, c.fc_out_channels),
            jnp.float32,
        )
        self.graph_bias = self.param(
            "graph_bias",
            nn.initializers.zeros,
            (self.num_levels, c.fc_out_channels),
            jnp.float32,
        )
        # BA reg conv stack: 3x3 no-bias convs, GN(36) on all but the last
        convs = []
        for i in range(c.num_reg_convs):
            out_ch = c.reg_out_channels if i == c.num_reg_convs - 1 else c.reg_mid_channels
            convs.append(
                nn.Conv(
                    out_ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                    dtype=self.dtype, name=f"reg_conv{i}",
                )
            )
        self.reg_convs = convs
        # MXUGroupNorm (statistics as MXU dots) is OPT-IN: the 2026-08-18
        # on-chip A/B measured 23.42 img/s vs 23.57 with flax GN — the GN
        # reduces are not a measurable cost in the current program (PERF.md
        # "Round-3 negative results"). Params are identical either way.
        gn_cls = (
            MXUGroupNorm
            if os.environ.get("HTD_MXU_GN", "0") == "1"
            else nn.GroupNorm
        )
        self.reg_gns = [
            gn_cls(num_groups=c.gn_groups, epsilon=1e-5, dtype=self.dtype, name=f"reg_gn{i}")
            for i in range(c.num_reg_convs - 1)
        ]

    def _fcs(self, flat: Array) -> Array:
        return nn.relu(self.fcs2(nn.relu(self.fcs1(flat))))

    def __call__(
        self,
        x_cls: Array,                # (B, R, 7, 7, C)
        x_reg: Array,                # (B, P, 7, 7, C)
        rois: Array,                 # (B, R, 4)
        roi_valid: Array,            # (B, R) bool
        stage0_cls_kernel: Array,    # (F, C+1)
        stage0_cls_bias: Array,      # (C+1,)
        enhanced_feat: Array,        # (B, P, 7, 7, C) from AdptRoIExtractor
        global_feat: Optional[Array] = None,  # (B, Cg)
    ) -> Tuple[Array, Array]:
        """Returns cls_score (B, R, C+1) and bbox_pred (B, P, 4)."""
        c = self.cfg

        # ---------------- reg branch (BA) ----------------
        if global_feat is not None:
            x_reg = x_reg + global_feat[:, None, None, None, :].astype(x_reg.dtype)
        e, o = c.edge, c.roi_feat_size
        ys = jnp.arange(o)
        border1d = (ys < e) | (ys >= o - e)
        ring = (border1d[:, None] | border1d[None, :])[None, None, :, :, None]
        if c.replace_mode:
            # reference zeroes the border ring of the roi feature and keeps
            # only the extractor's enhanced border (htd_bbox_head.py:166-171)
            x_reg = x_reg * (~ring).astype(x_reg.dtype) + c.alpha * enhanced_feat
        elif c.average_mode:
            # row-border and col-border each contribute a 0.5 factor
            # (corners get 0.25), then the 4 exact corner pixels are doubled
            # (htd_bbox_head.py:172-181)
            fac = jnp.where(border1d[:, None], 0.5, 1.0) * jnp.where(
                border1d[None, :], 0.5, 1.0
            )
            extreme = (ys == 0) | (ys == o - 1)
            corner = extreme[:, None] & extreme[None, :]
            fac = jnp.where(corner, fac * 2.0, fac)
            x_reg = x_reg * fac[None, None, :, :, None].astype(x_reg.dtype)
            x_reg = x_reg + 0.5 * enhanced_feat
        else:
            x_reg = x_reg + c.alpha * enhanced_feat

        t = x_reg
        lead = t.shape[:-3]  # (B, P)
        # GroupNorm statistics are PER ROI (torch GN over (C/g, 7, 7) of each
        # sample); flax GroupNorm reduces over every non-leading axis, so the
        # roi axis must be folded into the batch axis first.
        t = t.reshape((-1,) + t.shape[-3:])
        for i, cv in enumerate(self.reg_convs):
            t = cv(t)
            if i < len(self.reg_gns):
                t = self.reg_gns[i](t)
            t = nn.relu(t)
        t = t.reshape(lead + t.shape[-3:])
        t = t.mean(axis=(-3, -2))  # 7x7 avg pool -> (B, P, 1024)
        bbox_pred = self.fc_reg(t)

        # ---------------- cls branch (PGraph) ----------------
        flat = x_cls.reshape(x_cls.shape[:-3] + (-1,))
        x_plain = self._fcs(flat)  # (B, R, F) — un-fused, used for SAM + mixing
        if global_feat is not None:
            fused = x_cls + global_feat[:, None, None, None, :].astype(x_cls.dtype)
            x_base = self._fcs(fused.reshape(fused.shape[:-3] + (-1,)))
        else:
            x_base = x_plain

        # reference (htd_bbox_head.py:158,194): the PROTOTYPE is detached,
        # but fc_cls_0(x_cls) is a live module call — gradients flow into
        # the stage-0 classifier (and x_cls) through the SAM projection
        k0 = stage0_cls_kernel.astype(x_plain.dtype)
        b0 = stage0_cls_bias.astype(x_plain.dtype)
        prototype = jax.lax.stop_gradient(
            jnp.concatenate([k0.T, b0[:, None]], axis=1)  # (C+1, F+1)
        )
        p = jax.nn.softmax(x_plain @ k0 + b0, axis=-1)  # (B, R, C+1)
        sam = p @ prototype  # (B, R, F+1)

        lvls = map_roi_levels(rois, self.num_levels)
        mixed = jax.vmap(_pgraph_single)(x_plain, sam, rois, lvls, roi_valid)

        # per-level GCN linear + ReLU, select each roi's level
        gcn = jnp.einsum(
            "brf,lfg->brlg", mixed, self.graph_kernel.astype(mixed.dtype)
        ) + self.graph_bias.astype(mixed.dtype)
        gcn = nn.relu(gcn)
        sel = jax.nn.one_hot(lvls, self.num_levels, dtype=gcn.dtype)  # (B, R, L)
        refined = jnp.einsum("brlg,brl->brg", gcn, sel)
        refined = refined * roi_valid[..., None].astype(refined.dtype)

        cls_score = self.fc_cls(x_base + refined)
        return cls_score, bbox_pred
