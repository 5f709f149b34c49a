"""RPN head + static-shape proposal generation.

Behavioral spec: reference rpn_head.py:23-43 (3x3 conv + 1x1 sigmoid cls +
1x1 reg) and rpn_head.py:78-168 (per-level pre-NMS top-k, delta decode
clipped to img_shape, level-aware batched NMS, nms_post cap).

TPU adaptations (result-preserving):
  * per-level top-k with scores of anchors outside the per-image pad region
    (ceil32 of the resized shape) masked to -inf — this makes a fixed
    (bucket-padded) input behave exactly like the reference's per-image
    padding;
  * fixed-capacity outputs: (nms_post, 4) proposals + validity mask.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from htd_tpu.config import ProposalConfig
from htd_tpu.ops.anchors import AnchorGenerator
from htd_tpu.ops.boxes import delta2bbox
from htd_tpu.ops.nms import batched_nms, NEG_INF

Array = jnp.ndarray


class RPNHead(nn.Module):
    """Shared conv tower applied to every FPN level."""

    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[Array]):
        if (
            jax.default_backend() != "cpu"
            and os.environ.get(
                "HTD_TAPDOT_RPN", os.environ.get("HTD_TAPDOT_CONV", "1")
            )
            == "1"
        ):
            # 9-shifted-flat-matmul schedule for the 3x3 conv: dodges the
            # EmitAllBatchInSublanes emitter that ran the P2 rpn_conv at
            # ~20% MXU efficiency in T(2,128) (see ops/conv3x3.py).
            # Default ON: on-chip A/B 2026-08-18 measured full R-50 42.28 ms
            # with FPN+RPN tap-dot vs 43.16 FPN-only / 43.49 RPN-only /
            # 44.13 neither. HTD_TAPDOT_CONV=0 reverts both sites.
            from htd_tpu.ops.conv3x3 import TapDotConv3x3

            conv = TapDotConv3x3(
                self.feat_channels, kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype, name="rpn_conv",
            )
        else:
            conv = nn.Conv(
                self.feat_channels, (3, 3), padding=((1, 1), (1, 1)),
                kernel_init=nn.initializers.normal(0.01), dtype=self.dtype,
                name="rpn_conv",
            )
        fused_1x1 = (
            jax.default_backend() != "cpu"
            and os.environ.get("HTD_RPN_FUSED_1X1", "1") == "1"
        )
        if fused_1x1:
            # ONE (C, A+4A) flat matmul for both 1x1 heads: as separate
            # narrow convs XLA fused each with its consumer (cls with the
            # top-k prep, reg with the box decode) and ran them as
            # lane-starved conv emitters (P2 reg fusion 0.62 ms, cls
            # 0.23 ms, xplane 2026-08-19); a (H*W, 256) @ (256, 15) dot
            # pays the 128-lane tile once for both. Params keep nn.Conv's
            # exact tree ((1,1,C,F) 'kernel' + 'bias' under rpn_cls /
            # rpn_reg), so checkpoints are unchanged. HTD_RPN_FUSED_1X1=0
            # reverts.
            ck, cb = _Conv1x1Params(
                self.num_anchors, self.feat_channels,
                kernel_init=nn.initializers.normal(0.01), name="rpn_cls",
            )()
            rk, rb = _Conv1x1Params(
                self.num_anchors * 4, self.feat_channels,
                kernel_init=nn.initializers.normal(0.01), name="rpn_reg",
            )()
            wk = jnp.concatenate([ck[0, 0], rk[0, 0]], axis=-1).astype(self.dtype)
            wb = jnp.concatenate([cb, rb]).astype(self.dtype)
        else:
            cls = nn.Conv(
                self.num_anchors, (1, 1),
                kernel_init=nn.initializers.normal(0.01), dtype=self.dtype, name="rpn_cls",
            )
            reg = nn.Conv(
                self.num_anchors * 4, (1, 1),
                kernel_init=nn.initializers.normal(0.01), dtype=self.dtype, name="rpn_reg",
            )
        fence = (
            jax.default_backend() != "cpu"
            and os.environ.get("HTD_RPN_FENCE", "0") == "1"
        )
        scores, deltas = [], []
        a = self.num_anchors
        for f in feats:
            if fence:
                # pin the shared FPN output row-major at the RPN boundary so
                # the tiny-channel cls/reg convs (A=3 / 12 outputs) cannot
                # flip the 256-ch rpn_conv into T(2,128) (xplane round-3b:
                # rpn_conv on P2 measured 2.2 ms fused in T(2,128))
                from htd_tpu.ops.fence import layout_fence

                f = layout_fence(f)
            t = nn.relu(conv(f))
            if fused_1x1:
                o = t.reshape(-1, self.feat_channels) @ wk + wb
                o = o.reshape(t.shape[:-1] + (a * 5,))
                scores.append(o[..., :a])
                deltas.append(o[..., a:])
            else:
                scores.append(cls(t))
                deltas.append(reg(t))
        return scores, deltas


class _Conv1x1Params(nn.Module):
    """Parameter-only twin of a 1x1 nn.Conv: declares the same 'kernel' /
    'bias' tree (so checkpoints round-trip) without choosing the compute
    schedule — RPNHead contracts both heads in one flat matmul."""

    features: int
    in_features: int
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", self.kernel_init,
            (1, 1, self.in_features, self.features), jnp.float32,
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return k, b


def gen_proposals_single(
    level_scores: Sequence[Array],   # (H_l, W_l, A) raw logits
    level_deltas: Sequence[Array],   # (H_l, W_l, A*4)
    level_anchors: Sequence[Array],  # (H_l*W_l*A, 4)
    generator: AnchorGenerator,
    img_shape: Array,                # (2,) resized (h, w) of this image
    cfg: ProposalConfig,
) -> Tuple[Array, Array, Array]:
    """Proposals for ONE image. Returns (boxes (P,4), scores (P,), valid (P,))
    with P = cfg.nms_post, score-ordered."""
    pad_shape = jnp.ceil(img_shape.astype(jnp.float32) / 32.0) * 32.0

    cand_scores, cand_boxes, cand_ids = [], [], []
    for lvl, (s, d, anchors) in enumerate(
        zip(level_scores, level_deltas, level_anchors)
    ):
        fh, fw = s.shape[0], s.shape[1]
        flat_s = s.reshape(-1).astype(jnp.float32)
        flat_d = d.reshape(-1, 4).astype(jnp.float32)
        prob = jax.nn.sigmoid(flat_s)
        # emulate the reference's per-image padding: anchors whose grid cell
        # lies beyond ceil32(img_shape) never existed there
        valid = generator.valid_flags_level(lvl, (fh, fw), pad_shape)
        prob = jnp.where(valid, prob, NEG_INF)

        k = min(cfg.nms_pre, int(prob.shape[0]))
        if os.environ.get("HTD_FLAT_TOPK", "0") == "1":
            # escape hatch: plain lax.top_k (A/B: tiled saved ~1.7 ms/img
            # on the P2 level's ~250k scores, round-3 on-chip matrix)
            top_s, top_i = jax.lax.top_k(prob, k)
        else:
            from htd_tpu.ops.topk import top_k_tiled

            top_s, top_i = top_k_tiled(prob, k)
        boxes = delta2bbox(anchors[top_i], flat_d[top_i], max_shape=img_shape)
        cand_scores.append(top_s)
        cand_boxes.append(boxes)
        cand_ids.append(jnp.full((k,), lvl, jnp.int32))

    scores = jnp.concatenate(cand_scores)
    boxes = jnp.concatenate(cand_boxes)
    ids = jnp.concatenate(cand_ids)

    if cfg.min_bbox_size > 0:
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        ok = (w >= cfg.min_bbox_size) & (h >= cfg.min_bbox_size)
        scores = jnp.where(ok, scores, NEG_INF)

    keep_idx, keep_score, keep_valid = batched_nms(
        boxes, scores, ids, cfg.nms_thr, cfg.nms_post
    )
    out_boxes = jnp.where(keep_valid[:, None], boxes[keep_idx], 0.0)
    out_scores = jnp.where(keep_valid, keep_score, 0.0)
    return out_boxes, out_scores, keep_valid


def gen_proposals(
    level_scores: Sequence[Array],   # (B, H_l, W_l, A) each
    level_deltas: Sequence[Array],
    generator: AnchorGenerator,
    img_shapes: Array,               # (B, 2)
    cfg: ProposalConfig,
) -> Tuple[Array, Array, Array]:
    """Batched proposal generation. Returns (B, P, 4), (B, P), (B, P)."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in level_scores]
    anchors = [
        generator.grid_anchors_level(i, fs) for i, fs in enumerate(featmap_sizes)
    ]

    def single(scores, deltas, shape):
        return gen_proposals_single(scores, deltas, anchors, generator, shape, cfg)

    return jax.vmap(single)(
        list(level_scores), list(level_deltas), img_shapes
    )
