"""The HTD detector: Faster R-CNN shell + two-stage heterogeneous RoI head.

Behavioral specs:
  * shell: reference two_stage.py (backbone -> FPN -> RPN -> RoI head);
  * RoI head orchestration: reference htd_roi_head.py —
      - simple_test (:319-386): SFA once, stage-0 Shared2FC on proposals,
        refine via argmax-FG label + class-agnostic decode, stage-1 HTD head,
        final score = mean of the two stages' logits, multiclass NMS;
      - forward_train (:217-317): per-stage assign/sample, SFA BCE loss,
        stage-0 losses, no-grad proposal refinement dropping gt-rois,
        stage-1 losses at weight 0.5.

TPU adaptations: everything batched (B, R, ...) with validity masks; the
reference's 2-images-per-GPU hardcode (htd_roi_head.py:158-182) is
generalized to any batch via the pos-first sample layout.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from htd_tpu.config import HTDConfig
from htd_tpu.models.resnet import ResNet
from htd_tpu.models.fpn import FPN
from htd_tpu.models.rpn import RPNHead, gen_proposals
from htd_tpu.models.heads import GlobalContextHead, HTDBBoxHead, Shared2FCBBoxHead
from htd_tpu.models.roi_extract import AdptRoIExtractor
from htd_tpu.ops.anchors import AnchorGenerator, anchor_inside_flags
from htd_tpu.ops.boxes import bbox2delta, delta2bbox
from htd_tpu.ops.nms import multiclass_nms
from htd_tpu.train import losses as L
from htd_tpu.train.sampling import assign_max_iou, sample_random

Array = jnp.ndarray


class Detections(NamedTuple):
    boxes: Array    # (B, max_per_img, 4) in original-image coords
    scores: Array   # (B, max_per_img)
    labels: Array   # (B, max_per_img) int32
    valid: Array    # (B, max_per_img) bool


class HTDDetector(nn.Module):
    cfg: HTDConfig

    def setup(self):
        c = self.cfg
        dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self.backbone = ResNet(
            depth=c.backbone.depth,
            groups=c.backbone.groups,
            base_width=c.backbone.base_width,
            out_indices=c.backbone.out_indices,
            stage_with_dcn=c.backbone.stage_with_dcn,
            deform_groups=c.backbone.dcn_deform_groups,
            base_planes=c.backbone.base_planes,
            dtype=dt,
            name="backbone",
        )
        self.neck = FPN(
            out_channels=c.fpn.out_channels, num_outs=c.fpn.num_outs,
            dtype=dt, name="neck",
        )
        self.anchor_gen = AnchorGenerator(
            strides=c.rpn.anchor.strides,
            ratios=c.rpn.anchor.ratios,
            scales=c.rpn.anchor.scales,
        )
        self.rpn_head = RPNHead(
            feat_channels=c.rpn.feat_channels,
            num_anchors=self.anchor_gen.num_base_anchors,
            dtype=dt,
            name="rpn_head",
        )
        if c.with_global:
            self.glbctx_head = GlobalContextHead(
                c.global_ctx, num_classes_p1=c.num_classes + 1, dtype=dt,
                name="glbctx_head",
            )
        self.stage0_head = Shared2FCBBoxHead(
            num_classes=c.num_classes,
            fc_out=c.stage0_head.fc_out_channels,
            dtype=dt,
            name="stage0_head",
        )
        self.adpt_extractor = AdptRoIExtractor(
            c.roi_extractor, dtype=dt, name="adpt_extractor"
        )
        self.stage1_head = HTDBBoxHead(
            c.stage1_head,
            num_levels=len(c.roi_extractor.featmap_strides),
            dtype=dt,
            name="stage1_head",
        )

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------

    def extract_feats(self, images: Array) -> Tuple[Array, ...]:
        """(B, H, W, 3) normalized images -> 5 FPN levels (NHWC)."""
        return self.neck(self.backbone(images))

    def _roi_feats(self, feats4, rois: Array) -> Array:
        """(B, R, 4) rois -> (B, R, 7, 7, C) level-mapped aligned features."""
        from htd_tpu.models.roi_extract import single_roi_extract_batched

        return single_roi_extract_batched(
            list(feats4), rois, self.cfg.roi_extractor
        )

    def _global(self, feats) -> Tuple[Optional[Array], Optional[Array]]:
        if not self.cfg.with_global:
            return None, None
        logits, feat = self.glbctx_head(feats[-1])
        return logits, feat

    def loss_keys(self) -> Tuple[str, ...]:
        """Static key set of the `forward_train` loss dict (config-determined;
        lets callers pack/log losses without an abstract trace)."""
        keys = ["loss_rpn_cls", "loss_rpn_bbox"]
        if self.cfg.with_global:
            keys.append("loss_global")
        for s in ("s0", "s1"):
            keys += [f"{s}.loss_cls", f"{s}.loss_bbox", f"{s}.acc"]
        return tuple(keys)

    def _stage0(self, feats4, rois, global_feat):
        roi_feats = self._roi_feats(feats4, rois)
        if global_feat is not None:
            roi_feats = roi_feats + global_feat[:, None, None, None, :].astype(
                roi_feats.dtype
            )
        cls, reg = self.stage0_head(roi_feats)
        return cls.astype(jnp.float32), reg.astype(jnp.float32)

    def _refine(self, rois, cls_score, bbox_pred, img_shapes):
        """Class-agnostic refinement of rois by stage-0 regression."""
        del cls_score  # agnostic decode; labels only matter for per-class reg
        c = self.cfg.stage0_head.coder

        def one(r, d, shape):
            return delta2bbox(r, d, c.means, c.stds, max_shape=shape)

        return jax.vmap(one)(rois, bbox_pred, img_shapes)

    def _stage1(self, feats4, rois, roi_valid, pos_rois, x_reg_feats, global_feat):
        """Run the heterogeneous head.

        x_reg_feats: (B, P, 7, 7, C) single-extracted features of `pos_rois`
        (at test P == R and pos_rois == rois).
        """
        x_cls = self._roi_feats(feats4, rois)
        # the BA extractor reuses each pos-roi's already-extracted mapped
        # -level features (exact adaptive grid) for its own-level row; only
        # off-target levels are sampled, at the cheaper adpt_max_samples
        from htd_tpu.ops.boxes import map_roi_levels

        tgt_feats = x_reg_feats if x_reg_feats is not None else x_cls
        tgt_lvls = map_roi_levels(
            pos_rois, len(self.cfg.roi_extractor.featmap_strides),
            self.cfg.roi_extractor.finest_scale,
        )
        enhanced = self.adpt_extractor(feats4, pos_rois, tgt_feats, tgt_lvls)
        k0, b0 = self.stage0_head.cls_params()
        cls, reg = self.stage1_head(
            x_cls,
            x_reg_feats if x_reg_feats is not None else x_cls,
            rois,
            roi_valid,
            k0,
            b0,
            enhanced,
            global_feat,
        )
        return cls.astype(jnp.float32), reg.astype(jnp.float32), x_cls

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def __call__(self, images, img_shapes, scale_factors):
        return self.simple_test(images, img_shapes, scale_factors)

    def simple_test(
        self,
        images: Array,         # (B, H, W, 3) normalized, bucket-padded
        img_shapes: Array,     # (B, 2) resized (h, w) per image
        scale_factors: Array,  # (B, 4) (w, h, w, h) resize factors
    ) -> Detections:
        c = self.cfg
        feats = self.extract_feats(images)
        feats4 = feats[: len(c.roi_extractor.featmap_strides)]
        rpn_scores, rpn_deltas = self.rpn_head(feats)
        props, prop_scores, prop_valid = gen_proposals(
            rpn_scores, rpn_deltas, self.anchor_gen, img_shapes, c.proposal_test
        )
        _, global_feat = self._global(feats)

        # stage 0 + refinement
        s0_cls, s0_reg = self._stage0(feats4, props, global_feat)
        rois1 = self._refine(props, s0_cls, s0_reg, img_shapes)

        # stage 1 (all rois through both branches at test)
        s1_cls, s1_reg, _ = self._stage1(
            feats4, rois1, prop_valid, rois1, None, global_feat
        )
        cls_score = (s0_cls + s1_cls) / 2.0

        # decode + rescale + multiclass NMS per image
        coder = c.stage1_head.coder
        probs = jax.nn.softmax(cls_score, axis=-1)
        probs = jnp.where(prop_valid[..., None], probs, 0.0)

        def post_one(rois_i, deltas_i, probs_i, shape_i, sf_i):
            boxes = delta2bbox(
                rois_i, deltas_i, coder.means, coder.stds, max_shape=shape_i
            )
            boxes = boxes / sf_i  # rescale to original image
            return multiclass_nms(
                boxes,
                probs_i,
                c.rcnn_test.score_thr,
                c.rcnn_test.nms_iou,
                c.rcnn_test.max_per_img,
                use_soft_nms=c.rcnn_test.use_soft_nms,
                soft_min_score=c.rcnn_test.soft_min_score,
            )

        db, ds, dl, dv = jax.vmap(post_one)(
            rois1, s1_reg, probs, img_shapes, scale_factors
        )
        return Detections(db, ds, dl, dv)

    def profile_prefix(self, images, img_shapes, scale_factors, upto):
        """Scalar-summarized pipeline prefix, for stage-budget timing
        (tools/bench_stages.py). `upto` is a trace-time string."""
        c = self.cfg
        if upto == "full":
            dets = self.simple_test(images, img_shapes, scale_factors)
            return (
                jnp.sum(dets.scores)
                + jnp.sum(dets.boxes) * 1e-6
                + jnp.sum(dets.labels).astype(jnp.float32) * 1e-6
            )
        feats = self.extract_feats(images)
        if upto == "backbone_fpn":
            return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
        if upto.startswith("extract_part_"):
            # bisect the extraction internals in-model: pyramid concat,
            # raw v3 kernel (no fallback), fallback gather only
            from htd_tpu.ops import roi_align_pallas as rap
            from htd_tpu.ops.boxes import map_roi_levels as _mrl

            feats4 = [f[0] for f in feats[: len(c.roi_extractor.featmap_strides)]]
            t = jnp.arange(1000, dtype=jnp.float32)
            x1 = (t * 37.0) % 1200.0
            y1 = (t * 17.0) % 600.0
            size = 16.0 + (t * 13.0) % 120.0
            synth = jnp.stack([x1, y1, x1 + size, y1 + size], axis=1)
            synth = synth + jnp.sum(images[:, :1, :1]) * 1e-12
            lvls = _mrl(synth, len(c.roi_extractor.featmap_strides),
                        c.roi_extractor.finest_scale)
            strides = c.roi_extractor.featmap_strides
            if upto == "extract_part_pyr":
                g = rap.V3_GEOM
                pyr, _, _, _, _ = rap._build_pyramid(
                    feats4, g["n_y"] * g["y_block"], g["n_x"] * g["x_block"],
                    g["x_block"], g["y_block"],
                )
                return jnp.sum(pyr.astype(jnp.float32)) * 1e-6
            if upto == "extract_part_kernel":
                out = rap.roi_align_pallas_v3(
                    feats4, synth, strides, lvls, 7, 0,
                    c.roi_extractor.max_samples, **rap.V3_GEOM,
                )
                return jnp.sum(out.astype(jnp.float32)) * 1e-6
            if upto == "extract_part_kernel_nosort":
                out = rap.roi_align_pallas_v3(
                    feats4, synth, strides, lvls, 7, 0,
                    c.roi_extractor.max_samples, sort_rois=False,
                    **rap.V3_GEOM,
                )
                return jnp.sum(out.astype(jnp.float32)) * 1e-6
            if upto == "extract_part_fallback":
                from htd_tpu.ops.roi_align import roi_align_pyramid

                idx = jnp.arange(rap.FALLBACK_CAP)
                out = roi_align_pyramid(
                    feats4, synth[idx], strides, lvls[idx], 7, 0,
                    c.roi_extractor.max_samples,
                )
                return jnp.sum(out.astype(jnp.float32)) * 1e-6
            if upto == "extract_part_v4pyrT":
                max_w = max(int(f.shape[-2]) for f in feats4)
                wpt = ((max_w - 1) // rap.V4_X_BLOCK + 2) * rap.V4_X_BLOCK
                pyr, *_ = rap._build_pyramid(
                    feats4, rap.V4_RES_H, wpt - rap.V4_X_BLOCK,
                    rap.V4_X_BLOCK, rap.V4_Y_STRIPE,
                )
                return jnp.sum(
                    jnp.swapaxes(pyr, 0, 1).astype(jnp.float32)) * 1e-6
            if upto == "extract_part_v4kernel":
                out, _ = rap.roi_align_pallas_v4(
                    feats4, synth, strides, lvls, 7, 0,
                    c.roi_extractor.max_samples,
                )
                return jnp.sum(out.astype(jnp.float32)) * 1e-6
            if upto == "extract_part_v4full":
                out = rap.roi_align_fused_batched(
                    [f[None] for f in feats4], synth[None], strides,
                    lvls[None], 7, 0, c.roi_extractor.max_samples,
                )
                return jnp.sum(out.astype(jnp.float32)) * 1e-6
            raise ValueError(upto)
        if upto == "backbone_extract":
            # backbone -> extract on synthetic rois, NO RPN/NMS/SFA in the
            # program: bisects whether the surrounding graph (not the roi
            # values) slows the extraction
            feats4 = feats[: len(c.roi_extractor.featmap_strides)]
            bsz = images.shape[0]
            t = jnp.arange(1000, dtype=jnp.float32)
            x1 = (t * 37.0) % 1200.0
            y1 = (t * 17.0) % 600.0
            size = 16.0 + (t * 13.0) % 120.0
            synth = jnp.stack([x1, y1, x1 + size, y1 + size], axis=1)
            synth = jnp.broadcast_to(synth, (bsz, 1000, 4))
            synth = synth + jnp.sum(images[:, :1, :1]) * 1e-12
            rf = self._roi_feats(feats4, synth)
            return jnp.sum(rf.astype(jnp.float32)) * 1e-6
        feats4 = feats[: len(c.roi_extractor.featmap_strides)]
        rpn_scores, rpn_deltas = self.rpn_head(feats)
        props, prop_scores, prop_valid = gen_proposals(
            rpn_scores, rpn_deltas, self.anchor_gen, img_shapes, c.proposal_test
        )
        if upto == "rpn_proposals":
            return jnp.sum(props) * 1e-6 + jnp.sum(prop_scores)
        _, global_feat = self._global(feats)
        if upto == "stage0_extract":
            rf = self._roi_feats(feats4, props)
            return jnp.sum(rf.astype(jnp.float32)) * 1e-6
        if upto == "stage0_extract_synth":
            # same extract on synthetic static rois — separates roi-value
            # effects (NMS output distribution, padded rois) from context
            # effects (feature layouts, scheduling)
            r = props.shape[1]
            t = jnp.arange(r, dtype=jnp.float32)
            x1 = (t * 37.0) % 1200.0
            y1 = (t * 17.0) % 600.0
            size = 16.0 + (t * 13.0) % 120.0
            synth = jnp.stack([x1, y1, x1 + size, y1 + size], axis=1)
            synth = jnp.broadcast_to(synth, (props.shape[0], r, 4))
            synth = synth + props[..., :1] * 1e-9  # defeat CSE/constant folding
            rf = self._roi_feats(feats4, synth)
            return jnp.sum(rf.astype(jnp.float32)) * 1e-6
        s0_cls, s0_reg = self._stage0(feats4, props, global_feat)
        if upto == "stage0":
            return jnp.sum(s0_cls) * 1e-6 + jnp.sum(s0_reg) * 1e-6
        rois1 = self._refine(props, s0_cls, s0_reg, img_shapes)
        if upto == "stage1_extract":
            # stage-1 single extraction only (x_cls; BA/head excluded)
            rf = self._roi_feats(feats4, rois1)
            return jnp.sum(rf.astype(jnp.float32)) * 1e-6
        if upto == "stage1_ba":
            # stage-1 extraction + BA all-level enhanced features
            from htd_tpu.ops.boxes import map_roi_levels as _mrl2

            x_cls = self._roi_feats(feats4, rois1)
            tgt_lvls = _mrl2(
                rois1, len(c.roi_extractor.featmap_strides),
                c.roi_extractor.finest_scale,
            )
            enhanced = self.adpt_extractor(feats4, rois1, x_cls, tgt_lvls)
            return (
                jnp.sum(x_cls.astype(jnp.float32)) * 1e-6
                + jnp.sum(enhanced.astype(jnp.float32)) * 1e-6
            )
        s1_cls, s1_reg, _ = self._stage1(
            feats4, rois1, prop_valid, rois1, None, global_feat
        )
        assert upto == "stage1", f"unknown profile prefix {upto!r}"
        return jnp.sum(s1_cls) * 1e-6 + jnp.sum(s1_reg) * 1e-6

    # ------------------------------------------------------------------
    # TTA pieces (reference aug_test, htd_roi_head.py:388-441)
    # ------------------------------------------------------------------

    def rpn_proposals(self, images: Array, img_shapes: Array):
        """Proposals in the (augmented) input frame: (B,P,4), (B,P), (B,P)."""
        feats = self.extract_feats(images)
        rpn_scores, rpn_deltas = self.rpn_head(feats)
        return gen_proposals(
            rpn_scores, rpn_deltas, self.anchor_gen, img_shapes,
            self.cfg.proposal_test,
        )

    def stages_forward(
        self, images: Array, img_shapes: Array, rois: Array, roi_valid: Array
    ):
        """Both cascade stages on externally-given proposals.

        Returns (decoded boxes (B,P,4) clipped to the aug frame,
        softmax scores (B,P,C+1) averaged over the two stages)."""
        c = self.cfg
        feats = self.extract_feats(images)
        feats4 = feats[: len(c.roi_extractor.featmap_strides)]
        _, global_feat = self._global(feats)
        s0_cls, s0_reg = self._stage0(feats4, rois, global_feat)
        rois1 = self._refine(rois, s0_cls, s0_reg, img_shapes)
        s1_cls, s1_reg, _ = self._stage1(
            feats4, rois1, roi_valid, rois1, None, global_feat
        )
        cls_score = (s0_cls + s1_cls) / 2.0
        coder = c.stage1_head.coder

        def decode_one(r, d, shape):
            return delta2bbox(r, d, coder.means, coder.stds, max_shape=shape)

        boxes = jax.vmap(decode_one)(rois1, s1_reg, img_shapes)
        scores = jax.nn.softmax(cls_score, axis=-1)
        scores = jnp.where(roi_valid[..., None], scores, 0.0)
        return boxes, scores

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def forward_train(
        self,
        images: Array,       # (B, H, W, 3)
        img_shapes: Array,   # (B, 2)
        gt_boxes: Array,     # (B, G, 4) padded
        gt_labels: Array,    # (B, G) int32
        gt_valid: Array,     # (B, G) bool
        overrides: Optional[Dict[str, Array]] = None,
    ) -> Dict[str, Array]:
        """Training losses (reference two_stage.py:107-170 +
        htd_roi_head.py:217-317 orchestration).

        `overrides` is the torch-oracle parity hook (VERDICT r03 item 2):
        a dict that may inject "proposals"/"proposal_valid" (skipping
        gen_proposals), "rpn_keep_pos"/"rpn_keep_neg"/"rpn_matched_gt"
        (B, A) (skipping RPN assign/sample), and for s in {s0, s1}
        "{s}_idx"/"{s}_valid"/"{s}_is_pos"/"{s}_is_gt"/"{s}_gt_inds"
        (B, num) sampled-roi injections (skipping the stage's
        assign/sample; indices address concat([gt, candidates])). This
        makes both implementations consume IDENTICAL sampled sets so loss
        terms and gradients are directly comparable.
        """
        c = self.cfg
        tc = c.train
        ov = overrides or {}
        key = self.make_rng("sampling")
        b = images.shape[0]
        losses: Dict[str, Array] = {}

        feats = self.extract_feats(images)
        feats4 = feats[: len(c.roi_extractor.featmap_strides)]
        rpn_scores, rpn_deltas = self.rpn_head(feats)

        # ---- RPN losses
        k_rpn, k_s0, k_s1 = jax.random.split(key, 3)
        rpn_inj = None
        if "rpn_keep_pos" in ov:
            rpn_inj = (
                ov["rpn_keep_pos"], ov["rpn_keep_neg"], ov["rpn_matched_gt"]
            )
        rpn_cls_loss, rpn_bbox_loss = self._rpn_loss(
            rpn_scores, rpn_deltas, img_shapes, gt_boxes, gt_valid, k_rpn,
            inj=rpn_inj,
        )
        losses["loss_rpn_cls"] = rpn_cls_loss
        losses["loss_rpn_bbox"] = rpn_bbox_loss

        # ---- proposals (no grad into RPN through boxes)
        if "proposals" in ov:
            props, prop_valid = ov["proposals"], ov["proposal_valid"]
        else:
            props, prop_scores, prop_valid = gen_proposals(
                [jax.lax.stop_gradient(s) for s in rpn_scores],
                [jax.lax.stop_gradient(d) for d in rpn_deltas],
                self.anchor_gen,
                img_shapes,
                tc.rpn_proposal,
            )

        # ---- SFA / global context
        glb_logits, global_feat = self._global(feats)
        if glb_logits is not None:
            onehot = jax.nn.one_hot(gt_labels, c.num_classes + 1)
            onehot = onehot * gt_valid[..., None]
            targets = (jnp.sum(onehot, axis=1) > 0).astype(jnp.float32)
            losses["loss_global"] = L.multilabel_bce(
                glb_logits, targets, c.global_ctx.loss_weight
            )

        # ---- stage 0
        s0_train = c.train.rcnn[0]
        if "s0_idx" in ov:
            samp0 = self._injected_sample(ov, "s0", props, gt_boxes, gt_labels)
        else:
            keys0 = jax.random.split(k_s0, b)
            samp0 = jax.vmap(
                lambda kk, pb, pv, gb, gv, gl: sample_random(
                    kk, pb, pv, gb, gv, gl,
                    s0_train.assigner, s0_train.sampler, tc.rcnn_pos_cap,
                    c.num_classes,
                )
            )(keys0, props, prop_valid, gt_boxes, gt_valid, gt_labels)

        s0_cls, s0_reg = self._stage0(feats4, samp0.rois, global_feat)
        lw0 = tc.stage_loss_weights[0]
        l_cls0, l_bbox0, acc0 = self._bbox_head_loss(
            s0_cls, s0_reg, samp0, c.stage0_head.coder, c.stage0_head.loss_bbox_beta
        )
        losses["s0.loss_cls"] = l_cls0 * lw0
        losses["s0.loss_bbox"] = l_bbox0 * lw0
        losses["s0.acc"] = acc0

        # ---- refine proposals for stage 1 (no grad, gt rows dropped)
        roi_labels = jnp.where(
            samp0.labels == c.num_classes,
            jnp.argmax(s0_cls[..., :-1], axis=-1).astype(jnp.int32),
            samp0.labels,
        )
        del roi_labels  # class-agnostic regression: labels don't alter decode
        refined = jax.lax.stop_gradient(
            self._refine(samp0.rois, s0_cls, s0_reg, img_shapes)
        )
        refined_valid = samp0.valid & (~samp0.is_gt)

        # ---- stage 1
        s1_train = c.train.rcnn[1]
        if "s1_idx" in ov:
            samp1 = self._injected_sample(ov, "s1", refined, gt_boxes, gt_labels)
        else:
            keys1 = jax.random.split(k_s1, b)
            samp1 = jax.vmap(
                lambda kk, pb, pv, gb, gv, gl: sample_random(
                    kk, pb, pv, gb, gv, gl,
                    s1_train.assigner, s1_train.sampler, tc.rcnn_pos_cap,
                    c.num_classes,
                )
            )(keys1, refined, refined_valid, gt_boxes, gt_valid, gt_labels)

        pos_cap = tc.rcnn_pos_cap
        pos_rois = samp1.rois[:, :pos_cap]
        x_cls1 = self._roi_feats(feats4, samp1.rois)
        x_reg1 = x_cls1[:, :pos_cap]
        enhanced = self.adpt_extractor(feats4, pos_rois)
        k0, b0 = self.stage0_head.cls_params()
        s1_cls, s1_reg_pos = self.stage1_head(
            x_cls1,
            x_reg1,
            samp1.rois,
            samp1.valid,
            k0,
            b0,
            enhanced,
            global_feat,
        )
        s1_cls = s1_cls.astype(jnp.float32)
        # scatter positive-block predictions into the full roi block
        num = s1_train.sampler.num
        s1_reg = jnp.zeros((b, num, 4), jnp.float32)
        s1_reg = s1_reg.at[:, :pos_cap].set(s1_reg_pos.astype(jnp.float32))

        lw1 = tc.stage_loss_weights[1]
        l_cls1, l_bbox1, acc1 = self._bbox_head_loss(
            s1_cls, s1_reg, samp1, c.stage1_head.coder, c.stage1_head.loss_bbox_beta
        )
        losses["s1.loss_cls"] = l_cls1 * lw1
        losses["s1.loss_bbox"] = l_bbox1 * lw1
        losses["s1.acc"] = acc1
        return losses

    # ------------------------------------------------------------------

    def _injected_sample(self, ov, s, candidates, gt_boxes, gt_labels):
        """Batched sample_from_injection over the ov[f"{s}_*"] arrays."""
        from htd_tpu.train.sampling import sample_from_injection

        cand = jnp.concatenate([gt_boxes, candidates], axis=1)
        return jax.vmap(
            lambda cb, gb, gl, idx, v, ip, ig, gi: sample_from_injection(
                cb, gb, gl, idx, v, ip, ig, gi, self.cfg.num_classes
            )
        )(
            cand, gt_boxes, gt_labels,
            ov[f"{s}_idx"], ov[f"{s}_valid"], ov[f"{s}_is_pos"],
            ov[f"{s}_is_gt"], ov[f"{s}_gt_inds"],
        )

    def _rpn_loss(self, level_scores, level_deltas, img_shapes, gt_boxes,
                  gt_valid, key, inj=None):
        """Assign/sample anchors and compute RPN losses (flat over levels).

        Behavioral spec: anchor_head.py:142-418 + rpn allowed_border=0.
        `inj` optionally injects (keep_pos, keep_neg, matched_gt) (B, A)
        arrays in place of assign/sample (torch-oracle parity hook).
        """
        c = self.cfg
        tc = c.train
        featmap_sizes = [tuple(s.shape[1:3]) for s in level_scores]
        anchors = jnp.concatenate(
            [
                self.anchor_gen.grid_anchors_level(i, fs)
                for i, fs in enumerate(featmap_sizes)
            ],
            axis=0,
        )
        b = level_scores[0].shape[0]
        flat_scores = jnp.concatenate(
            [s.reshape(b, -1) for s in level_scores], axis=1
        ).astype(jnp.float32)
        flat_deltas = jnp.concatenate(
            [d.reshape(b, -1, 4) for d in level_deltas], axis=1
        ).astype(jnp.float32)

        pos_cap = int(tc.rpn_sampler.num * tc.rpn_sampler.pos_fraction)

        def one(kk, shape, gb, gv):
            pad_shape = jnp.ceil(shape.astype(jnp.float32) / 32.0) * 32.0
            vf = jnp.concatenate(
                [
                    self.anchor_gen.valid_flags_level(i, fs, pad_shape)
                    for i, fs in enumerate(featmap_sizes)
                ]
            )
            inside = anchor_inside_flags(anchors, vf, shape, tc.rpn_allowed_border)
            ar = assign_max_iou(
                anchors, inside, gb, gv, jnp.zeros_like(gv, jnp.int32),
                tc.rpn_assigner,
            )
            k1, k2 = jax.random.split(kk)
            pos_mask = ar.gt_inds > 0
            neg_mask = ar.gt_inds == 0
            pos_key = jnp.where(
                pos_mask, jax.random.uniform(k1, pos_mask.shape), -1.0
            )
            neg_key = jnp.where(
                neg_mask, jax.random.uniform(k2, neg_mask.shape), -1.0
            )
            top_pos, pos_idx = jax.lax.top_k(pos_key, pos_cap)
            npos = jnp.sum(top_pos >= 0)
            n_neg_needed = tc.rpn_sampler.num - npos
            top_neg, neg_idx = jax.lax.top_k(neg_key, tc.rpn_sampler.num)
            rank = jnp.arange(tc.rpn_sampler.num)
            neg_keep_sel = (rank < n_neg_needed) & (top_neg >= 0)

            keep_pos = jnp.zeros(anchors.shape[0], bool).at[pos_idx].set(top_pos >= 0)
            keep_neg = jnp.zeros(anchors.shape[0], bool).at[neg_idx].set(neg_keep_sel)

            matched_gt = jnp.maximum(ar.gt_inds - 1, 0)
            cls_t = keep_pos.astype(jnp.float32)
            cls_w = (keep_pos | keep_neg).astype(jnp.float32)
            # COMPACT box targets: only the <=pos_cap kept positives carry
            # box-loss weight, so encode targets at those indices alone
            # instead of materializing (A, 4) full-anchor gathers + deltas
            # (fusion profile: 3.1 ms/step of gather over 258k anchors x B
            # for <=128 used rows). Loss value is identical: zero-weight
            # rows contributed nothing.
            pos_anchors = anchors[pos_idx]
            pos_gt = gb[matched_gt[pos_idx]]
            pos_w = (top_pos >= 0) & (ar.gt_inds[pos_idx] > 0)
            safe_gt = jnp.where(pos_w[:, None], pos_gt, pos_anchors)
            tgt = bbox2delta(
                pos_anchors, safe_gt, c.rpn.coder.means, c.rpn.coder.stds
            )
            return cls_t, cls_w, tgt, pos_w.astype(jnp.float32), pos_idx

        if inj is not None:
            keep_pos, keep_neg, matched_gt = inj

            def one_inj(kp, kn, mg, gb):
                gt_for_anchor = jnp.where(kp[:, None], gb[mg], anchors)
                tgt = bbox2delta(
                    anchors, gt_for_anchor, c.rpn.coder.means, c.rpn.coder.stds
                )
                return (
                    kp.astype(jnp.float32),
                    (kp | kn).astype(jnp.float32),
                    tgt,
                    kp.astype(jnp.float32),
                )

            cls_t, cls_w, box_t, box_w = jax.vmap(one_inj)(
                keep_pos, keep_neg, matched_gt, gt_boxes
            )
            num_total = jnp.sum(cls_w)
            loss_cls = L.sigmoid_bce(flat_scores, cls_t, cls_w, num_total)
            loss_bbox = L.smooth_l1_loss(
                flat_deltas, box_t, box_w[..., None],
                c.rpn.loss_bbox_beta, num_total,
            )
            return loss_cls, loss_bbox

        keys = jax.random.split(key, b)
        cls_t, cls_w, box_t, box_w, pos_idx = jax.vmap(one)(
            keys, img_shapes, gt_boxes, gt_valid
        )
        num_total = jnp.sum(cls_w)
        loss_cls = L.sigmoid_bce(flat_scores, cls_t, cls_w, num_total)
        deltas_pos = jnp.take_along_axis(
            flat_deltas, pos_idx[..., None], axis=1
        )
        loss_bbox = L.smooth_l1_loss(
            deltas_pos, box_t, box_w[..., None], c.rpn.loss_bbox_beta, num_total
        )
        return loss_cls, loss_bbox

    def _bbox_head_loss(self, cls_score, bbox_pred, samp, coder, beta):
        """Softmax CE over all sampled rois + smooth-L1 on positives.

        Behavioral spec: bbox_head.py:141-186 averaging rules.
        """
        labels = samp.labels
        label_w = samp.valid.astype(jnp.float32)
        avg_cls = jnp.sum(label_w)
        l_cls = L.softmax_ce(cls_score, labels, label_w, avg_cls)

        # NaN-safe: non-positive slots encode a unit box against itself
        unit = jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32)
        pos3 = samp.is_pos[..., None]
        safe_rois = jnp.where(pos3, samp.rois, unit)
        safe_gt = jnp.where(pos3, samp.pos_gt_boxes, unit)
        tgt = bbox2delta(safe_rois, safe_gt, coder.means, coder.stds)
        box_w = samp.is_pos.astype(jnp.float32)[..., None]
        avg_box = jnp.sum(label_w)  # total sampled rois (reference semantics)
        l_bbox = L.smooth_l1_loss(bbox_pred, tgt, box_w, beta, avg_box)
        acc = L.accuracy(cls_score, labels, label_w)
        return l_cls, l_bbox, acc
