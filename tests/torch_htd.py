"""Pure-torch mirror of the FULL reference HTD forward, with real mmdet
state-dict names.

Behavioral spec transcribed from the reference (not from htd_tpu):
  * htd_roi_head.py:133-201 (_fuse_global/_bbox_forward), :319-386 (simple_test)
  * htd_bbox_head.py:34-230 (HTDBBoxHead layers + forward)
  * global_context_head.py:323-401 (live GlobalContextHead)
  * adaptative_roi_extractor.py:25-91 (AdptRoIExtractor)
  * rpn_head.py:23-43 (layers), :78-168 (proposal generation)
  * bbox_head.py:188-225 (get_bboxes), :306-335 (regress_by_class)
  * convfc_bbox_head.py:135-191 (Shared2FCBBoxHead)
  * single_level_roi_extractor.py:32-98 (SingleRoIExtractor)
  * delta_xywh_bbox_coder.py:123-200 (delta2bbox)
  * core/post_processing/bbox_nms.py:7-71 (multiclass_nms)
  * mmcv-full 1.2.1 deform_conv im2col (bilinear w/ per-corner bounds,
    offset channel layout [dg][tap][(y, x)])

This file is a TEST ORACLE: `TorchHTDDetector.state_dict()` produces the
exact key names an mmdet FasterRCNN(HTDRoIHead) checkpoint has, so running
it through `convert_mmdet_state_dict` and comparing forwards proves the
converter mapping AND the composed htd_tpu forward end-to-end.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.oracles import np_base_anchors, np_greedy_nms, np_roi_align_fast

BLOCKS = {10: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------


def delta2bbox_t(rois, deltas, means=(0., 0., 0., 0.), stds=(1., 1., 1., 1.),
                 max_shape=None, wh_ratio_clip=16 / 1000):
    """delta_xywh_bbox_coder.py:123-200 (class-agnostic 4-col case)."""
    means = rois.new_tensor(means)
    stds = rois.new_tensor(stds)
    denorm = deltas * stds + means
    dx, dy, dw, dh = denorm.unbind(-1)
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = dw.clamp(-max_ratio, max_ratio)
    dh = dh.clamp(-max_ratio, max_ratio)
    px = (rois[:, 0] + rois[:, 2]) * 0.5
    py = (rois[:, 1] + rois[:, 3]) * 0.5
    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    gx = px + pw * dx
    gy = py + ph * dy
    x1, y1 = gx - gw * 0.5, gy - gh * 0.5
    x2, y2 = gx + gw * 0.5, gy + gh * 0.5
    if max_shape is not None:
        x1 = x1.clamp(0, max_shape[1])
        y1 = y1.clamp(0, max_shape[0])
        x2 = x2.clamp(0, max_shape[1])
        y2 = y2.clamp(0, max_shape[0])
    return torch.stack([x1, y1, x2, y2], dim=-1)


def nms_t(boxes, scores, iou_thr):
    keep = np_greedy_nms(boxes.numpy().astype(np.float64),
                         scores.numpy().astype(np.float64), iou_thr)
    return torch.from_numpy(keep)


def batched_nms_t(boxes, scores, idxs, iou_thr):
    """mmcv batched_nms: class/level-offset trick, keep sorted by score."""
    if boxes.numel() == 0:
        return boxes.new_zeros((0, 5)), torch.zeros(0, dtype=torch.long)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + 1)
    keep = nms_t(boxes + offsets[:, None], scores, iou_thr)
    dets = torch.cat([boxes[keep], scores[keep, None]], dim=1)
    return dets, keep


def multiclass_nms_t(multi_bboxes, multi_scores, score_thr, iou_thr, max_num):
    """core/post_processing/bbox_nms.py:7-71 (hard-NMS branch)."""
    num_classes = multi_scores.size(1) - 1
    if multi_bboxes.shape[1] > 4:
        bboxes = multi_bboxes.view(multi_scores.size(0), -1, 4)
    else:
        bboxes = multi_bboxes[:, None].expand(
            multi_scores.size(0), num_classes, 4)
    scores = multi_scores[:, :-1]
    valid_mask = scores > score_thr
    bboxes = bboxes[valid_mask]
    scores = scores[valid_mask]
    labels = valid_mask.nonzero(as_tuple=False)[:, 1]
    if bboxes.numel() == 0:
        return bboxes.new_zeros((0, 5)), labels.new_zeros((0,))
    dets, keep = batched_nms_t(bboxes, scores, labels, iou_thr)
    if max_num > 0:
        dets = dets[:max_num]
        keep = keep[:max_num]
    return dets, labels[keep]


# When True, roi_align_t routes through the differentiable torch
# implementation so autograd reaches backbone/FPN features THROUGH roi
# features (full-tree train gradient parity). Default False: the detached
# numpy oracle is faster for the big e2e inference parity suites, whose
# only need is forward values.
GRAD_ROI_ALIGN = False


def roi_align_t(feat_nchw, rois, spatial_scale, out_size=7, sampling_ratio=0):
    """mmcv aligned RoIAlign via the independent numpy loop oracle.

    feat (1, C, H, W) single image; rois (R, 4) in image coords.
    """
    if GRAD_ROI_ALIGN:
        return roi_align_torch(feat_nchw, rois, spatial_scale, out_size,
                               sampling_ratio)
    # NOTE: detach cuts autograd INTO the aligned features. Downstream
    # grads (roi-head fcs/convs, and the RPN path which never crosses
    # RoIAlign) stay exact; only backbone/FPN grads THROUGH roi features
    # are unavailable from this oracle (use GRAD_ROI_ALIGN for those).
    feat = feat_nchw[0].detach().permute(1, 2, 0).numpy().astype(np.float64)
    out = np_roi_align_fast(feat, rois.numpy().astype(np.float64),
                       spatial_scale, out_size, sampling_ratio)
    return torch.from_numpy(out).permute(0, 3, 1, 2).float()


def roi_align_torch(feat_nchw, rois, spatial_scale, out_size=7,
                    sampling_ratio=0):
    """Differentiable torch transcription of np_roi_align_fast (same
    separable-bilinear order, float64). Indices/fracs are computed in
    numpy from the (constant) rois — mmcv RoIAlign defines no roi
    gradient — so autograd flows only into the features."""
    feat = feat_nchw[0].permute(1, 2, 0).double()  # (H, W, C), keeps graph
    h, w, _ = feat.shape
    rois_np = rois.detach().numpy().astype(np.float64)

    def axis_samples(start, bin_sz, grid, size):
        p = np.arange(out_size)[:, None]
        i = np.arange(grid)[None, :]
        coord = (start + (p + (i + 0.5) / grid) * bin_sz).reshape(-1)
        inside = (coord >= -1.0) & (coord <= size)
        cc = np.maximum(coord, 0.0)
        low = np.minimum(np.floor(cc), size - 1).astype(np.int64)
        high = np.minimum(low + 1, size - 1)
        frac = np.where(cc >= size - 1, 0.0, cc - low)
        return low, high, frac, inside

    outs = []
    for ri in range(rois_np.shape[0]):
        x1, y1, x2, y2 = rois_np[ri]
        start_w = x1 * spatial_scale - 0.5
        start_h = y1 * spatial_scale - 0.5
        roi_w = (x2 - x1) * spatial_scale
        roi_h = (y2 - y1) * spatial_scale
        bin_w, bin_h = roi_w / out_size, roi_h / out_size
        if sampling_ratio > 0:
            gw = gh = sampling_ratio
        else:
            gw = max(int(np.ceil(roi_w / out_size)), 1)
            gh = max(int(np.ceil(roi_h / out_size)), 1)
        yl, yh, fy, iny = axis_samples(start_h, bin_h, gh, int(h))
        xl, xh, fx, inx = axis_samples(start_w, bin_w, gw, int(w))
        fy_t = torch.from_numpy(fy)[:, None, None]
        fx_t = torch.from_numpy(fx)[None, :, None]
        rowv = (1 - fy_t) * feat[yl] + fy_t * feat[yh]
        rowv = rowv * torch.from_numpy(iny.astype(np.float64))[:, None, None]
        vals = (1 - fx_t) * rowv[:, xl] + fx_t * rowv[:, xh]
        vals = vals * torch.from_numpy(inx.astype(np.float64))[None, :, None]
        c = vals.shape[-1]
        out = vals.reshape(out_size, gh, out_size, gw, c).sum(dim=(1, 3))
        outs.append(out / (gh * gw))
    return torch.stack(outs).permute(0, 3, 1, 2).float()


def deform_conv_t(x, offset, weight, stride=1, padding=1, dilation=1,
                  groups=1, deform_groups=1):
    """mmcv-full 1.2.1 deform_conv (v1) im2col transcription.

    x (N, Cin, H, W); offset (N, dg*2*K, Ho, Wo) with channel layout
    [dg][tap][(y, x)]; weight (Cout, Cin/groups, kh, kw). Bilinear samples
    use per-corner bounds checks and the (-1, size) validity window.
    """
    n, cin, h, w = x.shape
    cout, cin_g, kh, kw = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    off = offset.view(n, deform_groups, k, 2, ho, wo).double()
    xd = x.double()

    base_y = torch.arange(ho).view(-1, 1) * stride - padding
    base_x = torch.arange(wo).view(1, -1) * stride - padding

    cols = x.new_zeros((n, k, cin, ho, wo), dtype=torch.float64)
    cg = cin // deform_groups
    for t in range(k):
        i, j = t // kw, t % kw
        for dg in range(deform_groups):
            ys = base_y.double() + i * dilation + off[:, dg, t, 0]  # (N,Ho,Wo)
            xs = base_x.double() + j * dilation + off[:, dg, t, 1]
            inside = (ys > -1) & (ys < h) & (xs > -1) & (xs < w)
            y0 = ys.floor()
            x0 = xs.floor()
            ly, lx = ys - y0, xs - x0
            y0 = y0.long()
            x0 = x0.long()
            val = torch.zeros((n, cg, ho, wo), dtype=torch.float64)
            for (yi, xi, wgt) in (
                (y0, x0, (1 - ly) * (1 - lx)),
                (y0, x0 + 1, (1 - ly) * lx),
                (y0 + 1, x0, ly * (1 - lx)),
                (y0 + 1, x0 + 1, ly * lx),
            ):
                ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w) & inside
                yc = yi.clamp(0, h - 1)
                xc = xi.clamp(0, w - 1)
                # gather (N, cg, Ho, Wo) at per-(n,ho,wo) positions
                flat = xd[:, dg * cg:(dg + 1) * cg].reshape(n, cg, h * w)
                idx = (yc * w + xc).reshape(n, 1, -1).expand(n, cg, ho * wo)
                g = torch.gather(flat, 2, idx).reshape(n, cg, ho, wo)
                val = val + g * (wgt * ok.double()).unsqueeze(1)
            cols[:, t, dg * cg:(dg + 1) * cg] = val

    out = x.new_zeros((n, cout, ho, wo), dtype=torch.float64)
    cpg = cin // groups     # in-channels per conv group
    opg = cout // groups    # out-channels per conv group
    wd = weight.double()
    for g in range(groups):
        col_g = cols[:, :, g * cpg:(g + 1) * cpg]        # (N, K, cpg, Ho, Wo)
        col_g = col_g.permute(0, 3, 4, 2, 1).reshape(n, ho * wo, cpg * k)
        # weight (opg, cpg, kh, kw) -> (cpg*K, opg) matching col (cin, tap)
        wg = wd[g * opg:(g + 1) * opg].reshape(opg, cpg, k)
        wg = wg.permute(1, 2, 0).reshape(cpg * k, opg)
        out[:, g * opg:(g + 1) * opg] = (
            col_g @ wg).reshape(n, ho, wo, opg).permute(0, 3, 1, 2)
    return out.float()


# ---------------------------------------------------------------------------
# modules (attribute names == mmdet state-dict names)
# ---------------------------------------------------------------------------


class ConvModule(nn.Module):
    """mmcv ConvModule: .conv (+ .gn) + relu; order conv -> norm -> act."""

    def __init__(self, cin, cout, k, stride=1, padding=0, gn_groups=None,
                 bias="auto", act=True):
        super().__init__()
        with_norm = gn_groups is not None
        if bias == "auto":
            bias = not with_norm
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              bias=bias)
        if with_norm:
            self.gn = nn.GroupNorm(gn_groups, cout)
        self._with_norm = with_norm
        self._act = act

    def forward(self, x):
        x = self.conv(x)
        if self._with_norm:
            x = self.gn(x)
        if self._act:
            x = F.relu(x)
        return x


class DeformConv2dPack(nn.Module):
    """mmcv DeformConv2dPack: .weight + .conv_offset (regular conv)."""

    def __init__(self, cin, cout, k=3, stride=1, padding=1, groups=1,
                 deform_groups=1):
        super().__init__()
        self.weight = nn.Parameter(torch.empty(cout, cin // groups, k, k))
        nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        self.conv_offset = nn.Conv2d(
            cin, deform_groups * 2 * k * k, k, stride=stride, padding=padding)
        nn.init.zeros_(self.conv_offset.weight)
        nn.init.zeros_(self.conv_offset.bias)
        self.stride, self.padding = stride, padding
        self.groups, self.deform_groups = groups, deform_groups

    def forward(self, x):
        offset = self.conv_offset(x)
        return deform_conv_t(x, offset, self.weight, stride=self.stride,
                             padding=self.padding, groups=self.groups,
                             deform_groups=self.deform_groups)


class Bottleneck(nn.Module):
    """mmdet 'pytorch'-style bottleneck (stride on conv2), optional DCN/groups."""

    def __init__(self, cin, planes, stride, dcn=False, groups=1, base_width=4,
                 deform_groups=1):
        super().__init__()
        if groups == 1:
            width = planes
        else:
            width = math.floor(planes * (base_width / 64)) * groups
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        if dcn:
            self.conv2 = DeformConv2dPack(
                width, width, 3, stride=stride, padding=1, groups=groups,
                deform_groups=deform_groups)
        else:
            self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                                   groups=groups, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(out + idt)


class TorchResNet(nn.Module):
    def __init__(self, depth=50, stage_with_dcn=(False,) * 4, groups=1,
                 base_width=4, deform_groups=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin, planes = 64, 64
        for s in range(4):
            blocks = []
            for i in range(BLOCKS[depth][s]):
                stride = (2 if s > 0 else 1) if i == 0 else 1
                blocks.append(Bottleneck(
                    cin if i == 0 else planes * 4, planes, stride,
                    dcn=stage_with_dcn[s], groups=groups,
                    base_width=base_width, deform_groups=deform_groups))
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
            cin = planes * 4
            planes *= 2

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
            outs.append(x)
        return outs


class TorchFPN(nn.Module):
    """fpn.py:10 — laterals, top-down nearest add, 3x3 outs, P6 maxpool."""

    def __init__(self, in_channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [ConvModule(c, out, 1, act=False) for c in in_channels])
        self.fpn_convs = nn.ModuleList(
            [ConvModule(out, out, 3, padding=1, act=False)
             for _ in in_channels])

    def forward(self, inputs):
        lats = [l(x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[2:], mode="nearest")
        outs = [f(l) for f, l in zip(self.fpn_convs, lats)]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


class TorchRPNHead(nn.Module):
    def __init__(self, channels=256, num_anchors=3):
        super().__init__()
        self.rpn_conv = nn.Conv2d(channels, channels, 3, padding=1)
        self.rpn_cls = nn.Conv2d(channels, num_anchors, 1)
        self.rpn_reg = nn.Conv2d(channels, num_anchors * 4, 1)

    def forward(self, feats):
        scores, deltas = [], []
        for f in feats:
            t = F.relu(self.rpn_conv(f))
            scores.append(self.rpn_cls(t))
            deltas.append(self.rpn_reg(t))
        return scores, deltas


def grid_anchors(stride, ratios, scales, fh, fw):
    base = np_base_anchors(stride, ratios, scales)  # (A, 4)
    sx = np.arange(fw) * stride
    sy = np.arange(fh) * stride
    xx, yy = np.meshgrid(sx, sy)  # row-major: y outer
    shifts = np.stack([xx.ravel(), yy.ravel(), xx.ravel(), yy.ravel()], -1)
    all_a = base[None, :, :] + shifts[:, None, :]
    return torch.from_numpy(all_a.reshape(-1, 4).astype(np.float32))


def get_rpn_proposals(cls_scores, bbox_preds, img_shape, strides=(4, 8, 16, 32, 64),
                      ratios=(0.5, 1.0, 2.0), scales=(8,), nms_pre=1000,
                      nms_post=1000, nms_thr=0.7, min_bbox_size=0):
    """rpn_head.py:78-168 for one image."""
    level_ids, mlvl_scores, mlvl_preds, mlvl_anchors = [], [], [], []
    for idx in range(len(cls_scores)):
        s = cls_scores[idx][0].permute(1, 2, 0).reshape(-1)
        scores = s.sigmoid()
        preds = bbox_preds[idx][0].permute(1, 2, 0).reshape(-1, 4)
        fh, fw = cls_scores[idx].shape[-2:]
        anchors = grid_anchors(strides[idx], ratios, scales, fh, fw)
        if 0 < nms_pre < scores.shape[0]:
            ranked, rank_inds = scores.sort(descending=True)
            topk = rank_inds[:nms_pre]
            scores = ranked[:nms_pre]
            preds = preds[topk]
            anchors = anchors[topk]
        mlvl_scores.append(scores)
        mlvl_preds.append(preds)
        mlvl_anchors.append(anchors)
        level_ids.append(torch.full((scores.size(0),), idx, dtype=torch.long))
    scores = torch.cat(mlvl_scores)
    anchors = torch.cat(mlvl_anchors)
    preds = torch.cat(mlvl_preds)
    proposals = delta2bbox_t(anchors, preds, max_shape=img_shape)
    ids = torch.cat(level_ids)
    if min_bbox_size > 0:
        w = proposals[:, 2] - proposals[:, 0]
        h = proposals[:, 3] - proposals[:, 1]
        valid = (w >= min_bbox_size) & (h >= min_bbox_size)
        proposals, scores, ids = proposals[valid], scores[valid], ids[valid]
    dets, _ = batched_nms_t(proposals, scores, ids, nms_thr)
    return dets[:nms_post]


class TorchGlobalContextHead(nn.Module):
    """global_context_head.py:323-401."""

    def __init__(self, num_convs=4, channels=256, num_classes=81):
        super().__init__()
        self.convs = nn.ModuleList(
            [ConvModule(channels, channels, 3, padding=1)
             for _ in range(num_convs)])
        self.fc = nn.Linear(channels, num_classes)

    def forward(self, feats):
        x = feats[-1]
        for conv in self.convs:
            x = conv(x)
        x = F.adaptive_avg_pool2d(x, 1)
        mc_pred = self.fc(x.reshape(x.size(0), -1))
        return mc_pred, x


class TorchShared2FC(nn.Module):
    """convfc_bbox_head.py Shared2FCBBoxHead (2 shared fcs, cls 81, reg 4)."""

    def __init__(self, in_channels=256, roi_size=7, fc_out=1024,
                 num_classes=80):
        super().__init__()
        self.num_classes = num_classes
        self.shared_fcs = nn.ModuleList([
            nn.Linear(in_channels * roi_size * roi_size, fc_out),
            nn.Linear(fc_out, fc_out),
        ])
        self.fc_cls = nn.Linear(fc_out, num_classes + 1)
        self.fc_reg = nn.Linear(fc_out, 4)

    def forward(self, x):
        x = x.flatten(1)
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


def map_roi_levels_t(rois4, num_levels, finest_scale=56.0):
    scale = torch.sqrt(
        (rois4[:, 2] - rois4[:, 0]) * (rois4[:, 3] - rois4[:, 1]))
    lvls = torch.floor(torch.log2(scale / finest_scale + 1e-6))
    return lvls.clamp(0, num_levels - 1).long()


class TorchSingleRoIExtractor(nn.Module):
    """single_level_roi_extractor.py:9-98 (no params)."""

    def __init__(self, strides=(4, 8, 16, 32), out_size=7, sampling_ratio=0):
        super().__init__()
        self.strides = strides
        self.out_size = out_size
        self.sampling_ratio = sampling_ratio

    def forward(self, feats, rois5):
        lvls = map_roi_levels_t(rois5[:, 1:], len(self.strides))
        out = feats[0].new_zeros(
            rois5.size(0), feats[0].size(1), self.out_size, self.out_size)
        for i, stride in enumerate(self.strides):
            for b in range(feats[i].shape[0]):
                mask = (lvls == i) & (rois5[:, 0].long() == b)
                if mask.any():
                    out[mask] = roi_align_t(
                        feats[i][b:b + 1], rois5[mask, 1:], 1.0 / stride,
                        self.out_size, self.sampling_ratio)
        return out


class TorchAdptRoIExtractor(nn.Module):
    """adaptative_roi_extractor.py:25-91 (conv1/conv2 attention, edge ring)."""

    def __init__(self, strides=(4, 8, 16, 32), out_size=7, sampling_ratio=0,
                 edge=1):
        super().__init__()
        self.strides = strides
        self.out_size = out_size
        self.sampling_ratio = sampling_ratio
        self.edge = edge
        self.conv1 = nn.Conv2d(256, 128, 1)
        self.conv2 = nn.Conv2d(128, 1, 1)

    def att(self, x):
        return self.conv2(torch.tanh(self.conv1(F.adaptive_avg_pool2d(x, 1))))

    def _align(self, feat, rois5, stride):
        """Per-image-aware RoIAlign over a batched level map."""
        out = feat.new_zeros(rois5.size(0), feat.size(1), self.out_size,
                             self.out_size)
        for b in range(feat.shape[0]):
            mask = rois5[:, 0].long() == b
            if mask.any():
                out[mask] = roi_align_t(
                    feat[b:b + 1], rois5[mask, 1:], 1.0 / stride,
                    self.out_size, self.sampling_ratio)
        return out

    def forward(self, feats, rois5):
        per_level, atts = [], []
        for i, stride in enumerate(self.strides):
            rf = self._align(feats[i], rois5, stride)
            atts.append(self.att(rf).reshape(-1).unsqueeze(0))
            per_level.append(rf.unsqueeze(0))
        roi_feat = torch.cat(per_level, dim=0)  # (L, N, C, 7, 7)
        atts = torch.cat(atts, dim=0).softmax(0)  # (L, N)
        fused = (atts[:, :, None, None, None] * roi_feat).sum(0)
        enhance = self._align(feats[0], rois5, self.strides[0])
        e = self.edge
        enhance[:, :, e:-e, e:-e] = 0
        return fused + enhance


class TorchHTDBBoxHead(nn.Module):
    """htd_bbox_head.py:34-230."""

    def __init__(self, in_channels=256, roi_size=7, fc_out=1024,
                 num_classes=80, num_reg_convs=4, mid=16 * 36, gn_groups=36,
                 alpha=1.0, relpace=False, average=False, edge=1):
        super().__init__()
        self.num_classes = num_classes
        self.alpha, self.relpace, self.average, self.edge = (
            alpha, relpace, average, edge)
        self.fc_cls = nn.Linear(fc_out, num_classes + 1)
        self.fc_reg = nn.Linear(1024, 4)
        convs = []
        for i in range(num_reg_convs):
            if i == 0:
                convs.append(ConvModule(in_channels, mid, 3, padding=1,
                                        gn_groups=gn_groups, bias=False))
            elif i == num_reg_convs - 1:
                convs.append(ConvModule(mid, 1024, 3, padding=1, bias=False))
            else:
                convs.append(ConvModule(mid, mid, 3, padding=1,
                                        gn_groups=gn_groups, bias=False))
        self.convs = nn.Sequential(*convs)
        relu = nn.ReLU(inplace=True)
        self.fcs = nn.Sequential(
            nn.Linear(in_channels * roi_size * roi_size, fc_out), relu,
            nn.Linear(fc_out, fc_out), relu)
        self.avg_pool = nn.AvgPool2d(roi_size)
        self.graph_lvl0_cls = nn.Linear(fc_out, fc_out)
        self.graph_lvl1_cls = nn.Linear(fc_out, fc_out)
        self.graph_lvl2_cls = nn.Linear(fc_out, fc_out)
        self.graph_lvl3_cls = nn.Linear(fc_out, fc_out)

    @property
    def graph_layer_cls(self):
        return [self.graph_lvl0_cls, self.graph_lvl1_cls,
                self.graph_lvl2_cls, self.graph_lvl3_cls]

    def _fuse_global(self, roi_feats, glbctx_feat, rois):
        fused = torch.zeros_like(roi_feats)
        for img_id in rois[:, 0].unique(sorted=True).long():
            inds = rois[:, 0] == img_id.item()
            fused[inds] = roi_feats[inds] + glbctx_feat[img_id]
        return fused

    def forward(self, x_cls, x_reg, feat, rois, fc_cls_0, enhanced_feat,
                pos_rois=None, global_feat=None):
        prototype = torch.cat(
            (fc_cls_0.weight, fc_cls_0.bias.unsqueeze(1)), 1).detach()
        bs = int(torch.max(rois[..., 0])) + 1
        x_cls_glb = None
        if global_feat is not None:
            x_cls_glb = self._fuse_global(x_cls, global_feat, rois)
            x_reg = self._fuse_global(x_reg, global_feat, pos_rois)
            x_cls_glb = self.fcs(x_cls_glb.flatten(1))
        if self.relpace:
            x_reg = x_reg.clone()
            e = self.edge
            x_reg[:, :, :e, :] = 0
            x_reg[:, :, -e:, :] = 0
            x_reg[:, :, :, :e] = 0
            x_reg[:, :, :, -e:] = 0
            x_reg = x_reg + self.alpha * enhanced_feat
        elif self.average:
            x_reg = x_reg.clone()
            e = self.edge
            x_reg[:, :, :e, :] *= 0.5
            x_reg[:, :, -e:, :] *= 0.5
            x_reg[:, :, :, :e] *= 0.5
            x_reg[:, :, :, -e:] *= 0.5
            x_reg[:, :, 0, 0] *= 2
            x_reg[:, :, 0, -1] *= 2
            x_reg[:, :, -1, 0] *= 2
            x_reg[:, :, -1, -1] *= 2
            x_reg = x_reg + 0.5 * enhanced_feat
        else:
            x_reg = x_reg + self.alpha * enhanced_feat
        x_reg = self.convs(x_reg)
        x_reg = self.avg_pool(x_reg).view(x_reg.size(0), -1)

        x_cls = self.fcs(x_cls.flatten(1))
        sam = torch.mm(fc_cls_0(x_cls).softmax(-1), prototype)
        target_lvls = map_roi_levels_t(rois[:, 1:5], len(feat))
        refined = x_cls.new_zeros(x_cls.size(0), x_cls.size(1))
        for b in range(bs):
            bs_indx = rois[..., 0] == b
            for i in range(len(feat)):
                idx = (target_lvls == i) & bs_indx
                if idx.any():
                    sam_ = sam[idx]
                    rois_ = rois[idx, 1:5]
                    from tests.oracles import np_iou
                    h_local = torch.from_numpy(np_iou(
                        rois_.numpy().astype(np.float64),
                        rois_.numpy().astype(np.float64))).float()
                    h_local.fill_diagonal_(1.0)
                    h_local[h_local > 0] = 1.0
                    d = torch.diag(torch.sum(h_local, dim=-1).pow(-0.5))
                    a_local = d @ h_local @ d
                    h_global = 1.0 - h_local
                    roi_feat = x_cls[idx]
                    mixed = a_local @ roi_feat
                    sim = sam_ @ sam_.t()
                    a_global = (h_global * sim).softmax(-1)
                    refined[idx] = F.relu(
                        self.graph_layer_cls[i](a_global @ mixed))
        feat_cls_new = (x_cls_glb if global_feat is not None else x_cls) + refined
        return self.fc_cls(feat_cls_new), self.fc_reg(x_reg)


class TorchHTDRoIHead(nn.Module):
    """htd_roi_head.py (test path)."""

    def __init__(self, num_classes=80, stage0_stds=(0.1, 0.1, 0.2, 0.2),
                 stage1_stds=(0.05, 0.05, 0.1, 0.1), score_thr=0.05,
                 nms_iou=0.5, max_per_img=100):
        super().__init__()
        self.glbctx_head = TorchGlobalContextHead(num_classes=num_classes + 1)
        self.bbox_head = nn.ModuleList([
            TorchShared2FC(num_classes=num_classes),
            TorchHTDBBoxHead(num_classes=num_classes),
        ])
        self.bbox_roi_extractor = nn.ModuleList([
            TorchSingleRoIExtractor(),
            TorchAdptRoIExtractor(),
        ])
        self.stage0_stds = stage0_stds
        self.stage1_stds = stage1_stds
        self.score_thr, self.nms_iou, self.max_per_img = (
            score_thr, nms_iou, max_per_img)

    def _fuse_global(self, roi_feats, global_feat, rois):
        fused = torch.zeros_like(roi_feats)
        for img_id in rois[:, 0].unique(sorted=True).long():
            inds = rois[:, 0] == img_id.item()
            fused[inds] = roi_feats[inds] + global_feat[img_id]
        return fused

    def _bbox_forward(self, stage, x, rois, global_feat):
        """Test-mode _bbox_forward (htd_roi_head.py:143-201)."""
        extractor = self.bbox_roi_extractor[0]
        enhanced_extractor = self.bbox_roi_extractor[1]
        feats4 = x[:4]
        if stage == 0:
            bbox_feats = extractor(feats4, rois)
            if global_feat is not None:
                bbox_feats = self._fuse_global(bbox_feats, global_feat, rois)
            cls_score, bbox_pred = self.bbox_head[0](bbox_feats)
        else:
            bbox_feats = extractor(feats4, rois)
            enhanced = enhanced_extractor(feats4, rois)
            cls_score, bbox_pred = self.bbox_head[1](
                bbox_feats, bbox_feats, feats4, rois,
                self.bbox_head[0].fc_cls, enhanced, rois, global_feat)
        return cls_score, bbox_pred

    def stages_forward(self, x, proposals, img_shape):
        """Both stages on given proposals (single image). Returns
        (pre-NMS decoded boxes, mean softmax scores, refined rois)."""
        rois = torch.cat(
            [torch.zeros(proposals.size(0), 1), proposals], dim=1)
        _, global_feat = self.glbctx_head(x)
        s0_cls, s0_reg = self._bbox_forward(0, x, rois, global_feat)
        # regress_by_class, class-agnostic (bbox_head.py:306-335)
        refined = delta2bbox_t(rois[:, 1:], s0_reg, stds=self.stage0_stds,
                               max_shape=img_shape)
        rois1 = torch.cat([rois[:, :1], refined], dim=1)
        s1_cls, s1_reg = self._bbox_forward(1, x, rois1, global_feat)
        cls_score = (s0_cls + s1_cls) / 2.0
        boxes = delta2bbox_t(rois1[:, 1:], s1_reg, stds=self.stage1_stds,
                             max_shape=img_shape)
        return boxes, cls_score.softmax(-1), rois1[:, 1:], (s0_cls, s1_cls)

    def simple_test(self, x, proposals, img_shape, scale_factor):
        boxes, scores, _, _ = self.stages_forward(x, proposals, img_shape)
        boxes = boxes / boxes.new_tensor(scale_factor)
        dets, labels = multiclass_nms_t(boxes, scores, self.score_thr,
                                        self.nms_iou, self.max_per_img)
        return dets, labels


class TorchHTDDetector(nn.Module):
    """FasterRCNN(HTDRoIHead) shell; state_dict keys == mmdet checkpoint."""

    def __init__(self, depth=50, stage_with_dcn=(False,) * 4, groups=1,
                 base_width=4, num_classes=80):
        super().__init__()
        self.backbone = TorchResNet(depth, stage_with_dcn, groups, base_width)
        self.neck = TorchFPN()
        self.rpn_head = TorchRPNHead()
        self.roi_head = TorchHTDRoIHead(num_classes=num_classes)

    def extract_feat(self, img):
        return self.neck(self.backbone(img))

    def simple_test(self, img, img_shape, scale_factor, nms_pre=1000,
                    nms_post=1000):
        feats = self.extract_feat(img)
        scores, deltas = self.rpn_head(feats)
        props = get_rpn_proposals(scores, deltas, img_shape,
                                  nms_pre=nms_pre, nms_post=nms_post)
        return self.roi_head.simple_test(
            feats, props[:, :4], img_shape, scale_factor), props


def randomize(model: nn.Module, seed=0, cls_std=0.3, reg_std=0.02):
    """Random-but-sane init: BN stats randomized, score heads spread so
    post-softmax scores clear score_thr, regression heads kept small so
    refined boxes stay in-image."""
    g = torch.Generator().manual_seed(seed)
    for name, m in model.named_modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.7, 1.4, generator=g)
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0, 0.05, generator=g)
        elif isinstance(m, nn.GroupNorm):
            with torch.no_grad():
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0, 0.05, generator=g)
        elif isinstance(m, (nn.Conv2d, nn.Linear)):
            std = 0.03
            if name.endswith(("fc_cls", "rpn_cls")):
                std = cls_std
            if name.endswith(("fc_reg", "rpn_reg")):
                std = reg_std
            with torch.no_grad():
                m.weight.normal_(0, std, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0, 0.02, generator=g)
        elif isinstance(m, DeformConv2dPack):
            with torch.no_grad():
                m.weight.normal_(0, 0.03, generator=g)
    # small non-zero offsets exercise the deformable sampling path
    for m in model.modules():
        if isinstance(m, DeformConv2dPack):
            with torch.no_grad():
                m.conv_offset.weight.normal_(0, 0.01, generator=g)
                m.conv_offset.bias.normal_(0, 0.2, generator=g)
    model.eval()
    return model


def state_dict_np(model: nn.Module):
    return {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
