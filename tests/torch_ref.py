"""Minimal torch reference models with mmdet-style state-dict names.

Used to validate (a) the checkpoint converter's name/layout mapping and
(b) numerical parity of the NHWC flax modules against torch NCHW compute.
Written from the architectural definitions — independent of the reference
repo's code.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

BLOCKS = {10: (1, 1, 1, 1), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
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
    def __init__(self, depth=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        cin, planes = 64, 64
        for s in range(4):
            blocks = []
            for i in range(BLOCKS[depth][s]):
                stride = (2 if s > 0 else 1) if i == 0 else 1
                blocks.append(Bottleneck(cin if i == 0 else planes * 4, planes, stride))
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
    def __init__(self, in_channels=(256, 512, 1024, 2048), out=256):
        super().__init__()
        self.lateral_convs = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(c, out, 1)) for c in in_channels]
        )
        self.fpn_convs = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(out, out, 3, padding=1)) for _ in in_channels]
        )

    def forward(self, inputs):
        lats = [l[0](x) for l, x in zip(self.lateral_convs, inputs)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[2:], mode="nearest"
            )
        outs = [f[0](l) for f, l in zip(self.fpn_convs, lats)]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


def mmdet_style_state_dict(resnet: TorchResNet, fpn: TorchFPN = None):
    """Rename to the mmdet checkpoint convention the converter expects."""
    sd = {}
    for k, v in resnet.state_dict().items():
        k = k.replace("downsample.0", "downsample.0").replace("downsample.1", "downsample.1")
        sd["backbone." + k] = v.numpy()
    if fpn is not None:
        for k, v in fpn.state_dict().items():
            # lateral_convs.{i}.0.weight -> lateral_convs.{i}.conv.weight
            k = k.replace(".0.weight", ".conv.weight").replace(".0.bias", ".conv.bias")
            sd["neck." + k] = v.numpy()
    return sd
