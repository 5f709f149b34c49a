"""ResNet / ResNeXt backbone (NHWC, frozen-BN), torchvision-compatible.

Behavioral spec: reference mmdet/models/backbones/resnet.py (pytorch-style
bottleneck: stride on the 3x3 conv, lines 151-156; frozen_stages /
norm_eval semantics at 573-652; DCN on conv2 of stages with
`stage_with_dcn`, lines 171-195) and resnext.py (grouped conv2 with
width = planes * base_width * groups / 64).

Param layout intentionally mirrors torch state-dict naming
(conv1/bn1/layer{1-4}/{i}/conv{1-3}, bn{1-3}, downsample) so the
checkpoint converter is a pure name map + NCHW->HWIO transpose.
Freezing (`frozen_stages`) is applied by the optimizer mask, not here.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from htd_tpu.models.layers import FrozenBatchNorm, conv, max_pool

Array = jnp.ndarray

ARCH_BLOCKS = {
    10: (1, 1, 1, 1),  # test-only tiny variant
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class DeformConv2d(nn.Module):
    """DCNv1 (DeformConv2dPack): 3x3 deformable conv with a learned offset.

    Offset conv (`conv_offset`) is zero-initialized (mmcv behavior), so an
    untrained DCN starts as a plain conv. Sampling is gather-based bilinear
    (see htd_tpu.ops.dcn).
    """

    features: int
    stride: int = 1
    deform_groups: int = 1
    groups: int = 1  # weight groups (ResNeXt); offsets stay deform-grouped
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from htd_tpu.ops.dcn import deform_conv2d  # local import: optional path

        cin = x.shape[-1]
        offsets = nn.Conv(
            features=self.deform_groups * 18,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset",
        )(x)
        cg = cin // self.groups
        weight = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_out", "normal"),
            (3, 3, cg, self.features),
            jnp.float32,
        )
        if self.groups > 1:
            og = self.features // self.groups

            def dense_block(g0: int, ng: int) -> Array:
                # block-diagonal dense kernel over groups [g0, g0+ng) (see
                # BlockDiagGroupedConv for the TPU rationale)
                d = jnp.zeros((3, 3, ng * cg, ng * og), weight.dtype)
                for j in range(ng):
                    d = jax.lax.dynamic_update_slice(
                        d,
                        weight[:, :, :, (g0 + j) * og : (g0 + j + 1) * og],
                        (0, 0, j * cg, j * og),
                    )
                return d

            # Group-aligned channel chunking: groups never mix channels, so
            # a grouped DCN conv splits into independent ~chunk-wide dense
            # block-diagonal DCN convs over disjoint channel ranges. Each
            # chunk's weight fits the Pallas kernel's VMEM guard (X-101's
            # 1024/2048-ch c4/c5 convs otherwise fall back to the gather
            # path) and the dense zero-block MXU waste drops from GxG to
            # chunk-diagonal. HTD_DCN_GROUP_CHUNK = target channel width
            # (0 = single dense conv, the pre-chunking behavior). On-chip
            # A/B (X-101 800x1600, 2026-08-20): 512 -> 166.9 ms/img,
            # 256 -> 182.1, 128 -> 232.3 (per-chunk fixed costs), dense
            # gather fallback -> 204.3; wider chunks lose the kernel to
            # its VMEM stripe budget (~45 MB at 512).
            chunk = int(os.environ.get("HTD_DCN_GROUP_CHUNK", "512"))
            gpc = self.groups if chunk <= 0 else max(1, chunk // cg)
            gpc = min(gpc, self.groups)
            n_chunks = -(-self.groups // gpc)
            if n_chunks > 1 and self.deform_groups == 1:
                outs = []
                for ci in range(n_chunks):
                    g0 = ci * gpc
                    ng = min(self.groups, g0 + gpc) - g0
                    outs.append(
                        deform_conv2d(
                            x[..., g0 * cg : (g0 + ng) * cg],
                            offsets,
                            dense_block(g0, ng).astype(x.dtype),
                            stride=self.stride,
                            deform_groups=1,
                        )
                    )
                return jnp.concatenate(outs, axis=-1)
            weight = dense_block(0, self.groups)
        return deform_conv2d(
            x,
            offsets,
            weight.astype(x.dtype),
            stride=self.stride,
            deform_groups=self.deform_groups,
        )


class BlockDiagGroupedConv(nn.Module):
    """Grouped 3x3 conv executed as a DENSE conv with a block-diagonal kernel.

    TPU rationale: ResNeXt's 64-way groups give 4-channel blocks — at 4/128
    lane utilization a native grouped conv runs ~3x slower end-to-end than
    the whole R-101 model. The dense block-diagonal formulation spends 64x
    the (nearly free) FLOPs to stay on the MXU's fast path. The parameter
    keeps the grouped (kh, kw, C/G, C_out) layout, so checkpoints convert
    identically to torch grouped convs.
    """

    features: int
    groups: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        cg = cin // self.groups
        og = self.features // self.groups
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (3, 3, cg, self.features),
            jnp.float32,
        )
        dense = jnp.zeros((3, 3, cin, self.features), kernel.dtype)
        for g in range(self.groups):
            dense = jax.lax.dynamic_update_slice(
                dense,
                kernel[:, :, :, g * og : (g + 1) * og],
                (0, 0, g * cg, g * og),
            )
        return jax.lax.conv_general_dilated(
            x,
            dense.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Bottleneck(nn.Module):
    """Pytorch-style bottleneck (stride on conv2)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 4
    with_dcn: bool = False
    deform_groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        expansion = 4
        if self.groups == 1:
            width = self.planes
        else:
            width = (self.planes * self.base_width * self.groups) // 64

        identity = x
        out = conv(width, 1, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(width, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)

        if self.with_dcn:
            out = DeformConv2d(
                width,
                stride=self.stride,
                deform_groups=self.deform_groups,
                groups=self.groups,
                dtype=self.dtype,
                name="conv2",
            )(out)
        elif self.groups > 1:
            out = BlockDiagGroupedConv(
                width, groups=self.groups, stride=self.stride,
                dtype=self.dtype, name="conv2",
            )(out)
        else:
            out = conv(
                width, 3, self.stride,
                use_bias=False, dtype=self.dtype, name="conv2",
            )(out)
        out = FrozenBatchNorm(width, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)

        out = conv(
            self.planes * expansion, 1, 1, use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = FrozenBatchNorm(self.planes * expansion, dtype=self.dtype, name="bn3")(out)

        if self.downsample:
            identity = conv(
                self.planes * expansion, 1, self.stride,
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(
                self.planes * expansion, dtype=self.dtype, name="downsample_bn"
            )(identity)

        return nn.relu(out + identity)


class StemConv(nn.Module):
    """7x7/stride-2 stem conv; optional space-to-depth form (HTD_S2D_STEM=1).

    The s2d idea: a 7x7 s2 conv with C_in=3 has contraction dim 3; the
    EXACT same linear map is a 4x4 s1 conv on the 2x2 space-to-depth input
    (12 channels): with ky-3 = 2*my+dy, x[2o+ky-3] = s2d(x)[o+my, dy],
    so w2[my+2, mx+2, (dy,dx,c)] = w[2(my+2)+dy-1, 2(mx+2)+dx-1, c] (taps
    with ky<0 are zero) and the output needs asymmetric padding (2, 1).
    On-chip A/B (round 3, v5e, 800x1344 R-50) measured the s2d form
    ~4 ms SLOWER end-to-end than XLA's native 7x7/s2 lowering (layout
    negotiation around the strided-slice concat), so the plain conv is
    the default and s2d is kept as an opt-in experiment gate.
    The stored param keeps the torch shape/name (conv1/kernel, (7,7,3,64))
    so checkpoint conversion is unchanged; w2 is built in-graph (tiny).
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (7, 7, cin, self.features),
            jnp.float32,
        )
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        if h % 2 or w % 2 or os.environ.get("HTD_S2D_STEM", "0") != "1":
            return jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,C,F)
        w2 = w8.reshape(4, 2, 4, 2, cin, self.features)
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, self.features)
        # s2d via strided slices (channel order (dy, dx, c)): the
        # reshape+transpose formulation materialized ~1.9 ms of data
        # formatting on the f32 image (profiled); strided slices of the
        # already-bf16 input lower to cheap copies
        xc = x.astype(self.dtype)
        x2 = jnp.concatenate(
            [xc[:, dy::2, dx::2, :] for dy in (0, 1) for dx in (0, 1)],
            axis=-1,
        )
        return jax.lax.conv_general_dilated(
            x2, w2.astype(x2.dtype), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNet(nn.Module):
    """ResNet-50/101/152 (or ResNeXt when groups > 1). Returns C2-C5 (NHWC)."""

    depth: int = 50
    groups: int = 1
    base_width: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    deform_groups: int = 1
    base_planes: int = 64    # stage-1 width; != 64 only for test/dryrun minis
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        blocks = ARCH_BLOCKS[self.depth]
        p0 = self.base_planes
        x = StemConv(p0, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(p0, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, 1)

        outs = []
        planes = p0
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            for i in range(blocks[stage]):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    groups=self.groups,
                    base_width=self.base_width,
                    with_dcn=self.stage_with_dcn[stage],
                    deform_groups=self.deform_groups,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
