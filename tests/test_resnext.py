"""ResNeXt grouped-conv parity + backbone construction."""

import numpy as np
import torch
import jax
import jax.numpy as jnp
import flax.linen as nn

from htd_tpu.models.layers import conv
from htd_tpu.models.resnet import ResNet


def test_grouped_conv_matches_torch(rng):
    groups = 8
    tconv = torch.nn.Conv2d(32, 64, 3, padding=1, groups=groups, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(rng.normal(0, 0.2, (64, 4, 3, 3)).astype(np.float32)))
    x = rng.normal(0, 1, (1, 32, 9, 11)).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    m = conv(64, 3, 1, groups=groups, use_bias=False)
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
    ours = m.apply({"params": {"kernel": jnp.asarray(kernel)}},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_resnext_width_and_shapes():
    """ResNeXt-101 64x4d bottleneck widths: planes*base_width*groups/64."""
    model = ResNet(depth=10, groups=64, base_width=4)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda r, xx: model.init(r, xx))(jax.random.PRNGKey(0), x)
    outs = jax.jit(lambda v, xx: model.apply(v, xx))(variables, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    # stage-1 conv2 operates at width 64*4*64/64 = 256 with 64 groups
    k = variables["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 256 // 64, 256)


def test_blockdiag_grouped_conv_matches_torch(rng):
    """Dense block-diagonal execution == torch grouped conv."""
    from htd_tpu.models.resnet import BlockDiagGroupedConv

    groups = 8
    tconv = torch.nn.Conv2d(32, 64, 3, padding=1, groups=groups, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(rng.normal(0, 0.2, (64, 4, 3, 3)).astype(np.float32)))
    x = rng.normal(0, 1, (1, 32, 9, 11)).astype(np.float32)
    ref = tconv(torch.from_numpy(x)).detach().numpy()

    m = BlockDiagGroupedConv(64, groups=groups)
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HW(C/G)O
    ours = m.apply({"params": {"kernel": jnp.asarray(kernel)}},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_grouped_dcn_param_shape():
    """X-101-DCN conv2: grouped deformable weight keeps the (3,3,C/G,out)
    layout torch checkpoints convert into."""
    from htd_tpu.models.resnet import ResNet

    model = ResNet(
        depth=10, groups=64, base_width=4,
        stage_with_dcn=(False, True, False, False),
    )
    variables = jax.jit(lambda r, xx: model.init(r, xx))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    p = variables["params"]["layer2_0"]["conv2"]
    # layer2 width = 128*4*64/64 = 512; groups 64 -> C/G = 8
    assert p["kernel"].shape == (3, 3, 512 // 64, 512)
    assert p["conv_offset"]["kernel"].shape == (3, 3, 512, 18)


def test_grouped_dcn_chunked_equals_dense(rng, monkeypatch):
    """Group-aligned channel chunking (HTD_DCN_GROUP_CHUNK) is exact: a
    grouped DCN conv never mixes channels across groups, so per-chunk dense
    block-diagonal convs concatenated == one full dense block-diagonal conv
    (the path X-101's 1024/2048-ch c4/c5 convs take to reach the Pallas
    kernel's VMEM guard)."""
    from htd_tpu.models.resnet import DeformConv2d

    m = DeformConv2d(features=32, groups=8, deform_groups=1)
    x = jnp.asarray(rng.normal(0, 1, (2, 9, 11, 32)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    # random (non-zero-init) offsets so the bilinear sampling is exercised
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(0, 0.5, p.shape).astype(p.dtype)),
        variables["params"],
    )

    monkeypatch.setenv("HTD_DCN_GROUP_CHUNK", "0")
    dense = m.apply({"params": params}, x)
    monkeypatch.setenv("HTD_DCN_GROUP_CHUNK", "8")  # cg=4 -> 2 groups/chunk
    chunked = m.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(dense), rtol=1e-5, atol=1e-5
    )

    # ragged split (3 groups/chunk over 8 groups) must also be exact
    monkeypatch.setenv("HTD_DCN_GROUP_CHUNK", "12")
    ragged = m.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(ragged), np.asarray(dense), rtol=1e-5, atol=1e-5
    )
