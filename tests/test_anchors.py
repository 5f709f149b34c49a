import numpy as np
import pytest

import jax.numpy as jnp

from htd_tpu.ops.anchors import AnchorGenerator, anchor_inside_flags
from tests.oracles import np_base_anchors

pytestmark = pytest.mark.fast


def test_base_anchors_match_oracle():
    gen = AnchorGenerator(strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0), scales=(8,))
    for lvl, stride in enumerate(gen.strides):
        ref = np_base_anchors(stride, (0.5, 1.0, 2.0), (8,))
        np.testing.assert_allclose(gen.base_anchors[lvl], ref, rtol=1e-5)


def test_base_anchor_geometry():
    gen = AnchorGenerator(strides=(16,), ratios=(0.5, 1.0, 2.0), scales=(8,))
    base = gen.base_anchors[0]
    w = base[:, 2] - base[:, 0]
    h = base[:, 3] - base[:, 1]
    # aspect ratio h/w equals the configured ratio; area == (stride*scale)^2
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)
    np.testing.assert_allclose(w * h, [(16 * 8) ** 2] * 3, rtol=1e-5)
    # centered at origin (center_offset=0)
    np.testing.assert_allclose(base[:, 0] + base[:, 2], 0, atol=1e-4)


def test_grid_anchors_layout():
    gen = AnchorGenerator(strides=(4,), ratios=(0.5, 1.0, 2.0), scales=(8,))
    anchors = np.asarray(gen.grid_anchors_level(0, (2, 3)))
    assert anchors.shape == (2 * 3 * 3, 4)
    a = gen.base_anchors[0]
    # location-major: first 3 anchors = base at (0,0), next 3 = base shifted x by 4
    np.testing.assert_allclose(anchors[:3], a, rtol=1e-6)
    np.testing.assert_allclose(anchors[3:6], a + np.array([4, 0, 4, 0]), rtol=1e-6)
    # row stride: anchor 3*3 (second row, first col) shifted y by 4
    np.testing.assert_allclose(anchors[9:12], a + np.array([0, 4, 0, 4]), rtol=1e-6)


def test_valid_flags():
    gen = AnchorGenerator(strides=(8,), ratios=(1.0,), scales=(8,))
    flags = np.asarray(gen.valid_flags_level(0, (4, 4), (17, 9)))
    # valid cells: ceil(17/8)=3 rows, ceil(9/8)=2 cols
    grid = flags.reshape(4, 4)
    expected = np.zeros((4, 4), bool)
    expected[:3, :2] = True
    np.testing.assert_array_equal(grid, expected)


def test_anchor_inside_flags():
    anchors = jnp.array(
        [[0.0, 0.0, 10.0, 10.0], [-1.0, 0.0, 10.0, 10.0], [0.0, 0.0, 100.0, 10.0], [5.0, 5.0, 99.0, 49.0]]
    )
    valid = jnp.array([True, True, True, True])
    inside = np.asarray(anchor_inside_flags(anchors, valid, (50, 100), 0))
    np.testing.assert_array_equal(inside, [True, False, False, True])
