import numpy as np
import pytest

import jax.numpy as jnp

from htd_tpu.ops import boxes as B
from tests.oracles import np_delta2bbox, np_iou

pytestmark = pytest.mark.fast


def test_delta2bbox_reference_example():
    # Example from the reference delta coder docstring
    # (delta_xywh_bbox_coder.py:156-169) — independent ground truth values.
    rois = jnp.array(
        [[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [5.0, 5.0, 5.0, 5.0]]
    )
    deltas = jnp.array(
        [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0], [0.0, 0.0, 2.0, -1.0], [0.7, -1.9, -0.5, 0.3]]
    )
    out = B.delta2bbox(rois, deltas, max_shape=(32, 32))
    expected = np.array(
        [
            [0.0000, 0.0000, 1.0000, 1.0000],
            [0.1409, 0.1409, 2.8591, 2.8591],
            [0.0000, 0.3161, 4.1945, 0.6839],
            [5.0000, 5.0000, 5.0000, 5.0000],
        ]
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_delta_roundtrip(rng):
    props = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    props[:, 2:] = props[:, :2] + rng.uniform(1, 50, (64, 2))
    gts = rng.uniform(0, 100, (64, 4)).astype(np.float32)
    gts[:, 2:] = gts[:, :2] + rng.uniform(1, 50, (64, 2))
    means, stds = (0.1, 0.2, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)
    deltas = B.bbox2delta(jnp.asarray(props), jnp.asarray(gts), means, stds)
    rec = B.delta2bbox(jnp.asarray(props), deltas, means, stds)
    np.testing.assert_allclose(np.asarray(rec), gts, atol=2e-2)


def test_delta2bbox_matches_oracle(rng):
    rois = rng.uniform(0, 200, (32, 4)).astype(np.float32)
    rois[:, 2:] = rois[:, :2] + rng.uniform(1, 80, (32, 2))
    deltas = rng.normal(0, 1, (32, 4)).astype(np.float32)
    means, stds = (0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)
    ours = B.delta2bbox(jnp.asarray(rois), jnp.asarray(deltas), means, stds, max_shape=(220, 220))
    ref = np_delta2bbox(rois, deltas, means, stds, max_shape=(220, 220))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-3)


def test_bbox_overlaps_matches_oracle(rng):
    a = rng.uniform(0, 100, (20, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(1, 40, (20, 2))
    b = rng.uniform(0, 100, (30, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(1, 40, (30, 2))
    ours = B.bbox_overlaps(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(ours), np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_bbox_overlaps_aligned(rng):
    a = rng.uniform(0, 100, (10, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(1, 40, (10, 2))
    full = np.asarray(B.bbox_overlaps(jnp.asarray(a), jnp.asarray(a)))
    aligned = np.asarray(B.bbox_overlaps(jnp.asarray(a), jnp.asarray(a), is_aligned=True))
    np.testing.assert_allclose(aligned, np.diag(full), rtol=1e-6)


def test_bbox_flip_involution(rng):
    a = rng.uniform(0, 100, (10, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(1, 20, (10, 2))
    shape = (120, 150)
    flipped = B.bbox_flip(jnp.asarray(a), shape)
    back = B.bbox_flip(flipped, shape)
    np.testing.assert_allclose(np.asarray(back), a, atol=1e-5)
    f = np.asarray(flipped)
    assert (f[:, 2] >= f[:, 0]).all()


def test_bbox_mapping_roundtrip(rng):
    a = rng.uniform(0, 100, (10, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(1, 20, (10, 2))
    img_shape = (256, 256)
    scale = np.array([1.5, 1.5, 1.5, 1.5], np.float32)
    mapped = B.bbox_mapping(jnp.asarray(a), img_shape, scale, True)
    back = B.bbox_mapping_back(mapped, img_shape, scale, True)
    np.testing.assert_allclose(np.asarray(back), a, atol=1e-4)


def test_map_roi_levels():
    def box(s):  # square box with sqrt(area) == s
        return [0.0, 0.0, float(s), float(s)]

    boxes = jnp.array([box(10), box(55), box(56), box(111), box(112), box(223), box(224), box(448), box(5000)])
    lvls = np.asarray(B.map_roi_levels(boxes, 4))
    # floor(log2(s/56 + 1e-6)) clamped to [0, 3]
    np.testing.assert_array_equal(lvls, [0, 0, 0, 0, 1, 1, 2, 3, 3])
