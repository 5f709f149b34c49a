"""Corruption-benchmark transforms (htd_tpu/data/corruptions.py).

The reference delegates to the `imagecorruptions` package (not installable
here); these tests pin the properties the robustness benchmark relies on:
shape/dtype preservation, determinism, severity-0 identity, severity
monotonicity for the analytically monotone corruptions, and the
CorruptedDataset proxy semantics.
"""

import numpy as np
import pytest

from htd_tpu.data.corruptions import (
    ALL_CORRUPTIONS,
    BENCHMARK_CORRUPTIONS,
    GROUPS,
    CorruptedDataset,
    corrupt,
)

pytestmark = pytest.mark.fast


def _img(seed=0, h=96, w=128):
    rng = np.random.RandomState(seed)
    # smooth-ish natural-image stand-in (noise corruption MSEs need signal)
    base = rng.randint(0, 255, (h // 8, w // 8, 3), np.uint8)
    import cv2

    return cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)


def test_group_lists():
    assert len(BENCHMARK_CORRUPTIONS) == 15
    assert len(ALL_CORRUPTIONS) == 19
    assert set(GROUPS["noise"] + GROUPS["blur"] + GROUPS["weather"]
               + GROUPS["digital"]) == set(BENCHMARK_CORRUPTIONS)


@pytest.mark.parametrize("name", ALL_CORRUPTIONS)
def test_shape_dtype_determinism(name):
    img = _img()
    out1 = corrupt(img, name, 3, seed=7)
    out2 = corrupt(img, name, 3, seed=7)
    assert out1.shape == img.shape and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)
    # severity 3 visibly changes the image
    assert np.abs(out1.astype(np.int32) - img.astype(np.int32)).mean() > 0.5


def test_severity_zero_identity():
    img = _img()
    assert corrupt(img, "gaussian_noise", 0) is img


@pytest.mark.parametrize(
    "name", ["gaussian_noise", "speckle_noise", "gaussian_blur", "contrast",
             "brightness", "jpeg_compression", "defocus_blur"]
)
def test_severity_monotone(name):
    """Distortion energy increases with severity for the monotone family."""
    img = _img(1, 128, 160)
    mses = []
    for sev in range(1, 6):
        out = corrupt(img, name, sev, seed=3)
        mses.append(((out.astype(np.float64) - img) ** 2).mean())
    assert all(b > a * 0.99 for a, b in zip(mses, mses[1:])), (name, mses)


def test_invalid_inputs():
    img = _img()
    with pytest.raises(ValueError):
        corrupt(img, "not_a_corruption", 3)
    with pytest.raises(ValueError):
        corrupt(img, "gaussian_noise", 6)
    with pytest.raises(ValueError):
        corrupt(img.astype(np.float32), "gaussian_noise", 3)


def test_corrupted_dataset_proxy():
    class FakeRec:
        img_id = 42

    class FakeDs:
        records = [FakeRec()]
        cat_ids = [1, 2]

        def __len__(self):
            return 1

        def load_image(self, rec):
            return _img(5)

    ds = CorruptedDataset(FakeDs(), "impulse_noise", 2, seed=1)
    assert len(ds) == 1
    assert ds.cat_ids == [1, 2]  # attribute proxying
    a = ds.load_image(ds.records[0])
    b = ds.load_image(ds.records[0])
    np.testing.assert_array_equal(a, b)  # per-img_id determinism
    assert not np.array_equal(a, FakeDs().load_image(None))
