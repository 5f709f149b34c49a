import numpy as np
import pytest

from htd_tpu.data.pipeline import (
    MEAN_RGB,
    STD_RGB,
    bucket_shape,
    ceil32,
    preprocess,
    rescale_size,
)

pytestmark = pytest.mark.fast


def test_rescale_size_landscape():
    # 480x640 at (1333, 800): factor = min(1333/640, 800/480) = 800/480
    h, w, f = rescale_size(480, 640, (1333, 800))
    assert abs(f - 800 / 480) < 1e-9
    assert (h, w) == (800, int(640 * 800 / 480 + 0.5))


def test_rescale_size_long_side_binds():
    # very wide image: long side limits
    h, w, f = rescale_size(200, 2000, (1333, 800))
    assert abs(f - 1333 / 2000) < 1e-9
    assert w == 1333


def test_bucket_shapes():
    assert bucket_shape((1333, 800), landscape=True) == (800, 1344)
    assert bucket_shape((1333, 800), landscape=False) == (1344, 800)
    assert ceil32(1333) == 1344 and ceil32(800) == 800


def test_preprocess_normalization_and_padding(rng):
    img = rng.randint(0, 255, (100, 160, 3)).astype(np.uint8)
    p = preprocess(img, scale=(240, 120), bucket=(128, 224))
    assert p.image.shape == (128, 224, 3)
    nh, nw = int(p.img_shape[0]), int(p.img_shape[1])
    assert (nh, nw) == (120, 192)
    # padding area is exactly zero
    assert np.abs(p.image[nh:, :]).max() == 0
    assert np.abs(p.image[:, nw:]).max() == 0
    # normalization: un-normalize corner pixel and compare to RGB of source
    top_left = p.image[0, 0] * STD_RGB + MEAN_RGB
    assert np.all((top_left >= 0) & (top_left <= 255))


def test_preprocess_boxes_scaled_clipped_flipped(rng):
    img = rng.randint(0, 255, (100, 200, 3)).astype(np.uint8)
    boxes = np.array([[10, 10, 50, 60], [150, 20, 260, 90]], np.float32)
    p = preprocess(img, scale=(100, 50), boxes=boxes, labels=np.array([1, 2]))
    # factor = min(100/200, 50/100) = 0.5 -> shape (50, 100)
    assert tuple(p.img_shape.astype(int)) == (50, 100)
    np.testing.assert_allclose(p.boxes[0], [5, 5, 25, 30], atol=1e-5)
    # second box clipped at the right edge
    np.testing.assert_allclose(p.boxes[1], [75, 10, 100, 45], atol=1e-5)

    pf = preprocess(img, scale=(100, 50), boxes=boxes, flip=True)
    np.testing.assert_allclose(pf.boxes[0], [100 - 25, 5, 100 - 5, 30], atol=1e-5)
    # flipped image mirrors the resized content
    np.testing.assert_allclose(
        pf.image[:50, :100], p.image[:50, :100][:, ::-1], atol=1e-5
    )
