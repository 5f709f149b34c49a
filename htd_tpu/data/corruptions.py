"""Image corruption benchmark transforms (robustness testing).

Behavioral spec: the reference's `Corrupt` pipeline step
(reference mmdet/datasets/pipelines/transforms.py:716-756) delegates to the
`imagecorruptions` package (Hendrycks & Dietterich, "Benchmarking Neural
Network Robustness to Common Corruptions and Perturbations", ICLR 2019) and
is driven by reference tools/test_robustness.py:240-258 (corruption x
severity grid inserted after image loading, before Resize).

This module reimplements the 19 corruption types (15 benchmark + 4 holdout)
natively on numpy/cv2/PIL with the published ImageNet-C severity constants.
Notes on fidelity:

* All functions take/return **uint8 BGR HWC** images of any size (the
  ImageNet-C reference implementations assume 224x224 for a few spatial
  constants; like `imagecorruptions`, spatial parameters here scale off the
  actual image size where the published code did so).
* `frost` in the original overlays bundled photographic frost textures.
  Those assets are not shipped here; we synthesize a procedural frost layer
  (thresholded multi-octave noise) with the same severity blend weights.
  Absolute mPC numbers for `frost` are therefore not comparable with
  imagecorruptions, but severity monotonicity and the benchmark workflow
  are preserved.
* RNG is taken from an explicit seed (default 0) so corrupted evals are
  reproducible; the original seeds numpy globally.
"""

from __future__ import annotations

import io
from typing import Dict, Tuple

import numpy as np

# corruption name groups (reference tools/test_robustness.py:203-236)
BENCHMARK_CORRUPTIONS = [
    "gaussian_noise", "shot_noise", "impulse_noise",
    "defocus_blur", "glass_blur", "motion_blur", "zoom_blur",
    "snow", "frost", "fog", "brightness",
    "contrast", "elastic_transform", "pixelate", "jpeg_compression",
]
HOLDOUT_CORRUPTIONS = ["speckle_noise", "gaussian_blur", "spatter", "saturate"]
ALL_CORRUPTIONS = BENCHMARK_CORRUPTIONS + HOLDOUT_CORRUPTIONS
GROUPS = {
    "noise": ["gaussian_noise", "shot_noise", "impulse_noise"],
    "blur": ["defocus_blur", "glass_blur", "motion_blur", "zoom_blur"],
    "weather": ["snow", "frost", "fog", "brightness"],
    "digital": ["contrast", "elastic_transform", "pixelate", "jpeg_compression"],
    "benchmark": BENCHMARK_CORRUPTIONS,
    "holdout": HOLDOUT_CORRUPTIONS,
    "all": ALL_CORRUPTIONS,
}


def _to_float(img: np.ndarray) -> np.ndarray:
    return img.astype(np.float32) / 255.0


def _to_uint8(x: np.ndarray) -> np.ndarray:
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def _rng(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


# ---------------------------------------------------------------- noise


def gaussian_noise(img, severity, seed=0):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    x = _to_float(img)
    return _to_uint8(x + _rng(seed).normal(size=x.shape, scale=c))


def shot_noise(img, severity, seed=0):
    c = [60, 25, 12, 5, 3][severity - 1]
    x = _to_float(img)
    return _to_uint8(_rng(seed).poisson(x * c) / float(c))


def impulse_noise(img, severity, seed=0):
    """Salt & pepper: fraction c of pixels forced to 0 or 1."""
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    x = _to_float(img)
    r = _rng(seed)
    flip = r.uniform(size=x.shape) < c
    salt = r.uniform(size=x.shape) < 0.5
    x = np.where(flip, np.where(salt, 1.0, 0.0), x)
    return _to_uint8(x)


def speckle_noise(img, severity, seed=0):
    c = [0.15, 0.2, 0.35, 0.45, 0.6][severity - 1]
    x = _to_float(img)
    return _to_uint8(x + x * _rng(seed).normal(size=x.shape, scale=c))


# ---------------------------------------------------------------- blur


def _gaussian_blur(x: np.ndarray, sigma: float) -> np.ndarray:
    import cv2

    k = int(2 * round(3.5 * sigma) + 1)
    return cv2.GaussianBlur(x, (k, k), sigmaX=sigma, borderType=cv2.BORDER_REFLECT)


def gaussian_blur(img, severity, seed=0):
    c = [1, 2, 3, 4, 6][severity - 1]
    return _to_uint8(_gaussian_blur(_to_float(img), c))


def _disk_kernel(radius: int, alias_blur: float) -> np.ndarray:
    import cv2

    if radius <= 8:
        coords = np.arange(-8, 8 + 1)
        ksize = (3, 3)
    else:
        coords = np.arange(-radius, radius + 1)
        ksize = (5, 5)
    xx, yy = np.meshgrid(coords, coords)
    disk = ((xx ** 2 + yy ** 2) <= radius ** 2).astype(np.float32)
    disk /= disk.sum()
    return cv2.GaussianBlur(disk, ksize, sigmaX=alias_blur)


def defocus_blur(img, severity, seed=0):
    import cv2

    radius, alias = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)][severity - 1]
    x = _to_float(img)
    kern = _disk_kernel(radius, alias)
    return _to_uint8(cv2.filter2D(x, -1, kern, borderType=cv2.BORDER_REFLECT))


def glass_blur(img, severity, seed=0):
    """Gaussian blur + iterated local pixel swaps (vectorized: each pass
    swaps every interior pixel with a random neighbour within max_delta)."""
    sigma, max_delta, iters = [
        (0.7, 1, 2), (0.9, 2, 1), (1.0, 2, 3), (1.1, 3, 2), (1.5, 4, 2)
    ][severity - 1]
    r = _rng(seed)
    x = _gaussian_blur(_to_float(img), sigma)
    h, w = x.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    for _ in range(iters):
        dy = r.randint(-max_delta, max_delta + 1, size=(h, w))
        dx = r.randint(-max_delta, max_delta + 1, size=(h, w))
        ny = np.clip(ys + dy, 0, h - 1)
        nx = np.clip(xs + dx, 0, w - 1)
        swapped = x[ny, nx]
        # swap both directions like the serial reference loop (approximately:
        # write each pixel's partner value, then the partner gets ours)
        x[ys, xs], x[ny, nx] = swapped, x[ys, xs].copy()
    return _to_uint8(_gaussian_blur(x, sigma))


def motion_blur(img, severity, seed=0):
    import cv2

    size, sigma = [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)][severity - 1]
    angle = _rng(seed).uniform(-45, 45)
    # line kernel of length `size` blurred along its axis with `sigma`
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = 1.0
    k = cv2.GaussianBlur(k, (1, 2 * int(sigma) + 1), sigmaX=0, sigmaY=sigma)
    rot = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle, 1.0)
    k = cv2.warpAffine(k, rot, (size, size))
    k /= max(k.sum(), 1e-8)
    x = _to_float(img)
    return _to_uint8(cv2.filter2D(x, -1, k, borderType=cv2.BORDER_REFLECT))


def zoom_blur(img, severity, seed=0):
    import cv2

    c = [
        np.arange(1, 1.11, 0.01), np.arange(1, 1.16, 0.01),
        np.arange(1, 1.21, 0.02), np.arange(1, 1.26, 0.02),
        np.arange(1, 1.31, 0.03),
    ][severity - 1]
    x = _to_float(img)
    h, w = x.shape[:2]
    out = np.zeros_like(x)
    for zoom in c:
        zh, zw = int(np.ceil(h * zoom)), int(np.ceil(w * zoom))
        z = cv2.resize(x, (zw, zh), interpolation=cv2.INTER_LINEAR)
        top, left = (zh - h) // 2, (zw - w) // 2
        out += z[top : top + h, left : left + w]
    return _to_uint8((x + out) / (len(c) + 1))


# ---------------------------------------------------------------- weather


def _plasma_fractal(h: int, w: int, wibbledecay: float, r: np.random.RandomState):
    """Diamond-square fractal noise in [0, 1] at the next pow2 size >= (h, w)."""
    size = 1
    while size < max(h, w):
        size *= 2
    arr = np.zeros((size + 1, size + 1), np.float32)
    step, wibble = size, 100.0

    def wibbled(shape):
        return r.uniform(-wibble, wibble, shape).astype(np.float32)

    while step > 1:
        half = step // 2
        # diamond
        sq = arr[0:size:step, 0:size:step]
        diag = (
            sq + np.roll(sq, -1, 0) + np.roll(sq, -1, 1) + np.roll(np.roll(sq, -1, 0), -1, 1)
        ) / 4.0
        arr[half:size:step, half:size:step] = diag + wibbled(diag.shape)
        # square
        d = arr[half:size:step, half:size:step]
        up = (np.roll(d, 1, 0) + d + np.roll(sq, -1, 1) + sq) / 4.0
        arr[0:size:step, half:size:step] = up + wibbled(up.shape)
        left = (np.roll(d, 1, 1) + d + np.roll(sq, -1, 0) + sq) / 4.0
        arr[half:size:step, 0:size:step] = left + wibbled(left.shape)
        step, wibble = half, wibble / wibbledecay
    arr = arr[:h, :w]
    arr -= arr.min()
    return arr / max(arr.max(), 1e-8)


def fog(img, severity, seed=0):
    c, decay = [(1.5, 2), (2.0, 2), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4)][severity - 1]
    x = _to_float(img)
    mx = x.max()
    layer = _plasma_fractal(x.shape[0], x.shape[1], decay, _rng(seed))
    x = x + c * layer[..., None]
    return _to_uint8(x * mx / max(mx + c, 1e-8))


def frost(img, severity, seed=0):
    """Procedural frost (see module docstring: no bundled textures)."""
    xw, fw = [(1.0, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7), (0.6, 0.75)][
        severity - 1
    ]
    x = _to_float(img)
    r = _rng(seed)
    h, w = x.shape[:2]
    base = _plasma_fractal(h, w, 1.8, r)
    crystals = _gaussian_blur(r.uniform(size=(h, w)).astype(np.float32), 1.0)
    layer = np.clip((base * 0.6 + crystals * 0.6) - 0.35, 0, 1) * 1.6
    layer = np.clip(layer, 0, 1)[..., None] * np.array([1.0, 0.98, 0.94], np.float32)
    return _to_uint8(xw * x + fw * layer)


def snow(img, severity, seed=0):
    import cv2

    loc, scale, zoom, thr, blur_sigma, blend = [
        (0.1, 0.3, 3.0, 0.5, 4, 0.8),
        (0.2, 0.3, 2.0, 0.5, 4, 0.7),
        (0.55, 0.3, 4.0, 0.9, 8, 0.7),
        (0.55, 0.3, 4.5, 0.85, 8, 0.65),
        (0.55, 0.3, 2.5, 0.85, 12, 0.55),
    ][severity - 1]
    r = _rng(seed)
    x = _to_float(img)
    h, w = x.shape[:2]
    layer = r.normal(size=(h, w), loc=loc, scale=scale).astype(np.float32)
    zh, zw = int(np.ceil(h * zoom)), int(np.ceil(w * zoom))
    layer = cv2.resize(layer, (zw, zh))[:h, :w]
    layer[layer < thr] = 0.0
    # streak the flakes like the motion-blurred reference layer
    k = np.zeros((blur_sigma * 2 + 1, blur_sigma * 2 + 1), np.float32)
    k[:, blur_sigma] = 1.0
    ang = cv2.getRotationMatrix2D((blur_sigma, blur_sigma), r.uniform(-135, -45), 1.0)
    k = cv2.warpAffine(k, ang, k.shape[::-1])
    k /= max(k.sum(), 1e-8)
    layer = cv2.filter2D(layer, -1, k)[..., None]
    gray = cv2.cvtColor(_to_uint8(x), cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
    whitened = blend * x + (1 - blend) * np.maximum(x, gray[..., None] * 1.5 + 0.5)
    return _to_uint8(np.clip(whitened + layer + np.rot90(layer, 2), 0, 1))


def brightness(img, severity, seed=0):
    import cv2

    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 2] = np.clip(hsv[..., 2] + c * 255.0, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def saturate(img, severity, seed=0):
    import cv2

    mul, add = [(0.3, 0), (0.1, 0), (2.0, 0), (5.0, 0.1), (20.0, 0.2)][severity - 1]
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * mul + add * 255.0, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


# ---------------------------------------------------------------- digital


def contrast(img, severity, seed=0):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = _to_float(img)
    mean = x.mean(axis=(0, 1), keepdims=True)
    return _to_uint8((x - mean) * c + mean)


def elastic_transform(img, severity, seed=0):
    """Affine jitter + gaussian-smoothed random displacement field."""
    import cv2

    h, w = img.shape[:2]
    shape_size = np.array([h, w], np.float32)
    # (displacement alpha, field sigma, affine sigma) as fractions of size
    a, s, aff = [
        (0.05, 0.3, 0.06), (0.065, 0.3, 0.06), (0.085, 0.22, 0.045),
        (0.11, 0.16, 0.03), (0.16, 0.1, 0.02),
    ][severity - 1]
    alpha = a * min(h, w)
    sigma = s * min(h, w)
    r = _rng(seed)

    center = shape_size[::-1] / 2.0  # (x, y)
    sq = min(h, w) // 3
    pts1 = np.float32([
        center + sq, [center[0] + sq, center[1] - sq], center - sq
    ])
    pts2 = pts1 + r.uniform(-aff * min(h, w), aff * min(h, w), pts1.shape).astype(
        np.float32
    )
    m = cv2.getAffineTransform(pts1, pts2)
    x = cv2.warpAffine(
        _to_float(img), m, (w, h), borderMode=cv2.BORDER_REFLECT_101
    )

    k = int(2 * round(3 * sigma) + 1)
    dx = cv2.GaussianBlur(
        r.uniform(-1, 1, (h, w)).astype(np.float32), (k, k), sigma
    ) * alpha
    dy = cv2.GaussianBlur(
        r.uniform(-1, 1, (h, w)).astype(np.float32), (k, k), sigma
    ) * alpha
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    out = cv2.remap(
        x, xs + dx, ys + dy, interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT_101,
    )
    return _to_uint8(out)


def pixelate(img, severity, seed=0):
    import cv2

    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity, seed=0):
    from PIL import Image

    c = [25, 18, 15, 10, 7][severity - 1]
    buf = io.BytesIO()
    # PIL expects RGB
    Image.fromarray(img[..., ::-1]).save(buf, "JPEG", quality=c)
    buf.seek(0)
    out = np.asarray(Image.open(buf).convert("RGB"))
    return np.ascontiguousarray(out[..., ::-1])


def spatter(img, severity, seed=0):
    """Water (sev 1-3: glossy highlight blobs) / mud (sev 4-5: brown blobs)."""
    import cv2

    loc, scale, sigma, thr, mud = [
        (0.65, 0.3, 4, 0.69, False), (0.65, 0.3, 3, 0.68, False),
        (0.65, 0.3, 2, 0.68, False), (0.65, 0.3, 1, 0.65, True),
        (0.67, 0.4, 1, 0.65, True),
    ][severity - 1]
    r = _rng(seed)
    x = _to_float(img)
    h, w = x.shape[:2]
    liquid = r.normal(size=(h, w), loc=loc, scale=scale).astype(np.float32)
    liquid = _gaussian_blur(liquid, sigma)
    mask = (liquid > thr).astype(np.float32)
    mask = _gaussian_blur(mask, 0.8)
    if not mud:
        # water: bluish translucent sheen
        color = np.array([0.85, 0.7, 0.55], np.float32)  # BGR light blue
        return _to_uint8(x * (1 - 0.55 * mask[..., None]) +
                         0.55 * mask[..., None] * color)
    color = np.array([0.24, 0.42, 0.63], np.float32)  # BGR mud brown
    return _to_uint8(x * (1 - mask[..., None]) + mask[..., None] * color)


_CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "speckle_noise": speckle_noise,
    "gaussian_blur": gaussian_blur,
    "defocus_blur": defocus_blur,
    "glass_blur": glass_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "snow": snow,
    "frost": frost,
    "fog": fog,
    "brightness": brightness,
    "contrast": contrast,
    "elastic_transform": elastic_transform,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
    "spatter": spatter,
    "saturate": saturate,
}


def corrupt(
    img: np.ndarray, corruption: str, severity: int, seed: int = 0
) -> np.ndarray:
    """Apply `corruption` at `severity` in [1, 5] to a uint8 BGR image.

    Severity 0 returns the image unchanged (reference test_robustness.py:243
    treats severity 0 as the clean baseline)."""
    if severity == 0:
        return img
    if not 1 <= severity <= 5:
        raise ValueError(f"severity must be in [0, 5], got {severity}")
    if corruption not in _CORRUPTIONS:
        raise ValueError(
            f"unknown corruption {corruption!r}; options: {sorted(_CORRUPTIONS)}"
        )
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected uint8 HWC BGR image, got {img.dtype} {img.shape}")
    return _CORRUPTIONS[corruption](img, severity, seed=seed)


class CorruptedDataset:
    """Dataset proxy applying a corruption to every loaded image.

    Equivalent to the reference inserting `dict(type='Corrupt', ...)` right
    after image loading in the test pipeline (test_robustness.py:251-258) —
    the corruption sees the raw full-resolution image, before Resize.
    The per-image seed is derived from the img_id so results are
    deterministic and independent of batch order.
    """

    def __init__(self, dataset, corruption: str, severity: int, seed: int = 0):
        self._dataset = dataset
        self.corruption = corruption
        self.severity = severity
        self.seed = seed

    def __getattr__(self, name):
        return getattr(self._dataset, name)

    def __len__(self):
        return len(self._dataset)

    def load_image(self, rec) -> np.ndarray:
        img = self._dataset.load_image(rec)
        return corrupt(
            img, self.corruption, self.severity,
            seed=(self.seed * 1_000_003 + int(rec.img_id)) % (2 ** 31),
        )
