"""Inference throughput benchmark (driver-run on real TPU).

Protocol mirrors the reference tools/benchmark.py:70-95: single-image
batches, warmup, steady-state timing, images/sec. The reference publishes
no fps numbers (SURVEY.md §6); `vs_baseline` is computed against an assumed
8.0 img/s for the PyTorch HTD R-50 on its era GPU (Faster R-CNN-class
two-stage detectors with per-roi graph loops run ~5-10 fps on V100).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

ASSUMED_PYTORCH_BASELINE_IPS = 8.0


def main():
    import jax
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.models.detector import HTDDetector

    cfg = C.htd_r50_1x(compute_dtype="bfloat16")
    model = HTDDetector(cfg)

    h, w = 768, 1344  # landscape COCO bucket at (1333, 800) test scale
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.normal(0, 1, (1, h, w, 3)).astype(np.float32))
    img_shapes = jnp.asarray(np.array([[750.0, 1333.0]], np.float32))
    scale_factors = jnp.asarray(np.ones((1, 4), np.float32))

    init_fn = jax.jit(
        lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf)
    )
    variables = init_fn(jax.random.PRNGKey(0), images, img_shapes, scale_factors)

    @jax.jit
    def fwd(images, img_shapes, scale_factors):
        return model.apply(variables, images, img_shapes, scale_factors)

    # warmup (compile + 5 steady iterations, reference protocol)
    dets = fwd(images, img_shapes, scale_factors)
    jax.block_until_ready(dets)
    for _ in range(5):
        dets = fwd(images, img_shapes, scale_factors)
    jax.block_until_ready(dets)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        dets = fwd(images, img_shapes, scale_factors)
    jax.block_until_ready(dets)
    dt = time.perf_counter() - t0
    ips = iters / dt

    print(
        json.dumps(
            {
                "metric": "HTD R-50 COCO-shape inference images/sec/chip",
                "value": round(ips, 3),
                "unit": "img/s",
                "vs_baseline": round(ips / ASSUMED_PYTORCH_BASELINE_IPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
