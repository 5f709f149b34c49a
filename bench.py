"""Inference throughput benchmark (driver-run on real TPU).

Protocol mirrors the reference tools/benchmark.py:70-95: single-image
batches, warmup, steady-state timing, images/sec. The reference publishes
no fps numbers (SURVEY.md §6); `vs_baseline` divides by an 8.0 img/s
estimate of PyTorch HTD R-50 on a V100 — see BASELINE.md "Baseline
throughput derivation" for the full justification (mmdet-2.x model-zoo
anchor points + a FLOP budget of HTD's extra per-roi work; 8.0 is the
GENEROUS end of the 6-8 fps estimate, so vs_baseline is a lower bound).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# See BASELINE.md "Baseline throughput derivation".
ASSUMED_PYTORCH_BASELINE_IPS = 8.0


def main():
    import jax
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.models.detector import HTDDetector
    from htd_tpu.utils.kernel_probe import probe_and_gate

    # compile-probe the TPU-only Pallas kernels on tiny shapes first and
    # fall back (env kill-switches) for any this platform's Mosaic rejects
    # — the bench must degrade to XLA paths, not crash
    probe_and_gate()

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

    # Device-side iteration loop: the TPU is attached through a tunnel whose
    # per-call round-trip (~30+ ms) would otherwise dominate and whose
    # block_until_ready is a no-op; we run N forwards inside ONE compiled
    # program (dynamic fori bound -> single compile; input perturbed per
    # step to defeat CSE) and take the slope between two N values.
    @jax.jit
    def run_n(variables, images, img_shapes, scale_factors, n):
        def body(i, acc):
            img_i = images + (i.astype(images.dtype) * 1e-9)
            dets = model.apply(variables, img_i, img_shapes, scale_factors)
            return (
                acc
                + jnp.sum(dets.scores)
                + jnp.sum(dets.boxes) * 1e-6
                + jnp.sum(dets.labels).astype(jnp.float32) * 1e-6
            )
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    # warmup / compile (single program reused for both N values)
    float(run_n(variables, images, img_shapes, scale_factors, 1))

    def timed(n):
        t0 = time.perf_counter()
        float(run_n(variables, images, img_shapes, scale_factors, n))
        return time.perf_counter() - t0

    t_small = min(timed(2) for _ in range(3))
    t_big = min(timed(12) for _ in range(3))
    per_image = (t_big - t_small) / 10.0
    ips = 1.0 / per_image

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
