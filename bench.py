"""Inference throughput benchmark (driver-run on real TPU).

Protocol mirrors the reference tools/benchmark.py:70-95: single-image
batches, warmup, steady-state timing, images/sec. The reference publishes
no fps numbers (SURVEY.md §6); `vs_baseline` divides by an 8.0 img/s
estimate of PyTorch HTD R-50 on a V100 — see BASELINE.md "Baseline
throughput derivation" for the full justification (mmdet-2.x model-zoo
anchor points + a FLOP budget of HTD's extra per-roi work; 8.0 is the
GENEROUS end of the 6-8 fps estimate, so vs_baseline is a lower bound).

Robustness (VERDICT r03 item 1 — the round-3 driver run timed out and
recorded nothing):
  * probe verdicts come from the committed probe_verdicts.json (no probe
    compiles on a known platform), and the committed .cache/jax persistent
    XLA cache makes the model compile a deserialization instead of a
    tunnel round-trip;
  * a deadline watchdog (HTD_BENCH_DEADLINE_S, default 300s wall) prints
    the best measurement so far and exits 0 before any external timeout
    can kill the process with an empty stdout (re-arming every 60s while
    no measurement exists yet);
  * exactly ONE json line is ever printed to stdout:
    {"metric", "value", "unit", "vs_baseline", "mfu", ...}.

MFU: value * FLOPS_PER_IMG / CHIP_PEAK_FLOPS, constants measured by
tools/get_flops.py (XLA cost analysis of this exact program shape) and
tools/calibrate_chip.py (slope-timed 8192^3 bf16 matmul on this chip) —
see PERF.md "MFU accounting".
"""

import json
import os
import sys
import threading
import time

import numpy as np

# See BASELINE.md "Baseline throughput derivation".
ASSUMED_PYTORCH_BASELINE_IPS = 8.0

_emitted = False
_best = None
_lock = threading.Lock()


def _emit_once():
    """Print the single stdout JSON line (at most once, thread-safe)."""
    global _emitted
    with _lock:
        if not _emitted and _best is not None:
            print(json.dumps(_best), flush=True)
            _emitted = True


def _record(ips, phase, constants):
    global _best
    rec = {
        "metric": "HTD R-50 COCO-shape inference images/sec/chip",
        "value": round(ips, 3),
        "unit": "img/s",
        "vs_baseline": round(ips / ASSUMED_PYTORCH_BASELINE_IPS, 3),
        "phase": phase,
    }
    flops = constants.get("flops_per_img")
    peak = constants.get("chip_peak_flops")
    if flops and peak:
        rec["mfu"] = round(ips * flops / peak, 4)
    with _lock:
        _best = rec


def main():
    deadline = float(os.environ.get("HTD_BENCH_DEADLINE_S", "300"))
    t0_wall = time.monotonic()

    # Deadline watchdog: once a measurement exists, print it and exit 0
    # before an external `timeout` can kill the process with empty stdout.
    # With nothing measured yet (slow tunnel mid-compile) it re-arms — an
    # early empty exit would be no better than being killed.
    state = {"timer": None}

    def watchdog():
        if _best is None:
            state["timer"] = threading.Timer(60.0, watchdog)
            state["timer"].daemon = True
            state["timer"].start()
            return
        print("[bench] deadline watchdog fired — emitting best-so-far",
              file=sys.stderr, flush=True)
        _emit_once()
        os._exit(0)

    state["timer"] = threading.Timer(max(30.0, deadline - 15.0), watchdog)
    state["timer"].daemon = True
    state["timer"].start()

    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_constants.json")) as f:
            constants = json.load(f)
    except Exception:  # noqa: BLE001 — MFU is an extra; img/s must not die
        constants = {}

    import jax
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.models.detector import HTDDetector
    from htd_tpu.utils.kernel_probe import probe_and_gate

    # replay committed probe verdicts for this platform (compiles nothing
    # on a cache hit); fresh platforms still probe + gate before the bench
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
    print(f"[bench] compile+warmup done at {time.monotonic() - t0_wall:.0f}s",
          file=sys.stderr, flush=True)

    def timed(n):
        t0 = time.perf_counter()
        float(run_n(variables, images, img_shapes, scale_factors, n))
        return time.perf_counter() - t0

    # Per-pass slopes: (t_small, t_big) must come from the SAME pass —
    # mixing minima across passes can make t_big - t_small <= 0 on a
    # noisy tunnel and emit a negative/inf img/s. Min of per-pass slopes.
    slope_dts = []

    def one_pass(phase):
        ts = timed(2)
        tb = timed(12)
        if tb > ts:
            slope_dts.append(tb - ts)
        if slope_dts:
            _record(10.0 / min(slope_dts), phase, constants)

    # first full pass -> provisional result the watchdog can fall back on
    one_pass("provisional")

    # refine: min-of-3 per-pass slopes
    for _ in range(2):
        if time.monotonic() - t0_wall > deadline - 60.0:
            break
        one_pass("refined")

    if state["timer"] is not None:
        state["timer"].cancel()
    _emit_once()


if __name__ == "__main__":
    main()
