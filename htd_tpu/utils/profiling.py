"""Profiling utilities (reference mmdet/utils/profiling.py equivalent).

`profile_time` wraps a region with wall-clock (+ device sync) timing;
`trace_to` captures a jax.profiler trace (xplane) viewable in TensorBoard /
xprof — the TPU-native replacement for CUDA-event timing.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_time(name: str, stream=None, sync: bool = True):
    import jax

    t0 = time.monotonic()
    yield
    if sync:
        # drain all pending device work so the region is fully measured
        jax.effects_barrier()
        (jax.device_put(0.0) + 0).block_until_ready()
    dt = (time.monotonic() - t0) * 1000.0
    print(f"{name} elapsed: {dt:.2f} ms")


@contextlib.contextmanager
def trace_to(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
