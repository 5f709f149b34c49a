"""Chip-speed calibration: slope-timed 8192^3 bf16 matmul.

On a healthy v5e this measures ~5.9 ms/matmul (see PERF.md header). Run
before trusting cross-day comparisons of bench numbers — the TPU sits
behind a tunnel and the backing chip/host can change between sessions.
Returns a SCALAR from the jit so the tunnel transfer is negligible;
min-of-3 slope between two in-program fori_loop counts (bench.py method).
"""
import sys
import time

import jax
import jax.numpy as jnp


def main():
    k = 8192
    x = jnp.ones((k, k), jnp.bfloat16)

    @jax.jit
    def run_n(x, n):
        def body(i, acc):
            return jnp.tanh(acc @ x)
        return jax.lax.fori_loop(0, n, body, x)[0, 0].astype(jnp.float32)

    float(run_n(x, 1))  # compile + warmup

    def timed(n):
        t0 = time.perf_counter()
        float(run_n(x, n))
        return time.perf_counter() - t0

    t_small = min(timed(4) for _ in range(3))
    t_big = min(timed(36) for _ in range(3))
    ms = (t_big - t_small) / 32 * 1e3
    print(f"8192^3 bf16 matmul slope: {ms:.2f} ms (v5e spec ~5.9)")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    main()
