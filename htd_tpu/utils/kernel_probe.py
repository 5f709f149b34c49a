"""Self-healing probe for the TPU-only Pallas kernels.

The new round-3 kernels (fused FPN upsample, Pallas pyramid builder,
packed v4 variant) are gated by env kill-switches (HTD_XLA_UPSAMPLE,
HTD_XLA_PYRAMID, HTD_V4_PACKED). `probe_and_gate()` compiles+runs each on
tiny shapes and FLIPS THE KILL-SWITCH for any that fail, so benchmark and
entry-point tools degrade to the equivalent XLA paths instead of crashing
if this platform's Mosaic rejects a construct we could not validate
in-round (the tunnel TPU can be unavailable for long stretches).

Call once at tool startup on the TPU platform; no-op on CPU.
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

print = functools.partial(print, file=sys.stderr)  # noqa: A001 — tools
# parse stdout (bench.py emits one JSON line); probe chatter goes to stderr


def _force(x):
    import jax.numpy as jnp

    return float(jnp.sum(x.astype(jnp.float32)))


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache (also for the remote axon backend,
    where compiles are slow tunnel round-trips). Keyed on HLO, so repeat
    benchmark/tool invocations across sessions skip recompilation."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".cache", "jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"[kernel_probe] compile cache disabled: {e}")


def _cache_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "probe_verdicts.json")


def _cache_key() -> str:
    import jax

    kind = jax.devices()[0].device_kind if jax.devices() else "?"
    key = f"{jax.default_backend()}/{kind}/jax-{jax.__version__}"
    # The dcn_windowed probe compiles a window-shape-dependent kernel:
    # non-default HTD_DCN_WIN / HTD_DCN_WINDOW_M configs get their own
    # verdict entry so a cached 'ok' from the default sym window cannot
    # replay for (and skip probing) an asym/wide-window run. Default
    # settings keep the bare key so the committed verdicts stay valid.
    win = os.environ.get("HTD_DCN_WIN", "")
    m = os.environ.get("HTD_DCN_WINDOW_M", "1")
    if win or m != "1":
        key += f"/dcnwin-{win or 'sym'}-m{m}"
    return key


def _apply_gates(results: dict) -> None:
    """Re-apply the env kill-switches a previous probe run decided on."""
    for name, verdict in results.items():
        if verdict == "ok":
            continue
        # verdict format: "FAILED -> ENV=VALUE (ExcName)" — apply the
        # recorded VALUE (not a hardcoded "1") so probes whose remedy is
        # ENV=0 replay correctly from cache.
        rhs = verdict.split("-> ", 1)[-1]
        if "=" in rhs:
            env, val = rhs.split("=", 1)
            val = val.split(" ", 1)[0].split("(", 1)[0].strip()
            if env and val:
                os.environ[env] = val
        if name == "dcn_windowed":
            os.environ["HTD_DCN_IMPL"] = "gather"
        if name == "v4_packed":
            os.environ["HTD_V4_PACKED"] = "0"


def probe_and_gate(verbose: bool = True, use_cache: bool = True,
                   train: bool = False) -> dict:
    """Compile-probe the Pallas kernels (or replay a committed verdict).

    `train=True` additionally probes the TRAIN-path backward kernels
    (RoIAlign window-accumulation backward, DCN select-MAC d_x) — their
    failure gates HTD_RA_BWD / HTD_DCN_DX back to the fold scatters.
    Inference tools skip these probes (bench.py must not spend driver
    budget compiling kernels it never runs).

    Probe verdicts are persisted to probe_verdicts.json keyed by
    (backend, device kind, jax version) so repeat tool/benchmark runs on a
    known platform skip the probe compiles entirely (VERDICT r03 item 1:
    bench.py must not spend its driver budget re-validating kernels).
    """
    import json

    import jax

    enable_compile_cache()
    results = {}
    if jax.default_backend() == "cpu":
        return results
    key = _cache_key()
    if use_cache and os.environ.get("HTD_PROBE_FORCE", "0") != "1":
        try:
            with open(_cache_path()) as f:
                cache = json.load(f)
        except Exception:  # noqa: BLE001 — missing/corrupt cache
            cache = {}
        hit = cache.get(key)
        # the opt-in probes are keyed into the verdict set; a cache entry is
        # only replayable if it covers every probe the current env enables
        want = {"pyramid_builder"}
        if os.environ.get("HTD_PALLAS_UPSAMPLE", "0") == "1":
            want.add("upsample2x_add")
        if os.environ.get("HTD_DCN_IMPL", "") in ("", "pallas"):
            want.add("dcn_windowed")
        if os.environ.get("HTD_V4_PACKED", "0") == "1":
            want.add("v4_packed")
        if train:
            if os.environ.get("HTD_RA_BWD", "") in ("", "pallas"):
                want.add("ra_bwd")
            if os.environ.get("HTD_DCN_DX", "") in ("", "pallas"):
                want.add("dcn_dx")
            if os.environ.get("HTD_DCN_DOW", "pallas") != "vjp":
                want.add("dcn_dow")
        if hit is not None and want <= set(hit):
            _apply_gates(hit)
            if verbose:
                print(f"[kernel_probe] cached verdicts for {key}: {hit}")
            return hit
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def probe(name, kill_env, fn, kill_value="1"):
        try:
            _force(fn())
            results[name] = "ok"
        except Exception as e:  # noqa: BLE001 — any compile/run failure
            if kill_env:
                os.environ[kill_env] = kill_value
            results[name] = (
                f"FAILED -> {kill_env}={kill_value} ({type(e).__name__})"
            )
            if verbose:
                print(f"[kernel_probe] {name}: {results[name]}: "
                      f"{str(e)[:200]}")
        if verbose and results[name] == "ok":
            print(f"[kernel_probe] {name}: ok")

    if os.environ.get("HTD_PALLAS_UPSAMPLE", "0") == "1":
        # Pallas upsample is opt-in (XLA form is the production default
        # after the round-3 on-chip A/B); only probe when opted in.
        def up():
            from htd_tpu.ops.upsample import upsample2x_add

            low = jnp.asarray(
                rng.normal(0, 1, (1, 8, 16, 256)).astype(np.float32))
            lat = jnp.asarray(
                rng.normal(0, 1, (1, 16, 32, 256)).astype(np.float32))
            return jax.jit(upsample2x_add)(low, lat)

        probe("upsample2x_add", "HTD_XLA_UPSAMPLE", up)

    def pyr():
        import htd_tpu.ops.roi_align_pallas as rap

        feats = [
            jnp.asarray(rng.normal(0, 1, (32 // 2 ** i, 84 // 2 ** i, 256))
                        .astype(np.float32))
            for i in range(3)
        ]
        return jax.jit(
            lambda *fs: rap._build_pyramid_pallas(
                list(fs), rap.V4_RES_H, 96, rap.V4_X_BLOCK, rap.V4_Y_STRIPE
            )[0]
        )(*feats)

    probe("pyramid_builder", "HTD_XLA_PYRAMID", pyr)

    if os.environ.get("HTD_DCN_IMPL", "") in ("", "pallas"):
        # the fused windowed DCN kernel (default on TPU); on failure fall
        # back to the gather formulation
        def dcn():
            from htd_tpu.ops.dcn_pallas import dcn_conv_windowed

            x = jnp.asarray(
                rng.normal(0, 1, (1, 16, 20, 128)).astype(np.float32))
            w = jnp.asarray(
                rng.normal(0, 0.1, (3, 3, 128, 128)).astype(np.float32))
            off = jnp.asarray(
                rng.normal(0, 0.3, (1, 16, 20, 18)).astype(np.float32))
            return jax.jit(
                lambda a, b, c: dcn_conv_windowed(a, b, c, 1, 1, 1, 32)
            )(x, off, w)

        probe("dcn_windowed", "HTD_DCN_IMPL_GATHER", dcn)
        if results.get("dcn_windowed") != "ok":
            os.environ["HTD_DCN_IMPL"] = "gather"

    if os.environ.get("HTD_V4_PACKED", "0") == "1":

        def packed():
            import htd_tpu.ops.roi_align_pallas as rap
            from htd_tpu.ops.boxes import map_roi_levels

            feats = [
                jnp.asarray(
                    rng.normal(0, 1, (48 // 2 ** i, 96 // 2 ** i, 256))
                    .astype(np.float32))
                for i in range(4)
            ]
            rois = np.array([[4.0, 4.0, 60.0, 40.0],
                             [40.0, 8.0, 120.0, 90.0]], np.float32)
            lvls = map_roi_levels(jnp.asarray(rois), 4)
            return jax.jit(
                lambda fs, r, l: rap.roi_align_pallas_v4(
                    fs, r, (4, 8, 16, 32), l, 7, 0, 4)[0]
            )(feats, jnp.asarray(rois), lvls)

        probe("v4_packed", "HTD_V4_PACKED_OFF", packed)
        if "v4_packed" in results and results["v4_packed"] != "ok":
            os.environ["HTD_V4_PACKED"] = "0"

    if train and os.environ.get("HTD_RA_BWD", "") in ("", "pallas"):

        def ra_bwd():
            import htd_tpu.ops.roi_align_pallas as rap
            from htd_tpu.ops.boxes import map_roi_levels

            feats = [
                jnp.asarray(rng.normal(0, 1, (1, 32 >> i, 48 >> i, 128))
                            .astype(np.float32))
                for i in range(4)
            ]
            rois = jnp.asarray(
                np.array([[[4.0, 4.0, 60.0, 40.0],
                           [40.0, 8.0, 100.0, 90.0]]], np.float32))
            lvls = jax.vmap(lambda rr: map_roi_levels(rr, 4))(rois)
            g = jnp.asarray(
                rng.normal(0, 1, (1, 2, 7, 7, 128)).astype(np.float32))
            return jax.jit(
                lambda fs, r_, l_, g_: rap.roi_align_fused_batched_grad_feats(
                    list(fs), r_, (4, 8, 16, 32), l_, g_
                )[0]
            )(tuple(feats), rois, lvls, g)

        probe("ra_bwd", "HTD_RA_BWD", ra_bwd, kill_value="fold")

    if train and os.environ.get("HTD_DCN_DX", "") in ("", "pallas"):

        def dcn_dx():
            from htd_tpu.ops.dcn import _dcn_dx_pallas

            x = jnp.asarray(
                rng.normal(0, 1, (1, 16, 20, 128)).astype(np.float32))
            w = jnp.asarray(
                rng.normal(0, 0.1, (3, 3, 128, 128)).astype(np.float32))
            off = jnp.asarray(
                rng.normal(0, 0.3, (1, 16, 20, 18)).astype(np.float32))
            g = jnp.asarray(
                rng.normal(0, 1, (1, 16, 20, 128)).astype(np.float32))
            return jax.jit(
                lambda a, b, c, d: _dcn_dx_pallas(
                    a, b, c, d, 3, 3, 1, 1, -1, 1, 32)
            )(x, off, w, g)

        probe("dcn_dx", "HTD_DCN_DX", dcn_dx, kill_value="fold")

    if train and os.environ.get("HTD_DCN_DOW", "pallas") != "vjp":

        def dcn_dow():
            from htd_tpu.ops.dcn import _dcn_dow_pallas

            x = jnp.asarray(
                rng.normal(0, 1, (1, 16, 20, 128)).astype(np.float32))
            w = jnp.asarray(
                rng.normal(0, 0.1, (3, 3, 128, 128)).astype(np.float32))
            off = jnp.asarray(
                rng.normal(0, 0.3, (1, 16, 20, 18)).astype(np.float32))
            g = jnp.asarray(
                rng.normal(0, 1, (1, 16, 20, 128)).astype(np.float32))
            return jax.jit(
                lambda a, b, c, d: _dcn_dow_pallas(
                    a, b, c, d, 3, 3, 1, 1, -1, 1, 32)[0]
            )(x, off, w, g)

        probe("dcn_dow", "HTD_DCN_DOW", dcn_dow, kill_value="vjp")

    if use_cache:
        try:
            try:
                with open(_cache_path()) as f:
                    cache = json.load(f)
            except Exception:  # noqa: BLE001
                cache = {}
            # merge: an inference run (no train probes) must not erase a
            # previous train run's ra_bwd/dcn_dx verdicts
            cache[key] = {**cache.get(key, {}), **results}
            with open(_cache_path(), "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except Exception as e:  # noqa: BLE001 — cache write is best-effort
            print(f"[kernel_probe] verdict cache write failed: {e}")
    return results
