#!/usr/bin/env python
"""RoIAlign production-fidelity A/B (VERDICT r03 item 3).

The production presets clamp the adaptive sampling_ratio=0 grid
(config.py: max_samples=4 for the level-mapped extractor — exact for
aspect<=1:1 rois by the level-mapping geometry, approximate for elongated
ones — and adpt_max_samples=1 for the BA extractor's off-target levels,
where mmcv's grid would use up to ~48 samples/axis). This tool measures
what that approximation does to the DETECTIONS at real scale: same
converted random-init weights, same 768x1344 image, same internal RPN
proposals (the RPN is upstream of both extractors, so proposals are
bit-identical across configs); only the sampling fidelity varies.

Ladder: (max_samples, adpt_max_samples) from the production (4, 1) up to
(8, 8); each config's detection set is compared to the highest-fidelity
rung (matched by label + IoU >= 0.5; score/box deltas over matches), plus
a slope-timed ms/img so fidelity cost is visible. Run on the TPU.

Usage: python tools/ab_fidelity.py [--dtype bfloat16] [--height 768 ...]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def iou_matrix(a, b):
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)


def compare(ref, cur):
    """Greedy label-aware match; returns summary dict."""
    rb, rs, rl = ref
    cb, cs, cl = cur
    used = np.zeros(len(cb), bool)
    ds, db = [], []
    unmatched = 0
    for i in range(len(rb)):
        cand = np.nonzero((cl == rl[i]) & ~used)[0]
        if len(cand) == 0:
            unmatched += 1
            continue
        ious = iou_matrix(rb[i:i + 1], cb[cand])[0]
        j = cand[np.argmax(ious)]
        if ious.max() < 0.5:
            unmatched += 1
            continue
        used[j] = True
        ds.append(abs(rs[i] - cs[j]))
        db.append(np.abs(rb[i] - cb[j]).max())
    return {
        "n_ref": len(rb), "n_cur": len(cb),
        "matched": len(ds), "ref_only": unmatched,
        "cur_only": int((~used).sum()),
        "score_mad": float(np.mean(ds)) if ds else 0.0,
        "score_max": float(np.max(ds)) if ds else 0.0,
        "box_mad_px": float(np.mean(db)) if db else 0.0,
        "box_max_px": float(np.max(db)) if db else 0.0,
    }


def synth_proposals(n, h, w, seed=5):
    """Fixed proposals spanning all levels and aspects 0.33-3 (the anchor
    ratios' decoded range) — the pre-NMS probe's roi population."""
    rng = np.random.RandomState(seed)
    out = []
    while len(out) < n:
        scale = rng.uniform(16, 500)
        ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3)))
        bw = scale * np.sqrt(ar)
        bh = scale / np.sqrt(ar)
        if bw >= w - 2 or bh >= h - 2:
            continue
        x1 = rng.uniform(0, w - bw)
        y1 = rng.uniform(0, h - bh)
        out.append([x1, y1, x1 + bw, y1 + bh])
    return np.asarray(out, np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--score-thr", type=float, default=0.05)
    p.add_argument("--pre-nms", action="store_true",
                   help="compare pre-NMS boxes/scores on FIXED injected "
                        "proposals (stages_forward) — the clean materiality "
                        "metric, no NMS flip amplification; reports deltas "
                        "split by roi aspect ratio")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from htd_tpu import config as C
    from htd_tpu.models.detector import HTDDetector
    from htd_tpu.train.checkpoint import convert_mmdet_state_dict
    from htd_tpu.utils.kernel_probe import probe_and_gate
    from tests import torch_htd as TH

    probe_and_gate()

    # converted random-init torch weights (realistic layer statistics and
    # an exercised converter path; no trained checkpoint exists in-env)
    tm = TH.randomize(TH.TorchHTDDetector(depth=50), seed=1)
    sd = TH.state_dict_np(tm)
    del tm

    h, w = args.height, args.width
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.normal(0, 1, (1, h, w, 3)).astype(np.float32))
    shapes = jnp.asarray([[h - 18.0, w - 11.0]], jnp.float32)
    sfs = jnp.asarray(np.ones((1, 4), np.float32))

    if args.pre_nms:
        props = synth_proposals(1000, h - 18.0, w - 11.0)
        jprops = jnp.asarray(props[None])
        jvalid = jnp.ones((1, props.shape[0]), bool)
        aspect = (props[:, 2] - props[:, 0]) / (props[:, 3] - props[:, 1])
        elong = np.maximum(aspect, 1.0 / aspect) > 2.0
        ladder = [(4, 1), (6, 1), (8, 1), (4, 4), (8, 8)]
        results = {}
        for ms, ams in ladder:
            cfg = C.htd_r50_1x(compute_dtype=args.dtype)
            cfg = cfg.replace(roi_extractor=dataclasses.replace(
                cfg.roi_extractor, max_samples=ms, adpt_max_samples=ams))
            model = HTDDetector(cfg)
            variables = convert_mmdet_state_dict(sd, cfg)

            @jax.jit
            def run(v, im, sh, pr, pv):
                return model.apply(v, im, sh, pr, pv,
                                   method=model.stages_forward)

            try:
                boxes, scores = jax.device_get(
                    run(variables, img, shapes, jprops, jvalid))
            except Exception as e:  # noqa: BLE001
                print(f"({ms},{ams}): FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", file=sys.stderr)
                continue
            results[(ms, ams)] = (boxes[0].astype(np.float64),
                                  scores[0].astype(np.float64))
            print(f"({ms},{ams}): done", file=sys.stderr)
        ref_key = sorted(results)[-1]
        rb, rs = results[ref_key]
        out = {"mode": "pre_nms", "reference_rung": list(ref_key),
               "dtype": args.dtype, "n_rois": int(props.shape[0]),
               "n_elongated_gt2": int(elong.sum()), "rungs": {}}
        for k, (cb, cs) in results.items():
            dsc = np.abs(cs - rs).max(axis=1)       # per-roi max class-score
            dbx = np.abs(cb - rb).max(axis=1)       # per-roi max corner px
            out["rungs"][f"{k[0]},{k[1]}"] = {
                "score_mad": float(dsc.mean()),
                "score_p99": float(np.percentile(dsc, 99)),
                "score_max": float(dsc.max()),
                "box_mad_px": float(dbx.mean()),
                "box_p99_px": float(np.percentile(dbx, 99)),
                "box_max_px": float(dbx.max()),
                "score_mad_elongated": float(dsc[elong].mean()),
                "score_mad_square": float(dsc[~elong].mean()),
            }
        print(json.dumps(out, indent=1))
        return

    ladder = [(4, 1), (4, 2), (4, 4), (8, 4), (8, 8)]
    results = {}
    timings = {}
    for ms, ams in ladder:
        cfg = C.htd_r50_1x(compute_dtype=args.dtype)
        cfg = cfg.replace(roi_extractor=dataclasses.replace(
            cfg.roi_extractor, max_samples=ms, adpt_max_samples=ams))
        model = HTDDetector(cfg)
        variables = convert_mmdet_state_dict(sd, cfg)

        @jax.jit
        def run(v, im, sh, sf):
            return model.apply(v, im, sh, sf)

        @jax.jit
        def run_n(v, im, sh, sf, n):
            def body(i, acc):
                d = model.apply(v, im + i.astype(im.dtype) * 1e-9, sh, sf)
                return acc + jnp.sum(d.scores)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        try:
            dets = jax.device_get(run(variables, img, shapes, sfs))
        except Exception as e:  # noqa: BLE001 — e.g. OOM at high fidelity
            print(f"({ms},{ams}): FAILED {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr)
            continue
        v = np.asarray(dets.valid[0]) & (np.asarray(dets.scores[0])
                                         >= args.score_thr)
        results[(ms, ams)] = (
            np.asarray(dets.boxes[0])[v].astype(np.float64),
            np.asarray(dets.scores[0])[v].astype(np.float64),
            np.asarray(dets.labels[0])[v],
        )
        def timed(n):
            t0 = time.perf_counter()
            float(run_n(variables, img, shapes, sfs, n))
            return time.perf_counter() - t0

        timed(1)  # warmup (run() above already compiled the forward)
        t2 = min(timed(2) for _ in range(2))
        t8 = min(timed(8) for _ in range(2))
        timings[(ms, ams)] = (t8 - t2) / 6.0 * 1e3
        print(f"({ms},{ams}): {len(results[(ms, ams)][0])} dets "
              f">= {args.score_thr}, {timings[(ms, ams)]:.1f} ms/img",
              file=sys.stderr)

    if not results:
        print(json.dumps({"error": "no config ran"}))
        return
    ref_key = sorted(results)[-1]
    out = {"reference_rung": list(ref_key), "dtype": args.dtype,
           "rungs": {}}
    for k, dets in results.items():
        out["rungs"][f"{k[0]},{k[1]}"] = dict(
            compare(results[ref_key], dets), ms_per_img=round(timings[k], 2))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
