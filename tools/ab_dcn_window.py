#!/usr/bin/env python
"""DCN select-MAC window fidelity A/B under inflated offsets.

The windowed DCN kernel resolves samples whose floor displacement escapes
its window via an exact correction capped at HTD_DCN_FB_CAP flagged
pixels per image per conv; the asym window (HTD_DCN_WIN=asym, 9 shifts,
+11-12% on the DCN models) narrows the in-window set. Whether either is
accuracy-safe for TRAINED models depends on offset magnitudes we cannot
observe in this environment (no trained checkpoint) — so this tool
EMULATES them: the converted random-init model's offset-conv parameters
are scaled by --offset-scale (reference init is zero; randomize() gives
~0.2 px std; trained DCNs concentrate within a few px), and the full
cascade's pre-NMS boxes/scores on fixed proposals are compared across
{exact gather, sym window, asym window} at real scale.

Usage: python tools/ab_dcn_window.py [--offset-scale 6] [--cap 128]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--offset-scale", type=float, nargs="+",
                   default=[1.0, 2.0, 4.0, 6.0])
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--cap", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.models.detector import HTDDetector
    from htd_tpu.train.checkpoint import convert_mmdet_state_dict
    from htd_tpu.utils.kernel_probe import probe_and_gate
    from tests import torch_htd as TH
    from tools.ab_fidelity import synth_proposals

    probe_and_gate()
    os.environ["HTD_DCN_FB_CAP"] = str(args.cap)

    cfg = C.htd_r101_dcn_2x(compute_dtype="bfloat16")
    tm = TH.randomize(
        TH.TorchHTDDetector(depth=101,
                            stage_with_dcn=(False, True, True, True)),
        seed=1)
    sd = TH.state_dict_np(tm)
    del tm
    variables = convert_mmdet_state_dict(sd, cfg)
    model = HTDDetector(cfg)

    def scale_offsets(vs, f):
        """Multiply every DCN offset-conv param by f (offsets scale
        linearly); same pytree structure -> no recompilation."""
        def walk(tree, path):
            if isinstance(tree, dict):
                return {
                    k: walk(v, path + [k]) for k, v in tree.items()
                }
            return tree * f if "conv_offset" in path else tree
        return dict(vs, params=walk(vs["params"], []))

    h, w = args.height, args.width
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.normal(0, 1, (1, h, w, 3)).astype(np.float32))
    shapes = jnp.asarray([[h - 18.0, w - 11.0]], jnp.float32)
    props = synth_proposals(1000, h - 18.0, w - 11.0)
    jprops = jnp.asarray(props[None])
    jvalid = jnp.ones((1, props.shape[0]), bool)

    results = {}
    for name, env in (("gather", {"HTD_DCN_IMPL": "gather"}),
                      ("sym", {"HTD_DCN_IMPL": "pallas"}),
                      ("asym", {"HTD_DCN_IMPL": "pallas",
                                "HTD_DCN_WIN": "asym"})):
        os.environ.pop("HTD_DCN_WIN", None)
        for kk, vv in env.items():
            os.environ[kk] = vv

        @jax.jit
        def run(v, im, sh, pr, pv):
            return model.apply(v, im, sh, pr, pv,
                               method=model.stages_forward)

        for f in args.offset_scale:
            boxes, scores = jax.device_get(
                run(scale_offsets(variables, f), img, shapes, jprops,
                    jvalid))
            results[(name, f)] = (boxes[0].astype(np.float64),
                                  scores[0].astype(np.float64))
            print(f"{name} x{f}: done", file=sys.stderr)
        os.environ.pop("HTD_DCN_WIN", None)

    out = {"offset_scales": args.offset_scale, "cap": args.cap,
           "n_rois": int(props.shape[0]), "rungs": {}}
    for f in args.offset_scale:
        rb, rs = results[("gather", f)]
        for name in ("sym", "asym"):
            cb, cs = results[(name, f)]
            dsc = np.abs(cs - rs).max(axis=1)
            dbx = np.abs(cb - rb).max(axis=1)
            out["rungs"][f"{name} x{f}"] = {
                "score_mad": float(dsc.mean()),
                "score_p99": float(np.percentile(dsc, 99)),
                "score_max": float(dsc.max()),
                "box_mad_px": float(dbx.mean()),
                "box_max_px": float(dbx.max()),
            }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
