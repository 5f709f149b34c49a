#!/usr/bin/env python
"""Op-level xplane profile of an HTD inference pipeline prefix on TPU.

Runs `model.profile_prefix(upto)` (see tools/bench_stages.py for the
prefix names) under `jax.profiler.trace`, parses the XPlane protobuf
(tensorflow.tsl.profiler.protobuf.xplane_pb2) and prints ops sorted by
total self-time. This is the tool that diagnosed the round-3 layout war
(PERF.md "Round 3 resolved").

Usage:
    python tools/profile_trace.py --upto full --top 40
    python tools/profile_trace.py --upto stage0_extract --reps 20
"""

import argparse
import collections
import glob
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_xplane(logdir, top=40, min_us=20.0, substr=None):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        print(f"no xplane.pb under {logdir}", file=sys.stderr)
        return
    path = paths[-1]
    data = open(path, "rb").read()
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    space = xplane_pb2.XSpace()
    space.ParseFromString(data)

    # accumulate event durations per (plane line, event name) on TPU planes
    per_op = collections.Counter()
    counts = collections.Counter()
    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            lname = line.name
            # The synchronous 'XLA Ops' line is the core's serial timeline.
            # 'Async XLA Ops' (DMA engine, overlaps compute) must NOT be
            # summed with it — substring match on 'XLA Ops' caught it too.
            if lname != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                per_op[name] += ev.duration_ps / 1e6  # -> us
                counts[name] += 1
    total = sum(per_op.values())
    print(f"\n== {path}")
    print(f"total device op-time: {total/1000.0:.3f} ms")
    print(f"{'us total':>10s} {'n':>5s}  op")
    shown = 0
    for name, us in per_op.most_common():
        if us < min_us:
            break
        if substr and substr not in name:
            continue
        print(f"{us:10.1f} {counts[name]:5d}  {name[:140]}")
        shown += 1
        if shown >= top:
            break


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--upto", default="full")
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--min-us", type=float, default=20.0)
    p.add_argument("--grep", default=None)
    p.add_argument("--logdir", default="/tmp/htd_prof")
    p.add_argument("--parse-only", action="store_true",
                   help="just re-parse an existing logdir")
    p.add_argument("--train", action="store_true",
                   help="profile the full train step instead of an "
                        "inference prefix (--upto is ignored)")
    args = p.parse_args()

    if args.parse_only:
        parse_xplane(args.logdir, args.top, args.min_us, args.grep)
        return

    import jax
    import jax.numpy as jnp

    from htd_tpu.utils.kernel_probe import probe_and_gate

    probe_and_gate()

    from htd_tpu import config as C
    from htd_tpu.models.detector import HTDDetector

    cfg = getattr(C, args.config)(compute_dtype="bfloat16")
    model = HTDDetector(cfg)
    b, h, w = args.batch_size, args.height, args.width
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.normal(0, 1, (b, h, w, 3)).astype(np.float32))
    shapes = jnp.asarray(np.tile([[h - 50.0, w - 11.0]], (b, 1)).astype(np.float32))
    sfs = jnp.asarray(np.ones((b, 4), np.float32))

    if args.train:
        from htd_tpu.train.train_step import (
            TrainBatch, create_train_state, train_step,
        )

        max_gt = cfg.train.max_gt
        gt_boxes = np.zeros((b, max_gt, 4), np.float32)
        gt_valid = np.zeros((b, max_gt), bool)
        gt_labels = np.zeros((b, max_gt), np.int32)
        for i in range(b):
            for g in range(8):
                x1, y1 = rng.uniform(0, w - 80), rng.uniform(0, h - 80)
                gt_boxes[i, g] = [
                    x1, y1, x1 + rng.uniform(30, 70), y1 + rng.uniform(30, 70)
                ]
                gt_labels[i, g] = rng.randint(0, cfg.num_classes)
                gt_valid[i, g] = True
        batch = TrainBatch(
            images=images, img_shapes=shapes,
            gt_boxes=jnp.asarray(gt_boxes), gt_labels=jnp.asarray(gt_labels),
            gt_valid=jnp.asarray(gt_valid),
        )
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=1000
        )

        @jax.jit
        def train_run(st, img):
            b2 = batch._replace(images=img)
            st2, _ = train_step(model, tx, st, b2, jax.random.PRNGKey(0))
            return st2

        # warm (compile) outside the trace
        state = jax.block_until_ready(train_run(state, images))
        os.makedirs(args.logdir, exist_ok=True)
        with jax.profiler.trace(args.logdir):
            for i in range(args.reps):
                state = train_run(state, images + np.float32(i) * 1e-9)
            jax.block_until_ready(state)
        print(f"ran {args.reps} reps of the train step")
        parse_xplane(args.logdir, args.top, args.min_us, args.grep)
        print(f"\nNOTE: 'us total' sums over {args.reps} reps — divide by "
              f"{args.reps} for per-iteration time.")
        return

    init_fn = jax.jit(lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf))
    variables = init_fn(jax.random.PRNGKey(0), images, shapes, sfs)

    upto = args.upto

    @jax.jit
    def run(vs, img):
        return model.apply(vs, img, shapes, sfs, upto,
                           method=model.profile_prefix)

    # warm (compile) outside the trace
    float(run(variables, images))

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        acc = 0.0
        for i in range(args.reps):
            acc += float(run(variables, images + np.float32(i) * 1e-9))
    print(f"ran {args.reps} reps of prefix '{upto}' (acc={acc:.3f})")
    parse_xplane(args.logdir, args.top, args.min_us, args.grep)
    print(f"\nNOTE: 'us total' sums over {args.reps} reps — divide by "
          f"{args.reps} for per-iteration time.")


if __name__ == "__main__":
    main()
