#!/usr/bin/env python
"""Train HTD on COCO (TPU data-parallel).

Equivalent of the reference tools/train.py + apis/train.py engine: epoch
loop, per-iteration jitted train step, periodic json-line logging
(TextLoggerHook analog), per-epoch checkpoint + val mAP (EvalHook analog).

Usage:
  python tools/train.py --config htd_r50_1x \
      --train-ann annotations/instances_train2017.json --train-img train2017 \
      --val-ann annotations/instances_val2017.json --val-img val2017 \
      --work-dir work_dirs/htd_r50 [--pretrained backbone.pth]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="htd_r50_1x")
    p.add_argument("--train-ann", required=True)
    p.add_argument("--train-img", default="")
    p.add_argument("--val-ann", default=None)
    p.add_argument("--val-img", default="")
    p.add_argument("--work-dir", default="work_dirs/htd")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--pretrained", default=None, help="mmdet .pth (backbone or full)")
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--bf16", action="store_true")
    p.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize() for multi-host training "
             "(TPU pods; the reference's dist_train.sh/slurm equivalent)",
    )
    p.add_argument(
        "--set", dest="cfg_options", nargs="+", default=[],
        help="config overrides as dotted.path=value (the reference's "
             "--cfg-options), e.g. --set train.lr=0.01 compute_dtype=bfloat16",
    )
    p.add_argument(
        "--mstrain", action="store_true",
        help="force multi-scale train (short side uniform in [400,1400], "
             "long 1600) even if the config preset doesn't carry a range; "
             "the mstrain presets enable this automatically",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.multihost:
        jax.distributed.initialize()
    from htd_tpu.utils.kernel_probe import probe_and_gate

    probe_and_gate(train=True)
    import jax.numpy as jnp

    from htd_tpu import config as C
    from htd_tpu.data.coco import (
        CocoDataset,
        grouped_batches,
        make_train_batch,
        sample_mstrain_scale,
    )
    from htd_tpu.parallel.mesh import (
        host_slice,
        make_global_batch,
        make_mesh,
        replicated,
    )
    from htd_tpu.train.checkpoint import (
        load_torch_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from htd_tpu.train.train_step import (
        TrainBatch,
        create_train_state,
        make_jitted_train_step,
    )

    cfg = getattr(C, args.config)()
    if args.bf16:
        cfg = cfg.replace(compute_dtype="bfloat16")
    if args.cfg_options:
        cfg = C.apply_overrides(cfg, args.cfg_options)
    os.makedirs(args.work_dir, exist_ok=True)
    # archive the resolved config (reference tools/train.py:124 cfg.dump)
    if jax.process_index() == 0:
        with open(os.path.join(args.work_dir, "config.json"), "w") as f:
            f.write(C.dump_config(cfg))

    dataset = CocoDataset(args.train_ann, args.train_img, test_mode=False)
    steps_per_epoch = max(len(dataset) // args.batch_size, 1)
    print(f"train images: {len(dataset)}, steps/epoch: {steps_per_epoch}")

    rng = np.random.RandomState(args.seed)
    first = next(grouped_batches(dataset, args.batch_size, shuffle=True, seed=0))
    sample = make_train_batch(dataset, first[:1], max_gt=cfg.train.max_gt, rng=rng)
    sample_batch = TrainBatch(
        images=jnp.asarray(sample["images"]),
        img_shapes=jnp.asarray(sample["img_shapes"]),
        gt_boxes=jnp.asarray(sample["gt_boxes"]),
        gt_labels=jnp.asarray(sample["gt_labels"]),
        gt_valid=jnp.asarray(sample["gt_valid"]),
    )

    pretrained = None
    if args.pretrained:
        pretrained = load_torch_checkpoint(args.pretrained, cfg)

    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(args.seed), sample_batch,
        steps_per_epoch=steps_per_epoch,
        pretrained_variables=None,
    )
    if pretrained is not None:
        from htd_tpu.train.checkpoint import merge_pretrained

        merged = merge_pretrained(
            {"params": state.params, "batch_stats": state.batch_stats},
            pretrained,
        )
        state = state._replace(
            params=merged["params"],
            batch_stats=merged["batch_stats"],
            opt_state=tx.init(merged["params"]),
        )

    start_epoch = 0
    if args.resume_from:
        state = restore_checkpoint(args.resume_from, state)
        # reference runner.resume() restores epoch+iter (apis/train.py:146-149);
        # our step counter is persisted, so the epoch position derives from it
        start_epoch = int(state.step) // steps_per_epoch
        print(f"resumed at step {int(state.step)} -> epoch {start_epoch}")

    mesh = make_mesh()
    step_fn = make_jitted_train_step(model, tx, mesh=mesh)
    state = jax.device_put(state, replicated(mesh))
    base_rng = jax.random.PRNGKey(args.seed + 1)

    mstrain_range = cfg.train.mstrain_range
    if args.mstrain and mstrain_range is None:
        mstrain_range = ((1600, 400), (1600, 1400))

    log_path = os.path.join(args.work_dir, "train.log.json")
    t0 = time.time()
    for epoch in range(start_epoch, cfg.train.total_epochs):
        # per-epoch-seeded aug stream (scale sampling, flips): resume at
        # epoch k reproduces the uninterrupted run's schedule exactly
        # (DistributedGroupSampler's set_epoch semantics, group_sampler.py:75)
        rng = np.random.RandomState(args.seed * 100003 + epoch)
        for it, records in enumerate(
            grouped_batches(dataset, args.batch_size, shuffle=True,
                            seed=args.seed + epoch, drop_last=True)
        ):
            scale = (
                sample_mstrain_scale(rng, mstrain_range)
                if mstrain_range is not None
                else cfg.train.img_scale
            )
            # flips drawn for the GLOBAL batch from the shared epoch stream,
            # then each host loads only its slice — every process sees the
            # same schedule, so the global batch is identical to the
            # single-process run (DistributedGroupSampler determinism).
            flips = rng.rand(len(records)) < 0.5
            local = host_slice(records)
            local_flips = host_slice(list(flips))
            np_batch = make_train_batch(
                dataset, local, scale=scale, max_gt=cfg.train.max_gt,
                flips=local_flips,
            )
            batch = make_global_batch(mesh, TrainBatch(
                images=np_batch["images"],
                img_shapes=np_batch["img_shapes"],
                gt_boxes=np_batch["gt_boxes"],
                gt_labels=np_batch["gt_labels"],
                gt_valid=np_batch["gt_valid"],
            ))
            state, metrics = step_fn(state, batch, base_rng)
            if (it + 1) % args.log_interval == 0 and jax.process_index() == 0:
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                m.update(epoch=epoch + 1, iter=it + 1,
                         time=round(time.time() - t0, 1))
                print(json.dumps(m))
                with open(log_path, "a") as f:
                    f.write(json.dumps(m) + "\n")
        ckpt = os.path.join(args.work_dir, f"epoch_{epoch + 1}")
        if jax.process_index() == 0:
            save_checkpoint(ckpt, jax.device_get(state))
            print(f"saved {ckpt}")
        if args.val_ann and jax.process_index() == 0:
            from htd_tpu.apis import evaluate_dataset
            from htd_tpu.data.coco import CocoDataset as CD

            val = CD(args.val_ann, args.val_img, test_mode=True)
            metrics = evaluate_dataset(
                model,
                {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)},
                val,
                batch_size=args.batch_size,
            )
            print(json.dumps({"epoch": epoch + 1, **{k: round(v, 4) for k, v in metrics.items()}}))


if __name__ == "__main__":
    main()
