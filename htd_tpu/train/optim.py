"""Optimizer + LR schedule.

Behavioral spec: the reference's schedule_1x/2x + default optimizer
(SGD lr .02 momentum .9 wd 1e-4, linear warmup 500 iters at ratio 1/3,
step decay x0.1 at the configured epochs) and `frozen_stages=1` backbone
freezing (resnet.py:573-589): stem + layer1 get no updates.

Grad clipping: every HTD config sets optimizer_config=dict(grad_clip=None)
(htd_resnet101_2x.py:120 et al.), so the default is no clipping; an l2
global-norm clip is available as an explicit opt-in via
TrainConfig.grad_clip_norm.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import optax

from htd_tpu.config import TrainConfig

FROZEN_PREFIXES_STAGE1 = ("conv1", "bn1", "layer1_")


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Linear warmup then step decay, evaluated per iteration."""
    boundaries = [e * steps_per_epoch for e in cfg.lr_steps]

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / max(cfg.warmup_iters, 1), 0.0, 1.0)
        warm = cfg.lr * (cfg.warmup_ratio + (1 - cfg.warmup_ratio) * warm_frac)
        decay = jnp.ones(())
        for b in boundaries:
            decay = decay * jnp.where(step >= b, 0.1, 1.0)
        return warm * decay

    return fn


def trainable_mask(params, frozen_stages: int = 1):
    """True for trainable leaves. Mirrors frozen_stages semantics: the
    backbone stem and stages [0, frozen_stages) are frozen."""
    frozen_prefixes = ["conv1", "bn1"]
    for s in range(frozen_stages):
        frozen_prefixes.append(f"layer{s + 1}_")

    def leaf_mask(path, _):
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys and keys[0] == "backbone" and len(keys) > 1:
            name = keys[1]
            if any(name.startswith(p) for p in frozen_prefixes):
                return False
        return True

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def make_optimizer(cfg: TrainConfig, params, steps_per_epoch: int):
    """torch-SGD-equivalent chain: clip -> wd -> momentum -> -lr; frozen
    leaves (stem + frozen stages) get zero updates via multi_transform."""
    mask = trainable_mask(params)
    chain = [optax.add_decayed_weights(cfg.weight_decay)]
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        # reference OptimizerHook clips raw grads before the step
        chain.insert(0, optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(optax.trace(decay=cfg.momentum, nesterov=False))
    chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(cfg, steps_per_epoch)(s)))
    tx = optax.chain(*chain)
    labels = jax.tree_util.tree_map(
        lambda trainable: "train" if trainable else "frozen", mask
    )
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )
