"""The pjit-compiled data-parallel train step + train state.

Replaces the reference's runtime engine (EpochBasedRunner + OptimizerHook +
MMDistributedDataParallel, apis/train.py:35-150): one jit-compiled function
carries forward, loss aggregation (`_parse_losses` semantics: total = sum of
entries whose key contains 'loss'; base.py:184-223), backward, and the SGD
update. Under a data mesh the gradient all-reduce is inserted by XLA.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from htd_tpu.config import HTDConfig
from htd_tpu.models.detector import HTDDetector
from htd_tpu.parallel.mesh import batch_sharding, replicated
from htd_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any          # frozen BN stats (never updated)
    opt_state: Any


class TrainBatch(NamedTuple):
    images: jnp.ndarray         # (B, H, W, 3)
    img_shapes: jnp.ndarray     # (B, 2)
    gt_boxes: jnp.ndarray       # (B, G, 4)
    gt_labels: jnp.ndarray      # (B, G)
    gt_valid: jnp.ndarray       # (B, G)


def create_train_state(
    cfg: HTDConfig,
    rng: jax.Array,
    sample_batch: TrainBatch,
    steps_per_epoch: int = 7330,
    pretrained_variables: Optional[Dict] = None,
) -> Tuple[HTDDetector, TrainState, Any]:
    """Build model, init/load variables, construct optimizer."""
    model = HTDDetector(cfg)
    if pretrained_variables is None:
        b = sample_batch.images.shape[0]
        init_fn = jax.jit(
            lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf)
        )
        variables = init_fn(
            rng,
            sample_batch.images,
            sample_batch.img_shapes,
            jnp.ones((b, 4), jnp.float32),
        )
    else:
        variables = pretrained_variables
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg.train, params, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
    return model, state, tx


def train_step(
    model: HTDDetector,
    tx,
    state: TrainState,
    batch: TrainBatch,
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step. jit this with donate_argnums for `state`."""
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        losses = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch.images,
            batch.img_shapes,
            batch.gt_boxes,
            batch.gt_labels,
            batch.gt_valid,
            method=model.forward_train,
            rngs={"sampling": step_rng},
        )
        total = sum(v for k, v in losses.items() if "loss" in k)
        return total, losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(losses)
    metrics["loss"] = total
    new_state = TrainState(
        step=state.step + 1,
        params=new_params,
        batch_stats=state.batch_stats,
        opt_state=new_opt_state,
    )
    return new_state, metrics


def make_jitted_train_step(model: HTDDetector, tx, mesh=None):
    """jit the train step; with a mesh, batch is sharded over 'data' and the
    state is replicated (gradients all-reduce over ICI automatically)."""
    fn = functools.partial(train_step, model, tx)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        fn,
        donate_argnums=(0,),
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
    )
