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

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
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


def _fast_variables(model, rng, sample_batch: TrainBatch):
    """Shape-only init: abstract-trace `model.init` (no XLA compile, no
    execution) and materialize cheap deterministic values. For smoke tests
    and compile-validation dryruns where proper initializers don't matter —
    skips the ~40 s full-forward init compile on CPU."""
    b = sample_batch.images.shape[0]
    abs_var = jax.eval_shape(
        lambda r, im, sh, sf: model.init({"params": r}, im, sh, sf),
        rng,
        sample_batch.images,
        sample_batch.img_shapes,
        jnp.ones((b, 4), jnp.float32),
    )
    # one small random pool, tiled per leaf: generating ~75M fresh gaussians
    # is ~50 s on a slow vCPU; a 64k pool + np.resize is a memcpy
    pool = (np.random.RandomState(0).standard_normal(65536) * 0.01).astype(
        np.float32
    )
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(abs_var)
    leaves = []
    for path, leaf in paths_leaves:
        name = jax.tree_util.keystr(path).lower()
        if "scale" in name or "var" in name:
            arr = np.ones(leaf.shape, leaf.dtype)
        elif "bias" in name or "mean" in name:
            arr = np.zeros(leaf.shape, leaf.dtype)
        else:
            arr = np.resize(pool, leaf.shape).astype(leaf.dtype)
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def create_train_state(
    cfg: HTDConfig,
    rng: jax.Array,
    sample_batch: TrainBatch,
    steps_per_epoch: int = 7330,
    pretrained_variables: Optional[Dict] = None,
    fast_init: bool = False,
) -> Tuple[HTDDetector, TrainState, Any]:
    """Build model, init/load variables, construct optimizer."""
    model = HTDDetector(cfg)
    if pretrained_variables is not None:
        variables = pretrained_variables
    elif fast_init:
        variables = _fast_variables(model, rng, sample_batch)
    else:
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
    state is replicated.

    The meshed path is manual SPMD (`jax.shard_map`), not GSPMD jit
    partitioning: the forward's reshape/topk-heavy roi pipeline makes the
    partitioner insert all-gathers and collective-permutes of batch-sharded
    intermediates, while DP only ever needs ONE collective. Here each device
    computes its local loss+grads, the grad vector and the loss scalars are
    packed into a single flat f32 vector, and exactly one `lax.pmean` crosses
    the mesh (the DDP-allreduce equivalent of the reference's
    MMDistributedDataParallel, apis/train.py:76-80; grad bucketing
    dist_utils.py:10-29 collapses into the single packed vector)."""
    fn = functools.partial(train_step, model, tx)
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))

    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P

    n_dev = int(np.prod(mesh.devices.shape))
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    # static (config-determined) loss-dict keys: an eval_shape abstract trace
    # of the full forward costs ~15 s on a slow host and buys nothing
    keys = sorted(model.loss_keys())

    def local_loss(params, batch_stats, lbatch, lrng):
        losses = model.apply(
            {"params": params, "batch_stats": batch_stats},
            lbatch.images,
            lbatch.img_shapes,
            lbatch.gt_boxes,
            lbatch.gt_labels,
            lbatch.gt_valid,
            method=model.forward_train,
            rngs={"sampling": lrng},
        )
        total = sum(v for k, v in losses.items() if "loss" in k)
        return total, losses

    # Program 1 — collective-free: each device computes its local grads and
    # loss scalars, packed into one flat f32 row, output sharded over 'data'.
    def grads_program(state: TrainState, batch: TrainBatch, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def per_shard(params, batch_stats, lbatch, srng):
            dev_rng = jax.random.fold_in(srng, jax.lax.axis_index("data"))
            (total, losses), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(params, batch_stats, lbatch, dev_rng)
            gflat, _ = ravel_pytree(grads)
            mflat = jnp.stack([total] + [losses[k] for k in keys])
            return jnp.concatenate([gflat, mflat.astype(gflat.dtype)])[None]

        return jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P()),
            out_specs=P("data"),
            # constant-initialized loop carries (nms fixpoint etc.) trip the
            # varying-manual-axes check; the program is plain per-device SPMD
            check_vma=False,
        )(state.params, state.batch_stats, batch, step_rng)

    # Program 2 — the ONE collective: mean over the device-sharded rows
    # (XLA lowers it to a single all-reduce — the DDP-allreduce equivalent
    # of MMDistributedDataParallel, apis/train.py:76-80; the reference's
    # grad bucketing dist_utils.py:10-29 collapses into the packed vector),
    # then unpack and apply the SGD update replicated. Keeping the
    # collective in its own short program means every device enters it with
    # all inputs ready — on CPU test meshes (virtual devices on few cores)
    # a collective at the END of the long grad program makes early-finishing
    # device threads spin-wait and starve the stragglers (measured 17x).
    def update_program(state: TrainState, packed_rows: jnp.ndarray):
        # explicit psum: GSPMD would be free to lower a mean over the
        # sharded axis as all-gather + local reduce (n_dev x the traffic)
        packed = jax.shard_map(
            lambda rows: jax.lax.psum(rows, "data")[0],
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P(),
            check_vma=False,
        )(packed_rows) / n_dev
        _, unravel = ravel_pytree(state.params)
        gsize = packed.shape[0] - (1 + len(keys))
        grads = unravel(packed[:gsize])
        metrics = {k: packed[gsize + 1 + i] for i, k in enumerate(keys)}
        metrics["loss"] = packed[gsize]
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=state.batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    g1 = jax.jit(grads_program, in_shardings=(rep, bsh, rep),
                 out_shardings=bsh)
    g2 = jax.jit(update_program, donate_argnums=(0,),
                 in_shardings=(rep, bsh), out_shardings=(rep, rep))
    is_cpu = jax.default_backend() == "cpu"

    def step(state: TrainState, batch: TrainBatch, rng: jax.Array):
        dbg = os.environ.get("HTD_STEP_DEBUG") == "1"
        t0 = time.time()
        if dbg:
            lowered = g1.lower(state, batch, rng)
            print(f"[step] g1 trace+lower {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
            compiled = lowered.compile()
            print(f"[step] g1 compile {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
        packed_rows = g1(state, batch, rng)
        if is_cpu:
            # virtual-device meshes: let every device finish program 1
            # before any enters program 2's rendezvous (see above)
            jax.block_until_ready(packed_rows)
        if dbg:
            print(f"[step] g1 {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
        out = g2(state, packed_rows)
        if dbg:
            jax.block_until_ready(out)
            print(f"[step] g2 {time.time()-t0:.1f}s", flush=True)
        return out

    return step
