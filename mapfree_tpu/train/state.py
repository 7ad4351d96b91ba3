"""Train state, optimizer, and jitted SPMD train/val steps.

Replaces the reference's PyTorch-Lightning machinery
(reference: lib/models/regression/model.py:87-187, train.py:53-64) with a pure
functional design:

- one ``TrainState`` pytree (params, batch_stats, opt_state, step),
- ``make_train_step``: a single jit-compiled SPMD program over the device
  mesh; the batch is sharded on the ``data`` axis, gradients are reduced by
  compiler-inserted all-reduce. BatchNorm statistics are computed over the
  full logical batch (jit-SPMD gives synchronized BN for free).
- optimizer: Adam(eps=1e-6) + StepLR-equivalent staircase decay + optional
  global-norm clipping (reference model.py:180-187, train.py:61).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mapfree_tpu.losses import combined_loss
from mapfree_tpu.metrics import pose_error
from mapfree_tpu.parallel.mesh import DATA_AXIS, Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(tcfg) -> Callable:
    lr = float(tcfg.LR)
    if tcfg.LR_STEP_INTERVAL:
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=int(tcfg.LR_STEP_INTERVAL),
            decay_rate=float(tcfg.LR_STEP_GAMMA),
            staircase=True,
        )
    return optax.constant_schedule(lr)


def make_optimizer(tcfg) -> optax.GradientTransformation:
    schedule = make_lr_schedule(tcfg)
    tx = optax.adam(schedule, eps=1e-6)
    if tcfg.GRAD_CLIP and float(tcfg.GRAD_CLIP) > 0:
        tx = optax.chain(optax.clip_by_global_norm(float(tcfg.GRAD_CLIP)), tx)
    return tx


def init_state(net, cfg, rng, sample_batch) -> TrainState:
    variables = net.init(
        rng, sample_batch["image0"], sample_batch["image1"], train=True,
        **_net_kwargs(net, sample_batch),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg.TRAINING)
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def _net_kwargs(net, batch) -> dict:
    """Extra inputs some models consume (multi-frame fusion: device poses)."""
    if getattr(net, "needs_device_poses", False):
        return {
            "q_device": batch["abs_q_1_w2c_device"],
            "t_device": batch["abs_c_1_c2w_device"],
        }
    return {}


def _forward_loss(net, cfg, params, batch_stats, batch, train: bool):
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = _net_kwargs(net, batch)
    if train:
        (R, t, aux), mutated = net.apply(
            variables, batch["image0"], batch["image1"], train=True,
            mutable=["batch_stats"], **kwargs,
        )
        new_batch_stats = mutated["batch_stats"]
    else:
        R, t, aux = net.apply(variables, batch["image0"], batch["image1"],
                              train=False, **kwargs)
        new_batch_stats = batch_stats

    preds = dict(aux)
    preds["R"] = R
    preds["t"] = t
    lam = float(cfg.TRAINING.LAMBDA)
    s_r = aux.get("s_r")
    s_t = aux.get("s_t")
    R_loss, t_loss, loss = combined_loss(
        preds, batch, cfg.TRAINING.ROT_LOSS, cfg.TRAINING.TRANS_LOSS, lam,
        s_r=s_r, s_t=s_t,
    )
    return loss, (R_loss, t_loss, R, t, new_batch_stats, preds)


def make_train_step(net, cfg, mesh: Mesh | None = None, donate: bool = True):
    tx = make_optimizer(cfg.TRAINING)
    from mapfree_tpu.data.augment import make_device_augment

    augment = make_device_augment(cfg)
    aug_seed = int(cfg.TPU.SEED)

    def train_step(state: TrainState, batch):
        if augment is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed), state.step)
            batch = augment(key, batch)

        def loss_fn(params):
            return _forward_loss(net, cfg, params, state.batch_stats, batch, True)

        (loss, (R_loss, t_loss, _, _, new_bs, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        logs = {
            "train/R_loss": R_loss,
            "train/t_loss": t_loss,
            "train/loss": loss,
        }
        if float(cfg.TRAINING.LAMBDA) == 0.0:
            logs["train/s_R"] = state.params["s_r"][0]
            logs["train/s_t"] = state.params["s_t"][0]
        return new_state, logs

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        in_shardings=(replicated, sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_val_step(net, cfg, mesh: Mesh | None = None):
    """Per-batch validation: losses + per-sample pose errors
    (reference model.py:99-112)."""

    def val_step(state: TrainState, batch):
        loss, (R_loss, t_loss, R, t, _, _) = _forward_loss(
            net, cfg, state.params, state.batch_stats, batch, False
        )
        outputs = pose_error(R, t, batch["T_0to1"])
        outputs["R_loss"] = R_loss
        outputs["t_loss"] = t_loss
        outputs["loss"] = loss
        return outputs

    if mesh is None:
        return jax.jit(val_step)
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(val_step, in_shardings=(replicated, sharded))


def make_predict_step(net, cfg, mesh: Mesh | None = None):
    """Batched inference returning (R, t) — the submission-sweep kernel."""

    def predict(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        R, t, _ = net.apply(variables, batch["image0"], batch["image1"],
                            train=False, **_net_kwargs(net, batch))
        return R, t

    if mesh is None:
        return jax.jit(predict)
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        predict,
        in_shardings=(replicated, sharded),
        out_shardings=(sharded, sharded),
    )
