"""End-to-end training driver (reference train.py:20-64 equivalent).

Single SPMD program per step over the data mesh; epoch structure, val
interval, checkpointing and logging mirror the reference's Lightning setup:
- val every TRAINING.VAL_INTERVAL fraction of an epoch, limited to
  TRAINING.VAL_BATCHES batches,
- top-5-by-val-loss + 'last' checkpoints,
- scalar channels identical to the reference's TensorBoard names.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from mapfree_tpu.data import DataModule
from mapfree_tpu.models import build_regression_net
from mapfree_tpu.parallel import make_mesh, shard_batch
from mapfree_tpu.train.loop import (
    CheckpointManager,
    ScalarLogger,
    check_finite_or_die,
    run_validation,
)
from mapfree_tpu.train.state import (
    init_state,
    make_train_step,
    make_val_step,
)
from mapfree_tpu.utils.data import prefetch_to_device

_TRAIN_KEYS = ("image0", "image1", "T_0to1")
_DEVICE_POSE_KEYS = ("abs_q_1_w2c_device", "abs_c_1_c2w_device")


def _train_keys(net) -> tuple:
    """Batch keys the training step consumes. The multi-frame FUSION net
    additionally needs the device-tracking poses (models/regression.py
    RegressionMultiFrameFusionNet; reference train.py:29-31 trains its
    MultiFrame variant from the same CLI)."""
    if getattr(net, "needs_device_poses", False):
        return _TRAIN_KEYS + _DEVICE_POSE_KEYS
    return _TRAIN_KEYS


def _device_batch(batch, mesh, pad_to: int, keys=_TRAIN_KEYS):
    """Keep numeric training keys, pad the leading axis to the compiled batch
    size, and shard over the mesh."""
    out = {}
    for k in keys:
        x = np.asarray(batch[k])
        if x.dtype == np.float64:  # pose metadata loads f64; train in f32
            x = x.astype(np.float32)
        if x.shape[0] < pad_to:
            reps = np.zeros((pad_to - x.shape[0],) + x.shape[1:], x.dtype)
            if k == "abs_q_1_w2c_device":  # quaternions stay unit-norm
                reps[..., 0] = 1.0
            x = np.concatenate([x, reps])
        out[k] = x
    return shard_batch(out, mesh)


def fit(cfg, experiment: str = "default", resume: str | None = None,
        weights_dir: str = "weights", max_steps: int | None = None):
    mesh = make_mesh(cfg)
    n_dev = int(np.prod([s for s in mesh.devices.shape]))
    batch_size = int(cfg.TRAINING.BATCH_SIZE)
    if batch_size % n_dev != 0:
        batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev
        print(f"[fit] rounding batch size up to {batch_size} for {n_dev} devices")
        cfg.TRAINING.BATCH_SIZE = batch_size

    datamodule = DataModule(cfg)
    train_loader = datamodule.train_dataloader()
    val_loader = datamodule.val_dataloader()

    net = build_regression_net(cfg)
    rng = jax.random.PRNGKey(int(cfg.TPU.SEED))
    train_keys = _train_keys(net)

    sample = next(iter(train_loader))
    init_batch = {
        k: np.asarray(sample[k], np.float32)
        if np.asarray(sample[k]).dtype == np.float64 else np.asarray(sample[k])
        for k in train_keys
    }
    state = init_state(net, cfg, rng, init_batch)

    ckpt_dir = Path(weights_dir) / experiment
    ckpts = CheckpointManager(ckpt_dir, top_k=5)
    logger = ScalarLogger(weights_dir, experiment)
    if resume:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), state
        )
        state = ckpts.restore(abstract, tag=resume)
        print(f"[fit] resumed from {resume} at step {int(state.step)}")

    train_step = make_train_step(net, cfg, mesh=mesh)
    val_step = make_val_step(net, cfg, mesh=mesh)

    steps_per_epoch = len(train_loader)
    val_every = max(1, int(steps_per_epoch * float(cfg.TRAINING.VAL_INTERVAL or 1.0)))
    val_batches = int(cfg.TRAINING.VAL_BATCHES or 0) or None
    log_every = int(cfg.TRAINING.LOG_INTERVAL or 50)

    def validate():
        batches = []
        for i, vb in enumerate(val_loader):
            if val_batches is not None and i >= val_batches:
                break
            batches.append(_device_batch(vb, mesh, batch_size, train_keys))
        logs = run_validation(val_step, state, batches)
        return logs

    # optional jax.profiler trace of the first few steps (SURVEY.md §5:
    # the reference has no tracing; the TPU build exposes one)
    profile_dir = cfg.TPU.PROFILE_DIR
    profile_until = None
    if profile_dir:
        jax.profiler.start_trace(str(profile_dir))
        profile_until = int(state.step) + 20

    def _transfer(batch):
        dbatch = _device_batch(batch, mesh, batch_size, train_keys)
        jax.block_until_ready(dbatch)  # fence: see utils.data.prefetch_to_device
        return dbatch

    step = int(state.step)
    t_start = time.time()
    for epoch in range(int(cfg.TRAINING.EPOCHS)):
        # batch k+1's H2D overlaps batch k's (async) step dispatch
        for dbatch in prefetch_to_device(train_loader, _transfer):
            state, logs = train_step(state, dbatch)
            step += 1

            if profile_until is not None and step >= profile_until:
                jax.profiler.stop_trace()
                profile_until = None
                print(f"[fit] profiler trace written to {profile_dir}")

            if step % log_every == 0:
                host_logs = {k: float(v) for k, v in logs.items()}
                check_finite_or_die(host_logs["train/loss"], step)
                rate = step * batch_size / (time.time() - t_start)
                host_logs["train/samples_per_sec"] = rate
                logger.log(step, host_logs)
                print(f"[e{epoch} s{step}] loss={host_logs['train/loss']:.4f} "
                      f"({rate:.1f} samples/s)")

            if step % val_every == 0:
                vlogs = validate()
                if vlogs:
                    logger.log(step, vlogs)
                    ckpts.save(state, step, val_loss=vlogs["val_loss/loss"])
                    print(f"[e{epoch} s{step}] val_loss={vlogs['val_loss/loss']:.4f}")

            if max_steps is not None and step >= max_steps:
                ckpts.save(state, step)
                return state

        ckpts.save(state, step)  # epoch-end 'last'
    return state
