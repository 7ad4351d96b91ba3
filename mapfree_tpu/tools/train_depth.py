"""GT-depth-supervised training for the in-graph MonoDepthNet.

The reference's matching track consumes OFFLINE monocular depth (DPT /
PlaneRCNN pngs, reference README.md:325-339) — trained depth is an input
contract. The TPU framework's in-graph path (models/depth.py, the
``*_ingraph.yaml`` configs) needs an orbax checkpoint for
``DEPTH_NET.CHECKPOINT``; this tool produces it by supervising
MonoDepthNet on scenes that carry GT depth pngs (``*.<suffix>.png``,
16-bit millimetres — the MapFree/ScanNet format).

Loss: masked L1 on log-depth (scale-aware; valid where GT > 0), both pair
views folded into one conv batch per step.

Usage::

    python -m mapfree_tpu.tools.train_depth configs/mapfree.yaml \
        --data_root data/mapfree --depth_suffix gt \
        --steps 2000 --batch 8 --out weights/depth

Then point any ``*_ingraph.yaml`` run at it::

    python submission.py configs/matching/mapfree/sift_emat_ingraph.yaml \
        DEPTH_NET.CHECKPOINT weights/depth
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.data import DataLoader, MapFreeDataset
from mapfree_tpu.models.depth import MonoDepthNet


def depth_loss(pred, gt):
    """Masked L1 on log-depth: scale-aware, ignores invalid (<=0) GT."""
    valid = gt > 1e-3
    err = jnp.abs(jnp.log(jnp.maximum(pred, 1e-3))
                  - jnp.log(jnp.maximum(gt, 1e-3)))
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, err, 0.0).sum() / n


def make_step(net, tx):
    def step(params, batch_stats, opt_state, images, gt):
        def loss_fn(p):
            (pred, mutated) = net.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"])
            return depth_loss(pred, gt), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1, 2))


def fold_batch(batch):
    """Fold both pair views into one [2B, H, W, 3] image / [2B, H, W] depth
    conv batch (each view is an independent supervision sample)."""
    images = np.concatenate(
        [np.asarray(batch["image0"]), np.asarray(batch["image1"])])
    depths = np.concatenate(
        [np.asarray(batch["depth0"]), np.asarray(batch["depth1"])])
    if images.dtype != np.uint8:
        images = images.astype(np.float32)
    return images, depths.astype(np.float32)


def train(cfg, data_root: str, depth_suffix: str, out: str,
          steps: int = 1000, batch: int = 8, lr: float = 1e-4,
          mode: str = "train", log_every: int = 50):
    cfg = cfg.clone()
    cfg.DATASET.DATA_ROOT = data_root
    cfg.DATASET.ESTIMATED_DEPTH = depth_suffix
    if cfg.DATASET.MIN_OVERLAP_SCORE is None:
        cfg.DATASET.MIN_OVERLAP_SCORE = 0.0
        cfg.DATASET.MAX_OVERLAP_SCORE = 1.0

    dataset = MapFreeDataset(cfg, mode)
    loader = DataLoader(dataset, batch_size=batch, shuffle=True,
                        num_workers=int(cfg.TRAINING.NUM_WORKERS or 2))

    dcfg = cfg.DEPTH_NET
    blocks = tuple(int(b) for b in str(dcfg.NUM_BLOCKS).split("-"))
    dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
             else jnp.float32)
    net = MonoDepthNet(num_blocks=blocks, max_depth=float(dcfg.MAX_DEPTH),
                      dtype=dtype)

    images0, _ = fold_batch(next(iter(loader)))
    variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                  jnp.asarray(images0[:1]))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step_fn = make_step(net, tx)

    n = 0
    last_loss = float("nan")
    while n < steps:
        for b in loader:
            if n >= steps:
                break
            images, gt = fold_batch(b)
            params, batch_stats, opt_state, loss = step_fn(
                params, batch_stats, opt_state, jnp.asarray(images),
                jnp.asarray(gt))
            n += 1
            if n % log_every == 0 or n == steps:
                last_loss = float(loss)
                print(f"[train_depth s{n}] log-L1={last_loss:.4f}")

    import orbax.checkpoint as ocp

    out_path = Path(out).absolute()
    if out_path.exists():
        import shutil

        shutil.rmtree(out_path)
    ocp.StandardCheckpointer().save(
        out_path, {"params": jax.device_get(params),
                   "batch_stats": jax.device_get(batch_stats)})
    print(f"[train_depth] checkpoint written to {out_path} "
          f"(final log-L1 {last_loss:.4f})")
    return out_path, last_loss


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset_config", help="dataset yaml (e.g. configs/mapfree.yaml)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--depth_suffix", default="gt",
                   help="depth png suffix to supervise on (gt = sensor depth)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--mode", default="train", choices=["train", "val"])
    p.add_argument("--out", default="weights/depth")
    args = p.parse_args()

    cfg = default_cfg.clone()
    cfg.merge_from_file(args.dataset_config)
    train(cfg, args.data_root, args.depth_suffix, args.out,
          steps=args.steps, batch=args.batch, lr=args.lr, mode=args.mode)


if __name__ == "__main__":
    main()
