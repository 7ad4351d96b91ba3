"""Submission CLI (reference submission.py equivalent): runs the model over
the val/test split in device-sized batches and writes submission.zip."""

import argparse
from pathlib import Path

from mapfree_tpu.config import cfg
from mapfree_tpu.data import DataModule
from mapfree_tpu.models.builder import build_model
from mapfree_tpu.utils.submission import predict, save_submission


def eval(args):
    cfg.merge_from_file(args.dataset_config)
    cfg.merge_from_file(args.config)

    import jax

    if args.num_hosts or jax.process_count() > 1:
        # pod-scale sweep: shard the scene list over hosts (DCN only touches
        # the final merge on the shared filesystem; see parallel/multihost.py)
        from jax.experimental import multihost_utils

        from mapfree_tpu.parallel import run_sharded_sweep

        barrier = (multihost_utils.sync_global_devices
                   if jax.process_count() > 1 else None)
        args.output_root.mkdir(parents=True, exist_ok=True)
        out = run_sharded_sweep(
            cfg, args.split, args.output_root,
            n_hosts=args.num_hosts, host_id=args.host_id, barrier=barrier,
        )
        print(f"wrote {out}")
        return

    batch = int(cfg.TPU.INFER_BATCH)
    dm = DataModule(cfg)
    if args.split == "test":
        dataloader = dm.test_dataloader(
            batch_size=batch,
            unique_refs=(cfg.MODEL == "Regression"
                         and int(cfg.TPU.UNIQUE_REFS) > 0))
    elif args.split == "val":
        # batched sweep over the full val split (no drop_last: every frame
        # must receive an estimate or count as a failure)
        from mapfree_tpu.data import DataLoader

        dataset = dm.dataset_type(cfg, "val")
        dataloader = DataLoader(
            dataset, batch_size=batch,
            num_workers=cfg.TRAINING.NUM_WORKERS or 2,
            unique_refs=(cfg.MODEL == "Regression"
                         and int(cfg.TPU.UNIQUE_REFS) > 0))
    else:
        raise NotImplementedError(f"Invalid split: {args.split}")

    model = build_model(cfg, args.checkpoint)
    results_dict = predict(dataloader, model)

    args.output_root.mkdir(parents=True, exist_ok=True)
    save_submission(results_dict, args.output_root / "submission.zip")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="path to model config file")
    parser.add_argument("--dataset_config", default="configs/mapfree.yaml",
                        help="path to the dataset config (merged first)")
    parser.add_argument("--checkpoint", default="",
                        help="path to model checkpoint (learned models)")
    parser.add_argument("--output_root", "-o", type=Path, default=Path("results/"))
    parser.add_argument("--split", choices=("val", "test"), default="test")
    parser.add_argument("--num_hosts", type=int, default=None,
                        help="override host count for a sharded sweep "
                             "(default: jax.process_count())")
    parser.add_argument("--host_id", type=int, default=None,
                        help="override this host's shard id")
    args = parser.parse_args()
    eval(args)
