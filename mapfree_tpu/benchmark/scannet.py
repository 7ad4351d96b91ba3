"""ScanNet relative-pose evaluation CLI.

Equivalent of reference benchmark/scannet.py:15-57: sweeps the test loader in
device-sized batches, accumulates pose errors, prints medians / AUC tables /
recall thresholds / A-metrics / failure ratio, saves an npz of raw metrics.

Run: ``python -m mapfree_tpu.benchmark.scannet <model_config.yaml>``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from mapfree_tpu.config import cfg
from mapfree_tpu.data import DataLoader, DataModule
from mapfree_tpu.metrics import (
    A_metrics,
    MetricsAccumulator,
    precision,
    print_auc_table,
)
from mapfree_tpu.models.builder import build_model
from mapfree_tpu.utils.logger import set_log


def pose_error_numpy(R, t, Tgt):
    """Host-side pose error on possibly-NaN solver outputs (NaN-propagating,
    like the reference's torch version on failed estimates)."""
    import mapfree_tpu.metrics as M
    import jax.numpy as jnp

    out = M.pose_error(jnp.asarray(R), jnp.asarray(t), jnp.asarray(Tgt))
    return {k: np.asarray(v) for k, v in out.items()}


def evaluate(loader, model) -> dict:
    """Pipelined sweep (utils/submission.iter_predictions): batch i+1's
    transfer/compute overlap batch i's host-side metric accumulation —
    the reference loops one blocking round trip per batch
    (reference benchmark/scannet.py:15-57)."""
    from mapfree_tpu.utils.submission import iter_predictions

    macc = MetricsAccumulator()
    for Tgt, fetch in iter_predictions(
            loader, model, lambda b: np.asarray(b["T_0to1"])):
        R, t, _ = fetch()
        macc.accumulate(pose_error_numpy(R, t, Tgt))
    return macc.aggregate()


def report(agg_metrics: dict):
    print(f"Median Rotation error [deg]: {np.nanmedian(agg_metrics['R_err']):.2f}")
    print(
        "Median Translation angular error [deg]: "
        f"{np.nanmedian(agg_metrics['t_err_ang']):.2f}"
    )
    print(
        "Median Translation Euclidean error [m]: "
        f"{np.nanmedian(agg_metrics['t_err_euc']):.2f}"
    )
    print_auc_table(agg_metrics)

    thresholds = ((0.1, 5), (0.25, 5), (0.5, 10), (1, 20))
    print(
        "Recall @ "
        + "/".join(f"({t[0]:.1f}m,{t[1]:.0f}deg)" for t in thresholds)
        + ": "
        + "/".join(
            "{:.2f}".format(precision(agg_metrics, t[1], t[0])) for t in thresholds
        )
    )

    a1, a2, a3 = A_metrics(agg_metrics["t_err_scale_sym"])
    print(f"t_scale_error A1/A2/A3 [%]: {a1*100:.1f}/{a2*100:.1f}/{a3*100:.1f}")

    ratio_failures = np.isnan(agg_metrics["R_err"]).mean()
    print(f"failures (not enough corr.) [%]: {ratio_failures*100:.1f}")


def main(args):
    cfg.merge_from_file(args.dataset_config)
    cfg.merge_from_file(args.config)

    datamodule = DataModule(cfg)
    loader = datamodule.test_dataloader(batch_size=int(cfg.TPU.INFER_BATCH))
    model = build_model(cfg, args.checkpoint)

    config_name = args.config.split("/")[-1][:-5]
    out_dir = Path("results/scannet")
    out_dir.mkdir(parents=True, exist_ok=True)
    set_log(out_dir / f"{config_name}.txt")

    agg_metrics = evaluate(loader, model)
    report(agg_metrics)
    np.savez(out_dir / config_name, **agg_metrics)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="path to config file")
    parser.add_argument("--dataset_config", default="configs/scannet.yaml")
    parser.add_argument("--checkpoint", help="path to checkpoint", default="")
    main(parser.parse_args())
