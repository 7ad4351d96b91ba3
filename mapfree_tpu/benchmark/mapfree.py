"""Official MapFree leaderboard evaluator CLI.

Behavioural equivalent of reference benchmark/mapfree.py:17-160: reads a
submission.zip of per-scene pose text files, scores against GT poses with
per-frame metrics, and aggregates avg-median errors + Precision/AUC at the
pose and VCRE thresholds (missing frames count as failures).

Run: ``python -m mapfree_tpu.benchmark.mapfree submission.zip --split val``.
"""

from __future__ import annotations

import argparse
import json
import logging
from collections import defaultdict
from io import TextIOWrapper
from pathlib import Path
from zipfile import ZipFile

import numpy as np

import mapfree_tpu.benchmark.config as config
from mapfree_tpu.benchmark.metrics import Inputs, MetricManager
from mapfree_tpu.benchmark.utils import load_K, load_poses, precision_recall, subsample_poses


def compute_scene_metrics(dataset_path: Path, submission_zip: ZipFile, scene: str):
    metric_manager = MetricManager()

    try:
        K, W, H = load_K(dataset_path / scene / "intrinsics.txt")
        with (dataset_path / scene / "poses.txt").open("r", encoding="utf-8") as f:
            gt_poses = load_poses(f, load_confidence=False)
    except FileNotFoundError as e:
        logging.error(f"Could not find ground-truth dataset files: {e}")
        raise
    else:
        logging.info(f"Loaded ground-truth intrinsics and poses for scene {scene}")

    try:
        with submission_zip.open(f"pose_{scene}.txt") as estimated_poses_file:
            wrapper = TextIOWrapper(estimated_poses_file, encoding="utf-8")
            estimated_poses = load_poses(wrapper, load_confidence=True)
    except KeyError:
        logging.warning(f"Submission does not have estimates for scene {scene}.")
        return dict(), len(gt_poses)
    except UnicodeDecodeError:
        logging.error("Unsupported file encoding: please use UTF-8")
        raise
    else:
        logging.info(f"Loaded estimated poses for scene {scene}")

    # The val/test set is subsampled by a factor of 5
    gt_poses = subsample_poses(gt_poses, subsample=5)

    failures = 0
    results = defaultdict(list)

    for frame_num, (q_gt, t_gt, _) in gt_poses.items():
        if frame_num not in estimated_poses:
            failures += 1
            continue
        q_est, t_est, conf = estimated_poses[frame_num]
        inputs = Inputs(
            q_gt=q_gt, t_gt=t_gt, q_est=q_est, t_est=t_est,
            confidence=conf, K=K[frame_num], W=W, H=H,
        )
        metric_manager(inputs, results)

    return results, failures


def aggregate_results(all_results, all_failures):
    median_metrics = defaultdict(list)
    all_metrics = defaultdict(list)
    for scene_results in all_results.values():
        for metric, values in scene_results.items():
            median_metrics[metric].append(np.median(values))
            all_metrics[metric].extend(values)
    all_metrics = {k: np.array(v) for k, v in all_metrics.items()}
    assert all(v.ndim == 1 for v in all_metrics.values()), "invalid metrics shape"

    avg_median_metrics = {m: np.mean(v) for m, v in median_metrics.items()}

    accepted_poses = (all_metrics["trans_err"] < config.t_threshold) * (
        all_metrics["rot_err"] < config.R_threshold
    )
    accepted_vcre = all_metrics["reproj_err"] < config.vcre_threshold
    total_samples = len(next(iter(all_metrics.values()))) + all_failures

    prec_pose = np.sum(accepted_poses) / total_samples
    prec_vcre = np.sum(accepted_vcre) / total_samples

    _, _, auc_pose = precision_recall(
        inliers=all_metrics["confidence"], tp=accepted_poses, failures=all_failures
    )
    _, _, auc_vcre = precision_recall(
        inliers=all_metrics["confidence"], tp=accepted_vcre, failures=all_failures
    )

    out = dict()
    out["Average Median Translation Error"] = avg_median_metrics["trans_err"]
    out["Average Median Rotation Error"] = avg_median_metrics["rot_err"]
    out["Average Median Reprojection Error"] = avg_median_metrics["reproj_err"]
    out[f"Precision @ Pose Error < ({config.t_threshold*100}cm, {config.R_threshold}deg)"] = prec_pose
    out[f"AUC @ Pose Error < ({config.t_threshold*100}cm, {config.R_threshold}deg)"] = auc_pose
    out[f"Precision @ VCRE < {config.vcre_threshold}px"] = prec_vcre
    out[f"AUC @ VCRE < {config.vcre_threshold}px"] = auc_vcre
    out["Estimates for % of frames"] = len(all_metrics["trans_err"]) / total_samples
    return out


def count_unexpected_scenes(scenes: tuple, submission_zip: ZipFile):
    submission_scenes = [
        fname[5:-4] for fname in submission_zip.namelist() if fname.startswith("pose_")
    ]
    return len(set(submission_scenes) - set(scenes))


def run(submission_path: Path, dataset_path: Path):
    scenes = tuple(f.name for f in dataset_path.iterdir() if f.is_dir())

    try:
        submission_zip = ZipFile(submission_path, "r")
    except FileNotFoundError:
        logging.error(f"Could not find ZIP file in path {submission_path}")
        return None

    all_results = dict()
    all_failures = 0
    for scene in scenes:
        metrics, failures = compute_scene_metrics(dataset_path, submission_zip, scene)
        all_results[scene] = metrics
        all_failures += failures

    if all_failures > 0:
        logging.warning(f"Submission is missing pose estimates for {all_failures} frames")

    unexpected = count_unexpected_scenes(scenes, submission_zip)
    if unexpected > 0:
        logging.warning(
            f"Submission contains estimates for {unexpected} scenes outside the split"
        )

    if all(len(metrics) == 0 for metrics in all_results.values()):
        logging.error("Submission does not have any valid pose estimates")
        return None

    return aggregate_results(all_results, all_failures)


def main(args):
    dataset_path = args.dataset_path / args.split
    output_metrics = run(args.submission_path, dataset_path)
    if output_metrics is not None:
        print(json.dumps(output_metrics, indent=2))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "eval", description="Evaluate submissions for the MapFree dataset benchmark"
    )
    parser.add_argument("submission_path", type=Path, help="Path to the submission ZIP")
    parser.add_argument("--split", choices=("val", "test"), default="test")
    parser.add_argument("--log", choices=("warning", "info", "error"), default="warning")
    parser.add_argument("--dataset_path", type=Path, default=None)
    args = parser.parse_args()

    if args.dataset_path is None:
        from mapfree_tpu.config import cfg

        cfg.merge_from_file("configs/mapfree.yaml")
        args.dataset_path = Path(cfg.DATASET.DATA_ROOT)

    logging.basicConfig(level=args.log.upper())
    main(args)
