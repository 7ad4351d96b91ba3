"""7Scenes visual-localisation evaluation CLI.

Equivalent of reference benchmark/sevenscenes.py:17-145: per-query absolute
pose from 1..k reference images via geometric median + chordal-L2 rotation
mean, or triangulation + pose-graph RANSAC (--triang); DSAC pass rates, AP,
per-scene result dumps and PR plots.

Run: ``python -m mapfree_tpu.benchmark.sevenscenes <config> <dataset_config>``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from mapfree_tpu.benchmark.localize import (
    AbsPose,
    RelaPose,
    RelaPosePair,
    eval_pipeline_with_ransac,
    eval_pipeline_without_ransac,
    generate_precision_recall_plots,
    save_results_visualisation,
)
from mapfree_tpu.config import cfg
from mapfree_tpu.data import DataModule
from mapfree_tpu.geom.quaternion import mat2quat
from mapfree_tpu.models.builder import build_model
from mapfree_tpu.utils.logger import set_log


def predict(loader, model):
    """Collect per-(reference, query) RelaPosePair results
    (reference benchmark/sevenscenes.py:17-66), batched AND pipelined:
    batch i+1's transfer/compute overlap batch i's host-side pose-pair
    assembly (utils/submission.iter_predictions)."""
    from mapfree_tpu.utils.submission import iter_predictions

    results_dict = {}

    _META_KEYS = ("pair_names", "scene_id", "abs_q_0", "abs_c_0",
                  "abs_q_1", "abs_c_1", "T_0to1", "sim")

    for batch, fetch in iter_predictions(
            loader, model, lambda b: {k: b[k] for k in _META_KEYS}):
        R, t, inliers = fetch()
        B = R.shape[0]
        for i in range(B):
            train, test = batch["pair_names"][i]
            scene = batch["scene_id"][i]
            scene_res = results_dict.setdefault(
                scene, {"pair_data": {}, "no_pt_pairs": []}
            )
            pdata = scene_res["pair_data"].setdefault(test, {"test_pairs": []})

            train_abs_pose = AbsPose(
                np.asarray(batch["abs_q_0"][i], np.float64),
                np.asarray(batch["abs_c_0"][i], np.float64),
            )
            test_abs_pose = AbsPose(
                np.asarray(batch["abs_q_1"][i], np.float64),
                np.asarray(batch["abs_c_1"][i], np.float64),
            )
            pdata["test_abs_pose"] = test_abs_pose

            T = np.asarray(batch["T_0to1"][i], np.float64)
            rela_pose_lbl = RelaPose(mat2quat(T[:3, :3]), T[:3, 3])

            Ri = np.asarray(R[i], np.float64)
            ti = np.asarray(t[i], np.float64).reshape(-1)
            if np.isnan(Ri).any() or np.isnan(ti).any() or np.isinf(ti).any():
                scene_res["no_pt_pairs"].append(batch["pair_names"][i])
            else:
                rela_pose_pred = RelaPose(mat2quat(Ri), ti)
                sim = float(np.asarray(batch["sim"][i]))
                test_pair = RelaPosePair(test, train_abs_pose, rela_pose_lbl,
                                         rela_pose_pred, sim)
                test_pair.inliers = float(np.asarray(inliers[i]))
                pdata["test_pairs"].append(test_pair)

    return results_dict


def eval(args):
    cfg.merge_from_file(args.dataset_config)
    cfg.merge_from_file(args.config)

    if args.test_pair_txt:
        cfg.DATASET.PAIRS_TXT.TEST = args.test_pair_txt
    if args.one_nn:
        cfg.DATASET.PAIRS_TXT.ONE_NN = True

    args.output_root.mkdir(parents=True, exist_ok=True)
    set_log(args.output_root / "test_results.txt")

    dataloader = DataModule(cfg).test_dataloader(batch_size=int(cfg.TPU.INFER_BATCH))
    model = build_model(cfg, args.checkpoint)

    results_dict = predict(dataloader, model)
    np.save(args.output_root / "rawpred.npy", results_dict)

    err_thres = ((0.1, 5), (0.25, 5), (0.5, 10), (1, 20))
    save_res_path = args.output_root / "results.npy"
    if args.triang:
        eval_pipeline_with_ransac(
            results_dict, None, ransac_thres=args.triang_ransac_thres,
            ransac_iter=10, ransac_miu=1.414, pair_type="relapose",
            err_thres=err_thres, save_res_path=save_res_path,
        )
    else:
        eval_pipeline_without_ransac(results_dict, err_thres=err_thres,
                                     save_res_path=save_res_path)

    save_results_visualisation(save_res_path)
    generate_precision_recall_plots(save_res_path, err_thres[1])


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", help="path to config file")
    parser.add_argument("dataset_config", help="path to dataset config file")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--test_pair_txt", "-pair", type=str, default=None)
    parser.add_argument("--output_root", "-odir", type=str, default="results/")
    parser.add_argument("--one_nn", action="store_true",
                        help="keep only the highest-similarity reference per query")
    parser.add_argument("--triang", action="store_true",
                        help="triangulation + RANSAC absolute pose")
    parser.add_argument("--triang_ransac_thres", "-rthres", type=int, nargs="+",
                        default=[15])
    args = parser.parse_args()
    args.output_root = Path(args.output_root)
    assert not (args.one_nn and args.triang), (
        "triangulation needs more than one nearest neighbour"
    )
    eval(args)
