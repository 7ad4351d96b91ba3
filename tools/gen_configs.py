"""Generate the full config YAML tree (same variant surface as the reference).

Run: python tools/gen_configs.py
"""

from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parent.parent / "configs"


def dump(path: str, data: dict):
    p = ROOT / path
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(yaml.safe_dump(data, sort_keys=False))
    print(f"wrote {p}")


def deep_update(base: dict, over: dict) -> dict:
    out = {k: (v.copy() if isinstance(v, dict) else v) for k, v in base.items()}
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_update(out[k], v)
        elif v is ...:  # sentinel: delete key
            out.pop(k, None)
        else:
            out[k] = v
    return out


# ----------------------------------------------------------- regression -----

REG_BASE_MAPFREE = {
    "MODEL": "Regression",
    "ENCODER": {"TYPE": "ResUNet", "BLOCK_TYPE": 1, "NUM_BLOCKS": "3-3-3",
                "NOT_CONCAT": False, "NUM_OUT_LAYERS": 32},
    "AGGREGATOR": {"TYPE": "CorrelationVolumeWarping", "POSITION_ENCODER": True,
                   "MAX_SCORE_CHANNEL": True},
    "HEAD": {"TYPE": "ProcrustesDeepResBlock", "ADD_BASIS": True, "AVG_POOL": True},
    "TRAINING": {"BATCH_SIZE": 10, "NUM_WORKERS": 10, "SAMPLER": "scene_balance",
                 "N_SAMPLES_SCENE": 700, "SAMPLE_WITH_REPLACEMENT": True,
                 "LR": 1e-4, "LOG_INTERVAL": 50, "VAL_INTERVAL": 0.25,
                 "VAL_BATCHES": 500, "EPOCHS": 50, "ROT_LOSS": "rot_angle_loss",
                 "TRANS_LOSS": "trans_l1_loss", "LAMBDA": 1.0},
    "BACKPROJECT_ANCHORS": False,
    "DATASET": {"HEIGHT": 360, "WIDTH": 270, "MIN_OVERLAP_SCORE": 0.4,
                "MAX_OVERLAP_SCORE": 0.8},
}

BINS_HEAD = {
    "HEAD": {"TYPE": "AngularBinsDeepResBlockMLP", "SEPARATE_SCALE": True,
             "AVG_POOL": True, "ADD_BASIS": ...},
    "TRAINING": {"ROT_LOSS": "rot_bin_loss", "TRANS_LOSS": "trans_sphbin_loss"},
}

MAPFREE_REG_VARIANTS = {
    "3d3d.yaml": {},
    "3d3d_lowoverlap.yaml": {"DATASET": {"MIN_OVERLAP_SCORE": 0.2}},
    "3d3d_no_posencoder.yaml": {"AGGREGATOR": {"POSITION_ENCODER": False}},
    "3d3d_no_warping.yaml": {
        "AGGREGATOR": {"TYPE": "Concat", "POSITION_ENCODER": ...,
                       "MAX_SCORE_CHANNEL": ...}},
    "3d3d_weighted_loss.yaml": {"TRAINING": {"LAMBDA": 0.0}},
    "rot6d_trans.yaml": {"HEAD": {"TYPE": "DirectDeepResBlockMLP"}},
    "rotquat_trans.yaml": {
        "HEAD": {"TYPE": "QuatDeepResBlock", "SEPARATE_SCALE": False,
                 "ADD_BASIS": ..., "AVG_POOL": ...},
        "TRAINING": {"ROT_LOSS": "quat_l1_loss", "LAMBDA": 0.0}},
    "rotquat_transdirection_scale.yaml": {
        "HEAD": {"TYPE": "QuatDeepResBlock", "SEPARATE_SCALE": True,
                 "ADD_BASIS": ..., "AVG_POOL": ...},
        "TRAINING": {"ROT_LOSS": "quat_l1_loss",
                     "TRANS_LOSS": "trans_scale_direction_loss"}},
    "rotbin_trans.yaml": deep_update(BINS_HEAD, {
        "HEAD": {"SEPARATE_SCALE": False},
        "TRAINING": {"TRANS_LOSS": "trans_l1_loss"}}),
    "rotbin_transdirectionbin_scale.yaml": BINS_HEAD,
    "rotbin_transdirectionbin_scale_lowoverlap.yaml": deep_update(
        BINS_HEAD, {"DATASET": {"MIN_OVERLAP_SCORE": 0.2}}),
    "rotbin_transdirectionbin_scale_qkv.yaml": deep_update(BINS_HEAD, {
        "AGGREGATOR": {"TYPE": "CorrelationVolumeWarpingQKV",
                       "NORMALISE_DOT": False, "RESIDUAL_ATT": True}}),
    "multiframe/3d3d_multi.yaml": {"MODEL": "RegressionMultiFrame"},
    # framework extension (not in the reference): true 9-frame fusion — all
    # query frames encoded in one dispatch, per-frame poses chained through
    # the device tracking and fused in the last frame's coordinates
    "multiframe/3d3d_multi_fusion.yaml": {"MODEL": "RegressionMultiFrameFusion"},
}

REG_BASE_SCANNET = deep_update(REG_BASE_MAPFREE, {
    "TRAINING": {"BATCH_SIZE": 12, "NUM_WORKERS": 12, "N_SAMPLES_SCENE": 200,
                 "VAL_BATCHES": 200},
    "DATASET": {"HEIGHT": 240, "WIDTH": 320, "MIN_OVERLAP_SCORE": ...,
                "MAX_OVERLAP_SCORE": ...},
})

SCANNET_REG_VARIANTS = {
    "3d3d.yaml": {},
    "3d3d_lowoverlap.yaml": {"DATASET": {"MIN_OVERLAP_SCORE": 0.2}},
    "3d3d_qkv.yaml": {
        "AGGREGATOR": {"TYPE": "CorrelationVolumeWarpingQKV",
                       "NORMALISE_DOT": False, "RESIDUAL_ATT": True}},
    "3d3d_with_dustbin.yaml": {"AGGREGATOR": {"DUSTBIN": True}},
    "3d3d_no_avgpool.yaml": {"HEAD": {"AVG_POOL": False}},
    "3d3d_half_cv.yaml": {
        "AGGREGATOR": {"POSITION_ENCODER_IM1": True, "CV_HALF_CHANNELS": True}},
    "3d3d_dual_posenc.yaml": {"AGGREGATOR": {"POSITION_ENCODER_IM1": True}},
    "3d3d_dual_posenc_upsampling.yaml": {
        "AGGREGATOR": {"POSITION_ENCODER_IM1": True, "UPSAMPLE_POS_ENC": 8}},
    "rotbin_transdirectionbin_scale.yaml": BINS_HEAD,
}

# ------------------------------------------------------------- matching -----

EMAT = {"EMAT_RANSAC": {"PIX_THRESHOLD": 3.0, "SCALE_THRESHOLD": 0.1,
                        "CONFIDENCE": 0.9999}}
PNP = {"PNP": {"RANSAC_ITER": 1000, "REPROJECTION_INLIER_THRESHOLD": 3,
               "CONFIDENCE": 0.9999}}
PROC = {"PROCRUSTES": {"MAX_CORR_DIST": 0.05}}
PROC_ICP = {"PROCRUSTES": {"MAX_CORR_DIST": 0.05, "REFINE": True}}

SOLVERS = {"emat": ("EssentialMatrixMetric", EMAT), "pnp": ("PNP", PNP),
           "procrustes": ("Procrustes", PROC),
           "procrustes_icp": ("Procrustes", PROC_ICP)}
MATCHERS = {"sift": "SIFT", "sg": "SG", "loftr": "LoFTR"}


def matching_cfg(matcher_key, solver_key, matches_path, depth):
    solver_name, solver_block = SOLVERS[solver_key]
    out = {"MODEL": "FeatureMatching", "FEATURE_MATCHING": "Precomputed",
           "POSE_SOLVER": solver_name,
           "DATASET": {"ESTIMATED_DEPTH": depth},
           "MATCHES_FILE_PATH": matches_path}
    return deep_update(out, solver_block)


def sift_live_cfg(solver_key, depth):
    """SIFT computed at runtime (host detector + TPU matcher)."""
    solver_name, solver_block = SOLVERS[solver_key]
    out = {"MODEL": "FeatureMatching", "FEATURE_MATCHING": "SIFT",
           "POSE_SOLVER": solver_name,
           "DATASET": {"ESTIMATED_DEPTH": depth},
           "SIFT": {"NUM_FEATURES": 2048, "RATIO_THRESHOLD": 0.8}}
    return deep_update(out, solver_block)


def main():
    # dataset configs
    dump("scannet.yaml", {
        "DATASET": {"DATA_SOURCE": "ScanNet", "DATA_ROOT": "data/scannet/",
                    "NPZ_ROOT": "data/scannet_indices/scene_data",
                    "MIN_OVERLAP_SCORE": 0.4, "AUGMENTATION_TYPE": "None",
                    "ESTIMATED_DEPTH": "None", "HEIGHT": 480, "WIDTH": 640}})
    dump("sevenscenes.yaml", {
        "DATASET": {"DATA_SOURCE": "7Scenes", "DATA_ROOT": "data/sevenscenes",
                    "SCENES": "None",
                    "PAIRS_TXT": {"TRAIN": "train_pairs.4nn.medium.txt",
                                  "VAL": "val_pairs.3nn.medium.txt",
                                  "TEST": "test_pairs.5nn.5cm10m.vlad.minmax.txt"},
                    "ESTIMATED_DEPTH": "None", "AUGMENTATION_TYPE": "None",
                    "HEIGHT": 480, "WIDTH": 640}})

    for name, over in MAPFREE_REG_VARIANTS.items():
        dump(f"regression/mapfree/{name}", deep_update(REG_BASE_MAPFREE, over))
    for name, over in SCANNET_REG_VARIANTS.items():
        dump(f"regression/scannet/{name}", deep_update(REG_BASE_SCANNET, over))

    # matching / mapfree: precomputed {SIFT, SG, LoFTR} x {emat, pnp} x dpt
    # depth, + sg procrustes (mirrors the reference's 13 files)
    for m in ("sift", "sg", "loftr"):
        for s in ("emat", "pnp"):
            for d in ("dptnyu", "dptkitti"):
                dump(f"matching/mapfree/{m}_{s}_{d}.yaml",
                     matching_cfg(m, s,
                                  f"{{scene_root}}/correspondences_{MATCHERS[m]}.npz",
                                  d))
    # framework extension: depth predicted IN-GRAPH (no offline depth pngs;
    # SURVEY.md §6 north star) for the metric-scale solvers
    for m in ("sift", "sg", "loftr"):
        c = matching_cfg(
            m, "emat", f"{{scene_root}}/correspondences_{MATCHERS[m]}.npz",
            "None")
        c["DEPTH_NET"] = {"ENABLED": True}
        dump(f"matching/mapfree/{m}_emat_ingraph.yaml", c)

    dump("matching/mapfree/sg_procrustes_dptkitti.yaml",
         matching_cfg("sg", "procrustes",
                      "{scene_root}/correspondences_SG.npz", "dptkitti"))

    # matching / scannet: gt / dpt / planercnn depth sources; SIFT live
    scannet_depth = {
        "gt": "None",
        "dpt": "data/scannet_misc/scannet_test_depthmaps_dpt.npz",
        "planercnn": "data/scannet_misc/scannet_test_depthmaps_planercnn.npz",
    }
    for m in ("sg", "loftr"):
        matches = ("data/scannet_misc/"
                   f"correspondences_{MATCHERS[m]}_scannet_test.npz")
        for s in ("emat", "pnp", "procrustes", "procrustes_icp"):
            for dkey, dval in scannet_depth.items():
                suffix = "procrustes_" + dkey + "_icp" if s == "procrustes_icp" \
                    else f"{s}_{dkey}"
                dump(f"matching/scannet/{m}_{suffix}.yaml",
                     matching_cfg(m, s, matches, dval))
    for s in ("emat", "pnp", "procrustes", "procrustes_icp"):
        for dkey, dval in scannet_depth.items():
            suffix = "procrustes_" + dkey + "_icp" if s == "procrustes_icp" \
                else f"{s}_{dkey}"
            dump(f"matching/scannet/sift_{suffix}.yaml", sift_live_cfg(s, dval))

    # matching / 7scenes: planercnn estimated depth
    for m in ("sift", "sg", "loftr"):
        for s in ("emat", "pnp"):
            dump(f"matching/sevenscenes/{m}_{s}_planercnn.yaml",
                 matching_cfg(
                     m, s,
                     "{scene_root}/correspondences_" + MATCHERS[m]
                     + "_{pairs_txt}.npz",
                     "prcnn"))


if __name__ == "__main__":
    main()
