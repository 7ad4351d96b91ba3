"""End-to-end integration tests: data -> model -> submission.zip -> evaluator.

The golden-path test the reference lacks (SURVEY.md §4): a synthetic scene
with known geometry flows through the full pipeline; the matching track with
ground-truth correspondences must recover near-perfect leaderboard metrics.
"""

from pathlib import Path
from zipfile import ZipFile

import numpy as np
import pytest

from fixtures import make_scene

from mapfree_tpu.benchmark.mapfree import run as run_benchmark
from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.data import DataLoader, MapFreeDataset
from mapfree_tpu.geom import quat2mat
from mapfree_tpu.models.builder import build_model
from mapfree_tpu.utils.submission import predict, save_submission

H, W = 64, 48


def base_cfg(tmp_path, **over):
    c = default_cfg.clone()
    c.DATASET.DATA_SOURCE = "MapFree"
    c.DATASET.DATA_ROOT = str(tmp_path)
    c.DATASET.HEIGHT = H
    c.DATASET.WIDTH = W
    c.TRAINING.NUM_WORKERS = 2
    c.TPU.INFER_BATCH = 4
    c.TPU.COMPUTE_DTYPE = "float32"
    for k, v in over.items():
        node = c
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return c


class TestRegressionSubmission:
    def test_untrained_model_produces_valid_submission(self, tmp_path):
        for i in range(2):
            make_scene(tmp_path / "val" / f"s{i:05}", n_queries=10,
                       img_hw=(H, W), seed=i)
        cfg = base_cfg(
            tmp_path,
            MODEL="Regression",
            **{
                "ENCODER.TYPE": "ResUNet", "ENCODER.BLOCK_TYPE": 0,
                "ENCODER.NUM_BLOCKS": "1-1-1", "ENCODER.NUM_OUT_LAYERS": 8,
                "AGGREGATOR.TYPE": "CorrelationVolumeWarping",
                "AGGREGATOR.POSITION_ENCODER": True,
                "AGGREGATOR.MAX_SCORE_CHANNEL": True,
                "HEAD.TYPE": "ProcrustesDeepResBlock", "HEAD.ADD_BASIS": True,
                "HEAD.AVG_POOL": True,
            },
        )
        dataset = MapFreeDataset(cfg, "val")
        loader = DataLoader(dataset, batch_size=4, num_workers=2)
        model = build_model(cfg)
        results = predict(loader, model)
        assert set(results) == {"s00000", "s00001"}
        assert len(results["s00000"]) == 2  # 10 queries / every 5th

        out = tmp_path / "results"
        out.mkdir()
        save_submission(results, out / "submission.zip")

        with ZipFile(out / "submission.zip") as z:
            names = set(z.namelist())
            assert names == {"pose_s00000.txt", "pose_s00001.txt"}
            line = z.read("pose_s00000.txt").decode().splitlines()[0]
            assert len(line.split(" ")) == 9  # img q(4) t(3) conf

        metrics = run_benchmark(out / "submission.zip", tmp_path / "val")
        assert metrics is not None
        assert metrics["Estimates for % of frames"] == 1.0
        # untrained net: errors present but finite
        assert np.isfinite(metrics["Average Median Translation Error"])


_TINY_RPR = {
    "ENCODER.TYPE": "ResUNet", "ENCODER.BLOCK_TYPE": 0,
    "ENCODER.NUM_BLOCKS": "1-1-1", "ENCODER.NUM_OUT_LAYERS": 8,
    "AGGREGATOR.TYPE": "CorrelationVolumeWarping",
    "AGGREGATOR.POSITION_ENCODER": True,
    "AGGREGATOR.MAX_SCORE_CHANNEL": True,
    "HEAD.TYPE": "ProcrustesDeepResBlock", "HEAD.ADD_BASIS": True,
    "HEAD.AVG_POOL": True,
}


class TestUniqueRefSweep:
    def test_unique_ref_path_matches_standard(self, tmp_path):
        """The deduped-ref sweep (image0_unique + on-device gather) must
        produce the same poses as the per-pair image0 path.

        YUV420 transfer is pinned OFF so both loaders ship identical bytes:
        this test is the exactness contract of the dedup/gather machinery.
        The lossy-format numeric bound is TestYuv420Accuracy below.
        """
        for i in range(2):
            make_scene(tmp_path / "val" / f"s{i:05}", n_queries=10,
                       img_hw=(H, W), seed=i)
        cfg = base_cfg(tmp_path, MODEL="Regression",
                       **{**_TINY_RPR, "TPU.YUV420_TRANSFER": False})
        dataset = MapFreeDataset(cfg, "val")
        model = build_model(cfg)
        results_std = predict(
            DataLoader(dataset, batch_size=4, num_workers=2), model)
        results_uni = predict(
            DataLoader(dataset, batch_size=4, num_workers=2,
                       unique_refs=True), model)
        assert set(results_std) == set(results_uni)
        for scene in results_std:
            for a, b in zip(results_std[scene], results_uni[scene]):
                assert a.image_name == b.image_name
                np.testing.assert_allclose(a.q, b.q, atol=1e-5)
                np.testing.assert_allclose(a.t, b.t, atol=1e-5)


class TestYuv420Accuracy:
    def test_pose_shift_and_metrics_bounded(self, tmp_path):
        """Numeric bound on the lossy default transfer format: running the
        SAME sweep with YUV420 on vs off must shift every estimated pose by
        less than a stated tolerance, and leave the evaluator's aggregate
        metrics essentially unchanged.

        4:2:0 chroma is lossy (box-down + triangle-up round trip, bounded at
        the ops level in test_image_ops.py); the fixtures here are white-noise
        JPEGs — the WORST case for chroma subsampling, so the bound is
        conservative for real photographs. Measured on this model/scene set:
        max |dq| 1.7e-3, max |dt| ~2e-3 (reference analog: its float RGB
        transfer is exact, submission.py:33-58 — ours must be provably close).
        """
        for i in range(2):
            make_scene(tmp_path / "val" / f"s{i:05}", n_queries=10,
                       img_hw=(H, W), seed=i)

        results, metrics = {}, {}
        for yuv in (False, True):
            cfg = base_cfg(tmp_path, MODEL="Regression",
                           **{**_TINY_RPR, "TPU.YUV420_TRANSFER": yuv})
            dataset = MapFreeDataset(cfg, "val")
            model = build_model(cfg)
            results[yuv] = predict(
                DataLoader(dataset, batch_size=4, num_workers=2,
                           unique_refs=True), model)
            out = tmp_path / f"results_yuv{int(yuv)}"
            out.mkdir()
            save_submission(results[yuv], out / "submission.zip")
            metrics[yuv] = run_benchmark(out / "submission.zip",
                                         tmp_path / "val")

        # per-pose bound (quaternion components and translation meters)
        for scene in results[False]:
            for a, b in zip(results[False][scene], results[True][scene]):
                assert a.image_name == b.image_name
                np.testing.assert_allclose(a.q, b.q, atol=1e-2)
                np.testing.assert_allclose(a.t, b.t, atol=1e-2)

        # evaluator-level bound: same frames estimated, aggregate medians
        # move by < 1 cm / < 0.1 deg / < 1 px
        me, my = metrics[False], metrics[True]
        assert me["Estimates for % of frames"] == my["Estimates for % of frames"]
        assert abs(me["Average Median Translation Error"]
                   - my["Average Median Translation Error"]) < 1e-2
        assert abs(me["Average Median Rotation Error"]
                   - my["Average Median Rotation Error"]) < 0.1
        assert abs(me["Average Median Reprojection Error"]
                   - my["Average Median Reprojection Error"]) < 1.0
        assert me["Precision @ Pose Error < (25.0cm, 5deg)"] == \
            my["Precision @ Pose Error < (25.0cm, 5deg)"]
        assert me["Precision @ VCRE < 90px"] == my["Precision @ VCRE < 90px"]


def _make_consistent_scene(root, n_queries=10, seed=3):
    """Scene where depth maps and precomputed correspondences are consistent
    with the GT poses: non-planar depth surface back-projected from view0,
    transformed with the GT relative pose, projected into view1."""
    import cv2

    # mild query poses: the shared surface must stay visible in every query
    poses = make_scene(root, n_queries=n_queries, img_hw=(H, W), seed=seed,
                       max_angle=0.25, t_scale=0.2)
    fx = fy = 100.0
    cx, cy = W / 2, H / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    # view0 depth: smooth non-planar surface (planar scenes degenerate for E)
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    depth0 = (2.0 + 0.4 * np.sin(uu / 5.0) + 0.3 * np.cos(vv / 4.0)).astype(np.float32)
    cv2.imwrite(str(root / "seq0/frame_00000.gt.png"),
                (depth0 * 1000).astype(np.uint16))

    # sample a sparse grid of view0 pixels
    us = np.arange(4, W - 4, 3)
    vs = np.arange(4, H - 4, 3)
    gu, gv = np.meshgrid(us, vs)
    uv0 = np.stack([gu.reshape(-1), gv.reshape(-1)], axis=-1).astype(np.float32)
    z0 = depth0[uv0[:, 1].astype(int), uv0[:, 0].astype(int)]
    rays = np.concatenate([uv0, np.ones_like(uv0[:, :1])], axis=1) @ np.linalg.inv(K).T
    X0 = rays * z0[:, None]

    correspondences = []
    for i in range(n_queries):
        name = f"seq1/frame_{i:05}.jpg"
        q, t = poses[name]
        R = quat2mat(q)
        X1 = X0 @ R.T + t
        uv1h = X1 @ K.T
        uv1 = uv1h[:, :2] / uv1h[:, 2:]
        vis = (
            (uv1[:, 0] >= 0) & (uv1[:, 0] < W - 1)
            & (uv1[:, 1] >= 0) & (uv1[:, 1] < H - 1) & (X1[:, 2] > 0.1)
        )
        # view1 depth map scattered at the projected pixels
        depth1 = np.zeros((H, W), np.float32)
        ui = np.clip(uv1[vis, 0].astype(int), 0, W - 1)
        vi = np.clip(uv1[vis, 1].astype(int), 0, H - 1)
        depth1[vi, ui] = X1[vis, 2]
        cv2.imwrite(str(root / name).replace(".jpg", ".gt.png"),
                    (depth1 * 1000).astype(np.uint16))
        corr = np.concatenate([uv0[vis], uv1[vis]], axis=1).astype(np.float32)
        correspondences.append(corr)

    # NaN-padded stack, one row per *pair_id* (every 5th query is evaluated;
    # pair_id = index * 5, so pad the non-evaluated slots too)
    max_n = max(len(c) for c in correspondences)
    stacked = np.full((n_queries, max_n, 4), np.nan, np.float32)
    for i, c in enumerate(correspondences):
        stacked[i, : len(c)] = c
    np.savez(root / "correspondences.npz", correspondences=stacked)
    return poses


class TestMatchingSubmission:
    @pytest.mark.parametrize("solver", ["EssentialMatrixMetric", "PNP", "Procrustes"])
    def test_gt_correspondences_give_accurate_poses(self, tmp_path, solver):
        root = tmp_path / "val" / "s00000"
        _make_consistent_scene(root, n_queries=10)
        cfg = base_cfg(
            tmp_path,
            MODEL="FeatureMatching",
            FEATURE_MATCHING="Precomputed",
            POSE_SOLVER=solver,
            MATCHES_FILE_PATH=str(tmp_path / "val" / "{scene_root}-correspondences.npz"),
            **{
                "DATASET.ESTIMATED_DEPTH": "gt",
                "EMAT_RANSAC.PIX_THRESHOLD": 2.0,
                "EMAT_RANSAC.SCALE_THRESHOLD": 0.1,
                "EMAT_RANSAC.CONFIDENCE": 0.9999,
                "PNP.RANSAC_ITER": 256,
                "PNP.REPROJECTION_INLIER_THRESHOLD": 3.0,
                "PNP.CONFIDENCE": 0.9999,
                "PROCRUSTES.MAX_CORR_DIST": 0.1,
                "TPU.RANSAC_ITERATIONS": 256,
                "TPU.MAX_CORRESPONDENCES": 512,
            },
        )
        # the Precomputed source formats {scene_root}: point it at the npz
        cfg.MATCHES_FILE_PATH = str(root / "correspondences.npz")

        dataset = MapFreeDataset(cfg, "val")
        loader = DataLoader(dataset, batch_size=2, num_workers=1)
        model = build_model(cfg)
        results = predict(loader, model)
        assert len(results["s00000"]) >= 1

        out = tmp_path / f"results_{solver}"
        out.mkdir()
        save_submission(results, out / "submission.zip")
        metrics = run_benchmark(out / "submission.zip", tmp_path / "val")
        assert metrics is not None
        # GT correspondences + GT depth must localise nearly perfectly
        assert metrics["Average Median Translation Error"] < 0.08, metrics
        assert metrics["Average Median Rotation Error"] < 1.5, metrics


class TestPackedTransferPath:
    def test_packed_single_device_matches_mesh_sweep(self, tmp_path):
        """The single-device packed-buffer transfer (one uint8 buffer per
        batch, unpack fused into the forward — models/builder.py
        transfer_batch) must produce the same poses as the per-array SPMD
        path. TPU.MESH_SHAPE=[1] forces the packed path on the CPU test
        mesh (a 1-device mesh shards nothing)."""
        for i in range(2):
            make_scene(tmp_path / "val" / f"s{i:05}", n_queries=10,
                       img_hw=(H, W), seed=i)

        results = {}
        for packed in (False, True):
            over = dict(_TINY_RPR)
            if packed:
                over["TPU.MESH_SHAPE"] = [1]
            cfg = base_cfg(tmp_path, MODEL="Regression", **over)
            model = build_model(cfg)
            assert (model.mesh is None) == packed
            dataset = MapFreeDataset(cfg, "val")
            results[packed] = predict(
                DataLoader(dataset, batch_size=4, num_workers=2,
                           unique_refs=True), model)

        assert set(results[False]) == set(results[True])
        for scene in results[False]:
            for a, b in zip(results[False][scene], results[True][scene]):
                assert a.image_name == b.image_name
                np.testing.assert_allclose(a.q, b.q, atol=1e-5)
                np.testing.assert_allclose(a.t, b.t, atol=1e-5)

    def test_packed_path_partial_final_batch(self, tmp_path):
        """Partial final batches pad inside the packed buffer (queries,
        ridx, and refs up to u_max) — poses must match the mesh path."""
        make_scene(tmp_path / "val" / "s00000", n_queries=15,
                   img_hw=(H, W), seed=3)  # 3 pairs -> batch 2 + partial 1

        results = {}
        for packed in (False, True):
            over = dict(_TINY_RPR)
            if packed:
                over["TPU.MESH_SHAPE"] = [1]
            cfg = base_cfg(tmp_path, MODEL="Regression", **over)
            cfg.TPU.INFER_BATCH = 2
            model = build_model(cfg)
            dataset = MapFreeDataset(cfg, "val")
            results[packed] = predict(
                DataLoader(dataset, batch_size=2, num_workers=1,
                           unique_refs=True), model)

        for a, b in zip(results[False]["s00000"], results[True]["s00000"]):
            assert a.image_name == b.image_name
            np.testing.assert_allclose(a.q, b.q, atol=1e-5)
            np.testing.assert_allclose(a.t, b.t, atol=1e-5)
