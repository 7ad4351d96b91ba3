"""ScanNet and 7Scenes dataset tests on synthetic fixture scenes, plus the
7Scenes evaluation CLI path end-to-end."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.data import DataLoader
from mapfree_tpu.data.scannet import ScanNetDataset, read_scannet_intrinsic
from mapfree_tpu.data.sevenscenes import SceneDataset, SevenScenesDataset
from mapfree_tpu.geom import quat2mat

H, W = 48, 64


# ------------------------------------------------------------- fixtures -----


def make_scannet_scene(root, scene="scene0000_00", n_frames=6, seed=0):
    rng = np.random.default_rng(seed)
    sensor = root / "scans_test" / scene / "sensor_data"
    sensor.mkdir(parents=True)

    K = np.eye(4)
    K[0, 0] = K[1, 1] = 80.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    info = (
        "m_calibrationColorIntrinsic = "
        + " ".join(str(v) for v in K.reshape(-1))
        + "\nm_calibrationDepthIntrinsic = "
        + " ".join(str(v) for v in K.reshape(-1))
        + "\n"
    )
    (sensor / "_info.txt").write_text(info)

    poses = []
    for i in range(n_frames):
        img = rng.integers(0, 255, (H, W, 3), np.uint8)
        cv2.imwrite(str(sensor / f"frame-{i:06}.color.jpg"), img)
        depth_mm = rng.integers(500, 4000, (H, W)).astype(np.uint16)
        cv2.imwrite(str(sensor / f"frame-{i:06}.depth.pgm"), depth_mm)
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(size=3)
        np.savetxt(sensor / f"frame-{i:06}.pose.txt", c2w, delimiter=" ")
        poses.append(c2w)

    # npz pair index (LoFTR format): name [N, 4], score [N]
    names = np.array([(0, 0, i, i + 1) for i in range(n_frames - 1)])
    scores = rng.uniform(0.3, 0.9, len(names))
    npz_dir = root / "indices" / "test"
    npz_dir.mkdir(parents=True)
    np.savez(npz_dir / "test.npz", name=names, score=scores)
    return poses


def make_7scenes_scene(root, scene="chess", n_refs=3, n_queries=4, seed=0):
    rng = np.random.default_rng(seed)
    sdir = root / scene
    (sdir / "seq-01").mkdir(parents=True)

    def write_frame(name):
        img = rng.integers(0, 255, (H, W, 3), np.uint8)
        cv2.imwrite(str(sdir / f"{name}.color.png"), img)
        depth_mm = rng.integers(500, 4000, (H, W)).astype(np.uint16)
        cv2.imwrite(str(sdir / f"{name}.depth.png"), depth_mm)

    refs = [f"seq-01/frame-{i:06}" for i in range(n_refs)]
    queries = [f"seq-01/frame-{100 + i:06}" for i in range(n_queries)]
    abs_poses = {}
    for name in refs + queries:
        write_frame(name)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        c = rng.normal(size=3)
        abs_poses[name + ".color.png"] = (c, q)

    def dump_abs(path, names):
        lines = ["header"] * 3
        for n in names:
            c, q = abs_poses[n + ".color.png"]
            lines.append(
                n + ".color.png " + " ".join(f"{v:.8f}" for v in np.concatenate([c, q]))
            )
        path.write_text("\n".join(lines) + "\n")

    dump_abs(sdir / "dataset_train.txt", refs)
    dump_abs(sdir / "dataset_test.txt", queries)

    # pair file: each query paired with every ref; GT relative pose from abs
    lines = []
    for qname in queries:
        for i, rname in enumerate(refs):
            c_r, q_r = abs_poses[rname + ".color.png"]
            c_q, q_q = abs_poses[qname + ".color.png"]
            # 7Scenes convention (AbsPose): q is the world-to-camera rotation,
            # c the camera center; relative ref->query: X_q = R_rel X_r + t_rel
            R_r, R_q = quat2mat(q_r.astype(np.float64)), quat2mat(q_q.astype(np.float64))
            R_rel = R_q @ R_r.T
            t_rel = R_q @ (c_r - c_q)
            from mapfree_tpu.geom import mat2quat

            q_rel = mat2quat(R_rel)
            sim = 1.0 - 0.1 * i
            lines.append(
                f"{rname}.color.png {qname}.color.png {sim:.4f} "
                + " ".join(f"{v:.8f}" for v in np.concatenate([q_rel, t_rel]))
            )
    (sdir / "test_pairs.txt").write_text("\n".join(lines) + "\n")
    return refs, queries


# ----------------------------------------------------------------- tests ----


class TestScanNet:
    def test_dataset_contract(self, tmp_path):
        make_scannet_scene(tmp_path)
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "ScanNet"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.NPZ_ROOT = str(tmp_path / "indices")
        c.DATASET.MIN_OVERLAP_SCORE = 0.0
        c.DATASET.HEIGHT = H
        c.DATASET.WIDTH = W
        ds = ScanNetDataset(c, "test")
        assert len(ds) == 5
        s = ds[0]
        assert s["image0"].shape == (H, W, 3)
        assert s["depth0"].shape == (H, W)
        assert s["T_0to1"].shape == (4, 4)
        assert np.allclose(s["T_0to1"] @ s["T_1to0"], np.eye(4), atol=1e-5)
        assert s["dataset_name"] == "ScanNet"

    def test_batch_decode_matches_getitem(self, tmp_path):
        """ScanNet speaks the batch-decode protocol: getitems == per-item
        decode (rounding aside)."""
        make_scannet_scene(tmp_path)
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "ScanNet"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.NPZ_ROOT = str(tmp_path / "indices")
        c.DATASET.MIN_OVERLAP_SCORE = 0.0
        c.DATASET.HEIGHT = H
        c.DATASET.WIDTH = W
        ds = ScanNetDataset(c, "test")
        batch = ds.getitems([0, 2])

        def f01(x):
            return x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x

        for sample, i in zip(batch, [0, 2]):
            ref = ds[i]
            assert np.abs(f01(sample["image0"]) - f01(ref["image0"])).max() < 0.02
            np.testing.assert_allclose(sample["T_0to1"], ref["T_0to1"])

    def test_relative_pose_from_c2w_files(self, tmp_path):
        poses = make_scannet_scene(tmp_path)
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "ScanNet"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.NPZ_ROOT = str(tmp_path / "indices")
        c.DATASET.MIN_OVERLAP_SCORE = 0.0
        c.DATASET.HEIGHT = H
        c.DATASET.WIDTH = W
        ds = ScanNetDataset(c, "test")
        s = ds[0]
        # T_0to1 = w2c(1) @ c2w(0)
        expected = np.linalg.inv(poses[1]) @ poses[0]
        assert np.allclose(s["T_0to1"], expected, atol=1e-5)

    def test_intrinsic_parser(self, tmp_path):
        make_scannet_scene(tmp_path)
        info = tmp_path / "scans_test/scene0000_00/sensor_data/_info.txt"
        K = read_scannet_intrinsic(info, color=True)
        assert K.shape == (3, 3) and K[0, 0] == 80.0


class TestScanNetEval:
    def test_evaluate_and_report(self, tmp_path, capsys):
        """ScanNet eval loop with an oracle model: near-zero medians, full
        recall, no failures."""
        from mapfree_tpu.benchmark.scannet import evaluate, report

        make_scannet_scene(tmp_path)
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "ScanNet"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.NPZ_ROOT = str(tmp_path / "indices")
        c.DATASET.MIN_OVERLAP_SCORE = 0.0
        c.DATASET.HEIGHT = H
        c.DATASET.WIDTH = W
        ds = ScanNetDataset(c, "test")
        loader = DataLoader(ds, batch_size=5, num_workers=1)

        class OracleModel:
            def predict_batch(self, batch):
                T = np.asarray(batch["T_0to1"])
                return (T[:, :3, :3], T[:, :3, 3].reshape(-1, 1, 3),
                        np.zeros(T.shape[0]))

        agg = evaluate(loader, OracleModel())
        assert np.nanmedian(agg["R_err"]) < 0.1
        assert np.nanmedian(agg["t_err_euc"]) < 1e-4
        report(agg)
        out = capsys.readouterr().out
        assert "Recall @" in out and "failures" in out


class TestSevenScenes:
    def _cfg(self, tmp_path):
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "7Scenes"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.HEIGHT = H
        c.DATASET.WIDTH = W
        c.DATASET.PAIRS_TXT.TEST = "test_pairs.txt"
        return c

    def test_dataset_contract(self, tmp_path):
        make_7scenes_scene(tmp_path)
        c = self._cfg(tmp_path)
        ds = SevenScenesDataset(c, "test")
        assert len(ds) == 12  # 4 queries x 3 refs
        s = ds[0]
        assert s["image0"].shape == (H, W, 3)
        assert s["depth0"].shape == (H, W)
        assert s["K_color0"].shape == (3, 3)
        assert s["sim"] == pytest.approx(1.0)
        assert s["dataset_name"] == "7Scenes"

    def test_one_nn_filter(self, tmp_path):
        make_7scenes_scene(tmp_path)
        c = self._cfg(tmp_path)
        c.DATASET.PAIRS_TXT.ONE_NN = True
        ds = SevenScenesDataset(c, "test")
        assert len(ds) == 4  # highest-similarity ref kept per query
        assert all(ds[i]["sim"] == pytest.approx(1.0) for i in range(4))

    def test_eval_pipeline_end_to_end(self, tmp_path):
        """predict() on a perfect-oracle model + eval_pipeline_without_ransac:
        absolute pose errors must be ~0 and pass rates 100%."""
        from mapfree_tpu.benchmark.localize import eval_pipeline_without_ransac
        from mapfree_tpu.benchmark.sevenscenes import predict

        make_7scenes_scene(tmp_path)
        c = self._cfg(tmp_path)
        ds = SevenScenesDataset(c, "test")
        loader = DataLoader(ds, batch_size=4, num_workers=1)

        class OracleModel:
            def predict_batch(self, batch):
                T = np.asarray(batch["T_0to1"])
                return (T[:, :3, :3], T[:, :3, 3].reshape(-1, 1, 3),
                        np.full(T.shape[0], 50.0))

        results = predict(loader, OracleModel())
        assert "chess" in results
        assert len(results["chess"]["pair_data"]) == 4
        eval_val, passed = eval_pipeline_without_ransac(
            results, err_thres=((0.05, 2), (1, 20)))
        assert eval_val[2] < 1e-4, eval_val  # abs position error [m]
        assert np.allclose(passed, 100.0)


class _SplitOracle:
    """Oracle exposing the transfer/dispatch split, so iter_predictions
    runs its PIPELINED path (utils/submission.py) instead of the serial
    fallback — the parity subject of the tests below."""

    def transfer_batch(self, batch, times=None):
        return np.asarray(batch["T_0to1"])

    def dispatch_device(self, T, times=None):
        return lambda: (T[:, :3, :3], T[:, :3, 3].reshape(-1, 1, 3),
                        np.full(T.shape[0], 50.0))


class TestPipelinedEvalParity:
    """VERDICT r4 weak #5: ScanNet/7Scenes sweeps must use the pipelined
    path AND produce metrics identical to the serial predict_batch loop."""

    def test_scannet_pipelined_matches_serial(self, tmp_path):
        from mapfree_tpu.benchmark.scannet import evaluate

        make_scannet_scene(tmp_path)
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "ScanNet"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.NPZ_ROOT = str(tmp_path / "indices")
        c.DATASET.MIN_OVERLAP_SCORE = 0.0
        c.DATASET.HEIGHT = H
        c.DATASET.WIDTH = W
        ds = ScanNetDataset(c, "test")

        class SerialOracle:
            def predict_batch(self, batch):
                T = np.asarray(batch["T_0to1"])
                return (T[:, :3, :3], T[:, :3, 3].reshape(-1, 1, 3),
                        np.full(T.shape[0], 50.0))

        agg_serial = evaluate(DataLoader(ds, batch_size=3, num_workers=1),
                              SerialOracle())
        agg_pipe = evaluate(DataLoader(ds, batch_size=3, num_workers=1),
                            _SplitOracle())
        assert set(agg_serial) == set(agg_pipe)
        for k in agg_serial:
            np.testing.assert_array_equal(agg_serial[k], agg_pipe[k], err_msg=k)

    def test_sevenscenes_pipelined_matches_serial(self, tmp_path):
        from mapfree_tpu.benchmark.localize import eval_pipeline_without_ransac
        from mapfree_tpu.benchmark.sevenscenes import predict

        make_7scenes_scene(tmp_path)
        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "7Scenes"
        c.DATASET.DATA_ROOT = str(tmp_path)
        c.DATASET.HEIGHT = H
        c.DATASET.WIDTH = W
        c.DATASET.PAIRS_TXT.TEST = "test_pairs.txt"
        ds = SevenScenesDataset(c, "test")

        class SerialOracle:
            def predict_batch(self, batch):
                T = np.asarray(batch["T_0to1"])
                return (T[:, :3, :3], T[:, :3, 3].reshape(-1, 1, 3),
                        np.full(T.shape[0], 50.0))

        out = {}
        for name, model in (("serial", SerialOracle()),
                            ("pipe", _SplitOracle())):
            results = predict(DataLoader(ds, batch_size=4, num_workers=1),
                              model)
            out[name] = eval_pipeline_without_ransac(
                results, err_thres=((0.05, 2), (1, 20)))
        evs, ps = out["serial"]
        evp, pp = out["pipe"]
        np.testing.assert_array_equal(np.asarray(evs), np.asarray(evp))
        np.testing.assert_array_equal(np.asarray(ps), np.asarray(pp))
