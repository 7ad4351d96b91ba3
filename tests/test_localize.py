"""7Scenes localization toolkit tests on synthetic multi-reference scenes."""

import numpy as np
import pytest

from mapfree_tpu.benchmark.localize import (
    AbsPose,
    RelaPose,
    RelaPosePair,
    cal_quat_angle_error,
    cal_vec_angle_error,
    chordal_l2_mean_rotation,
    decompose_essential_matrix,
    essential_matrix_from_pose,
    eval_pipeline_without_ransac,
    geometric_median,
    ransac,
    triangulate_multi_views,
    triangulate_two_views,
)
from mapfree_tpu.geom import mat2quat, quat2mat

rng = np.random.default_rng(11)


def random_quat(scale=1.0):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0.1, 0.8) * scale
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def make_pair(test_abs: AbsPose, train_abs: AbsPose, noise_q=0.0, noise_t=0.0,
              outlier=False):
    """Build a RelaPosePair whose prediction matches (or corrupts) the GT
    relative pose from train to test camera frames."""
    R_rel = test_abs.r @ train_abs.r.T
    t_rel = test_abs.t - R_rel @ train_abs.t
    q_rel = mat2quat(R_rel)
    lbl = RelaPose(q_rel.copy(), t_rel.copy())

    if outlier:
        q_pred = random_quat()
        t_pred = rng.normal(size=3) * 2
    else:
        q_pred = q_rel + rng.normal(size=4) * noise_q
        q_pred /= np.linalg.norm(q_pred)
        t_pred = t_rel + rng.normal(size=3) * noise_t
    pred = RelaPose(q_pred, t_pred)
    pair = RelaPosePair("query.png", train_abs, lbl, pred, sim=1.0)
    pair.inliers = 100.0
    return pair


def synth_scene(n_refs=6, noise_q=0.0, noise_t=0.0, n_outliers=0):
    test_abs = AbsPose(random_quat(), rng.normal(size=3))
    pairs = []
    for i in range(n_refs):
        train_abs = AbsPose(random_quat(), rng.normal(size=3) * 2)
        pairs.append(make_pair(test_abs, train_abs, noise_q, noise_t,
                               outlier=i < n_outliers))
    return test_abs, pairs


class TestPrimitives:
    def test_vec_angle_error(self):
        a = np.array([1.0, 0, 0])
        b = np.array([0.0, 1, 0])
        assert np.isclose(cal_vec_angle_error(a, b)[0, 0], 90.0, atol=0.01)
        assert np.isclose(cal_vec_angle_error(a, a)[0, 0], 0.0)

    def test_quat_angle_error(self):
        q = random_quat()
        assert cal_quat_angle_error(q, q)[0, 0] < 1e-3

    def test_geometric_median_robust(self):
        pts = np.zeros((10, 3))
        pts[:8] = rng.normal(size=(8, 3)) * 0.01 + 5.0
        pts[8:] = 100.0  # outliers
        med = geometric_median(pts)
        assert np.allclose(med, 5.0, atol=0.2)

    def test_chordal_mean(self):
        R = quat2mat(random_quat())
        Rs = [R for _ in range(5)]
        assert np.allclose(chordal_l2_mean_rotation(Rs), R, atol=1e-8)

    def test_triangulation(self):
        X = np.array([1.0, 2.0, 5.0])
        corr = []
        for _ in range(4):
            pose = AbsPose(random_quat(0.3), rng.normal(size=3))
            x_cam = pose.r @ X + pose.t
            corr.append((x_cam[:2] / x_cam[2], pose.p))
        X_tri = triangulate_multi_views(corr)
        assert np.allclose(X_tri, X, atol=1e-8)
        X_tri2 = triangulate_two_views(corr[0][0], corr[0][1], corr[1][0], corr[1][1])
        assert np.allclose(X_tri2, X, atol=1e-8)

    def test_essential_compose_decompose(self):
        R = quat2mat(random_quat())
        t = rng.normal(size=3)
        E = essential_matrix_from_pose(R, t)
        t_dec, R1, R2 = decompose_essential_matrix(E)
        t_unit = t / np.linalg.norm(t)
        assert np.allclose(np.abs(t_dec @ t_unit), 1.0, atol=1e-5)
        assert np.allclose(R, R1, atol=1e-5) or np.allclose(R, R2, atol=1e-5)


class TestRelaPosePair:
    def test_abs_pose_prediction_exact(self):
        """With a perfect relative pose the implied absolute pose of the query
        must equal its GT."""
        test_abs, pairs = synth_scene(n_refs=3)
        for p in pairs:
            assert np.allclose(p.abs_c_pred, test_abs.c, atol=1e-8)
            assert cal_quat_angle_error(p.abs_q_pred, test_abs.q)[0, 0] < 1e-3


class TestEvalPipelines:
    def _results_dict(self, n_queries=5, **kw):
        pair_data = {}
        gt = {}
        for qi in range(n_queries):
            test_abs, pairs = synth_scene(**kw)
            name = f"q{qi}.png"
            for p in pairs:
                p.test_im = name
            pair_data[name] = {"test_abs_pose": test_abs, "test_pairs": pairs}
            gt[name] = test_abs
        return {"scene": {"pair_data": pair_data, "no_pt_pairs": []}}, gt

    def test_without_ransac_perfect(self):
        results, _ = self._results_dict(n_refs=5)
        err_thres = ((0.1, 5), (0.25, 5), (0.5, 10), (1, 20))
        eval_val, passed = eval_pipeline_without_ransac(results, err_thres=err_thres)
        assert eval_val[2] < 1e-6  # abs position error [m]
        assert eval_val[4] < 1e-3  # abs rotation error [deg]
        assert np.allclose(passed, 100.0)

    def test_without_ransac_noisy(self):
        results, _ = self._results_dict(n_refs=8, noise_q=0.002, noise_t=0.01)
        err_thres = ((0.1, 5), (1, 20))
        eval_val, passed = eval_pipeline_without_ransac(results, err_thres=err_thres)
        assert eval_val[2] < 0.1
        assert passed[-1] == 100.0

    def test_ransac_rejects_outliers(self):
        results, _ = self._results_dict(
            n_refs=8, noise_q=0.002, noise_t=0.005, n_outliers=2)
        pair_data = results["scene"]["pair_data"]
        err_thres = ((0.1, 5), (0.5, 10), (1, 20))
        num_tested, approx, pass_rate, errs = ransac(
            pair_data, inlier_thres=15, in_iter=10, pair_type="relapose",
            err_thres=err_thres, loc_results=None)
        assert num_tested == 5
        assert len(approx) == 0
        # median abs position error well under the outlier magnitude
        assert errs[2] < 0.3, errs
        assert pass_rate[-1] >= 80.0

    def test_ess_pair_ransac(self):
        """EssPair path: rotation candidates (R, R') and sign-ambiguous
        translation from an essential matrix must be disambiguated by the
        pose-graph RANSAC."""
        from mapfree_tpu.benchmark.localize import (
            EssPair,
            decompose_essential_matrix,
            essential_matrix_from_pose,
        )

        pair_data = {}
        for qi in range(4):
            test_abs, rel_pairs = synth_scene(n_refs=6)
            name = f"q{qi}.png"
            ess_pairs = []
            for p in rel_pairs:
                R_rel = p.rela_pose_pred.r
                t_rel = p.rela_pose_pred.t
                E = essential_matrix_from_pose(R_rel, t_rel)
                t_dec, R1, R2 = decompose_essential_matrix(E)
                ep = EssPair(name, "train.png", p.train_abs_pose,
                             p.rela_pose_lbl, t_dec, R1, R2)
                ep.inliers = 100.0
                ess_pairs.append(ep)
            pair_data[name] = {"test_abs_pose": test_abs,
                               "test_pairs": ess_pairs}

        num_tested, approx, pass_rate, errs = ransac(
            pair_data, inlier_thres=10, in_iter=10, pair_type="ess",
            err_thres=((0.25, 5), (1, 20)), loc_results=None)
        assert num_tested == 4
        # up-to-scale track: relative rotation must be resolved correctly
        assert errs[1] < 1.0, errs  # median relative rotation error [deg]
        assert errs[4] < 2.0, errs  # median absolute rotation error [deg]

    def test_empty_query_counts_failure(self):
        results, _ = self._results_dict(n_refs=3)
        results["scene"]["pair_data"]["empty.png"] = {
            "test_abs_pose": AbsPose(random_quat(), rng.normal(size=3)),
            "test_pairs": [],
        }
        loc = {}
        num_tested, approx, pass_rate, errs = ransac(
            results["scene"]["pair_data"], inlier_thres=15, in_iter=5,
            pair_type="relapose", err_thres=((1, 20),), loc_results=loc)
        assert loc["empty.png"] is None
        assert num_tested == 6  # sentinel errors included
