"""Batched RANSAC solver tests on synthetic geometry with outliers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapfree_tpu.geom import quat2mat
from mapfree_tpu.ops.essential import (
    essential_pose,
    metric_scale_from_depth,
    normalize_keypoints,
)
from mapfree_tpu.ops.pnp import pnp_pose
from mapfree_tpu.ops.procrustes_ransac import (
    dense_cloud_from_depth,
    icp_point_to_point,
    procrustes_pose,
)

rng = np.random.default_rng(7)
IMG_H, IMG_W = 120, 160
K = np.array([[120.0, 0, 80], [0, 120.0, 60], [0, 0, 1]], np.float32)


def random_rotation(max_angle=0.5, gen=None):
    gen = rng if gen is None else gen
    axis = gen.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = gen.uniform(max_angle / 2, max_angle)
    q = np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])
    return quat2mat(q)


def synth_pair(n_points=200, n_outliers=0, noise=0.0, seed=0):
    """Two views of a random 3D scene. Returns kpts0, kpts1, mask, R, t, X."""
    local = np.random.default_rng(seed)
    R = random_rotation(gen=local)
    t = local.normal(size=3)
    t = t / np.linalg.norm(t) * local.uniform(0.5, 2.0)

    X = np.stack(
        [
            local.uniform(-2, 2, n_points),
            local.uniform(-1.5, 1.5, n_points),
            local.uniform(3, 8, n_points),
        ],
        axis=-1,
    )  # camera-0 frame, in front
    X1 = X @ R.T + t

    def project(P):
        uv = (P @ K.T)
        return uv[:, :2] / uv[:, 2:]

    k0 = project(X) + local.normal(size=(n_points, 2)) * noise
    k1 = project(X1) + local.normal(size=(n_points, 2)) * noise
    if n_outliers:
        idx = local.choice(n_points, n_outliers, replace=False)
        k1[idx] = local.uniform(0, [IMG_W, IMG_H], size=(n_outliers, 2))
    mask = np.ones(n_points, bool)
    return k0, k1, mask, R, t, X


def rot_err_deg(R_est, R_gt):
    c = (np.trace(R_est.T @ R_gt) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def t_dir_err_deg(t_est, t_gt):
    c = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
    return np.degrees(np.arccos(np.clip(abs(c), -1, 1)))


class TestSampling:
    def test_masked_sample_indices(self):
        """Distinctness + validity + rough uniformity of the minimal-set
        sampler (top-k-of-uniforms draw, ops/ransac.py)."""
        from mapfree_tpu.ops.ransac import masked_sample_indices

        N, n_iters, k = 64, 4096, 5
        mask = np.zeros(N, bool)
        valid = np.arange(3, N, 2)  # 31 valid points at odd-ish positions
        mask[valid] = True
        idx = np.asarray(masked_sample_indices(
            jax.random.PRNGKey(0), jnp.asarray(mask), n_iters, k))
        assert idx.shape == (n_iters, k)
        # every pick valid
        assert mask[idx].all()
        # all picks within a draw distinct
        assert all(len(set(row)) == k for row in idx)
        # rough uniformity: every valid point picked, counts within 3x
        counts = np.bincount(idx.reshape(-1), minlength=N)[valid]
        assert counts.min() > 0
        assert counts.max() < 3 * counts.mean()

    def test_masked_sample_indices_too_few_valid(self):
        from mapfree_tpu.ops.ransac import masked_sample_indices

        mask = np.zeros(16, bool)
        mask[[2, 9]] = True
        idx = np.asarray(masked_sample_indices(
            jax.random.PRNGKey(1), jnp.asarray(mask), 8, 5))
        # repeats unavoidable, but every pick stays on valid data
        assert mask[idx].all()


class TestEssential:
    def test_clean_recovery(self):
        k0, k1, mask, R, t, _ = synth_pair(seed=1)
        out = essential_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), jnp.asarray(mask[None]),
            jnp.asarray(K[None]), jnp.asarray(K[None]), 2.0, n_iters=256,
        )
        R_est = np.asarray(out["R"][0])
        t_est = np.asarray(out["t"][0])
        assert rot_err_deg(R_est, R) < 1.0
        assert t_dir_err_deg(t_est, t) < 1.0
        assert int(out["inliers"][0]) > 150

    def test_with_outliers(self):
        """40% outliers + 0.3 px noise: median accuracy over seeds must hold
        (individual draws can land in a competing epipolar basin, as with the
        reference's MAGSAC)."""
        rot_errs, t_errs = [], []
        for s in range(5):
            k0, k1, mask, R, t, _ = synth_pair(n_outliers=80, noise=0.3, seed=2 + s)
            out = essential_pose(
                jax.random.PRNGKey(s),
                jnp.asarray(k0[None]), jnp.asarray(k1[None]),
                jnp.asarray(mask[None]),
                jnp.asarray(K[None]), jnp.asarray(K[None]), 2.0, n_iters=1024,
            )
            rot_errs.append(rot_err_deg(np.asarray(out["R"][0]), R))
            t_errs.append(t_dir_err_deg(np.asarray(out["t"][0]), t))
        assert np.median(rot_errs) < 2.0, rot_errs
        assert np.median(t_errs) < 6.0, t_errs

    def test_planar_scene_degensac(self):
        """All correspondences on one plane: every H-consistent E has zero
        Sampson error, so the 8-point estimate is arbitrary (the classic
        H-degeneracy). The homography-rescue path must recover the pose."""
        local = np.random.default_rng(5)
        R = random_rotation(0.4, gen=local)
        t = local.normal(size=3)
        t = t / np.linalg.norm(t) * 1.0
        n = 200
        X = np.stack([local.uniform(-2, 2, n), local.uniform(-1.5, 1.5, n),
                      np.full(n, 5.0)], -1)
        X1 = X @ R.T + t

        def proj(P):
            uv = P @ K.T
            return uv[:, :2] / uv[:, 2:]

        k0 = proj(X) + local.normal(size=(n, 2)) * 0.3
        k1 = proj(X1) + local.normal(size=(n, 2)) * 0.3
        out = essential_pose(
            jax.random.PRNGKey(5),
            jnp.asarray(k0[None], jnp.float32), jnp.asarray(k1[None], jnp.float32),
            jnp.asarray(np.ones((1, n), bool)),
            jnp.asarray(K[None]), jnp.asarray(K[None]), 2.0, n_iters=512,
        )
        assert rot_err_deg(np.asarray(out["R"][0]), R) < 2.0
        assert t_dir_err_deg(np.asarray(out["t"][0]), t) < 8.0

    def test_five_point_minimal_clean(self):
        """The Nistér 5-point solver recovers the true E from an exact
        minimal sample (up to scale/sign; one of the <= 10 roots)."""
        from mapfree_tpu.ops.essential import (
            _five_point_candidates,
            normalize_keypoints,
        )

        k0, k1, _, R, t, _ = synth_pair(n_points=5, noise=0.0, seed=42)
        x0 = normalize_keypoints(jnp.asarray(k0), jnp.asarray(K))
        x1 = normalize_keypoints(jnp.asarray(k1), jnp.asarray(K))
        Es, valid = _five_point_candidates(x0, x1)
        Es, valid = np.asarray(Es), np.asarray(valid)
        assert valid.sum() >= 1

        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        E_true = tx @ R
        E_true /= np.linalg.norm(E_true)
        best = min(
            min(np.abs(E / np.linalg.norm(E) - E_true).max(),
                np.abs(E / np.linalg.norm(E) + E_true).max())
            for E, v in zip(Es, valid) if v
        )
        assert best < 5e-3, best  # float32 root isolation

    def test_high_outlier_stress(self):
        """50% outliers + 0.5 px noise — the regime where the 8-point-only
        pipeline lost the epipolar basin (r1 VERDICT item 4): median rot
        error was ~6 deg with 24 deg failures; the 5-point + MAGSAC pipeline
        must stay tight on every seed."""
        rot_errs, t_errs = [], []
        for s in range(5):
            k0, k1, mask, R, t, _ = synth_pair(
                n_points=200, n_outliers=100, noise=0.5, seed=100 + s)
            out = essential_pose(
                jax.random.PRNGKey(s),
                jnp.asarray(k0[None]), jnp.asarray(k1[None]),
                jnp.asarray(mask[None]),
                jnp.asarray(K[None]), jnp.asarray(K[None]), 2.0, n_iters=512,
            )
            rot_errs.append(rot_err_deg(np.asarray(out["R"][0]), R))
            t_errs.append(t_dir_err_deg(np.asarray(out["t"][0]), t))
        assert np.median(rot_errs) < 2.5, rot_errs
        assert np.max(rot_errs) < 8.0, rot_errs
        assert np.median(t_errs) < 6.0, t_errs

    def test_magsac_regime_stress(self):
        """70% outliers + 2 px noise (threshold == noise sigma) — the regime
        sigma-marginalised scoring was invented for (r2 VERDICT weak #7).
        Needs the 5-point-heavy budget: at w=0.3 the all-inlier 5-sample
        probability is 0.3^5, so accuracy here is bought with n5.

        Bars are set relative to OpenCV USAC_MAGSAC on the IDENTICAL data
        (this harness's f=120 tiny-image geometry makes 2 px noise ~4x the
        angular noise of docs/SOLVER_THROUGHPUT.md's f=500 setup): OpenCV
        per-seed rot errors 10.8/3.9/12.4 deg (median 10.8), t-dir median
        46.3 deg. Per-pair error here is dominated by basin luck (measured
        4.3-11.4 deg across RANSAC keys on the same pair), so each pair is
        solved under TWO keys and the bars sit on the pooled 6-value median
        with margin: ours measured ~9.0 vs OpenCV's 10.8. The t-dir bar is
        a same-ballpark regression guard (both solvers are weakly
        constrained in t here), not a superiority claim."""
        from mapfree_tpu.ops.essential import estimate_essential
        from mapfree_tpu.ops.essential import (cheirality_pose,
                                               normalize_keypoints)

        rot_errs, t_errs = [], []
        for s in range(3):
            k0, k1, mask, R, t, _ = synth_pair(
                n_points=300, n_outliers=210, noise=2.0, seed=300 + s)
            x0 = normalize_keypoints(jnp.asarray(k0), jnp.asarray(K))
            x1 = normalize_keypoints(jnp.asarray(k1), jnp.asarray(K))
            thr = 2.0 / float(K[0, 0])
            solve = jax.jit(
                lambda key, x0, x1, m: estimate_essential(
                    key, x0, x1, m, thr, n_iters=256, n5=1024, lo_topk=16))
            for kk in (s, 100 + s):
                E, inl, valid = solve(
                    jax.random.PRNGKey(kk), x0, x1, jnp.asarray(mask))
                R_e, t_e, _, _ = cheirality_pose(E, x0, x1, inl)
                rot_errs.append(rot_err_deg(np.asarray(R_e), R))
                t_errs.append(t_dir_err_deg(np.asarray(t_e), t))
        assert np.median(rot_errs) < 10.5, rot_errs  # OpenCV: 10.8
        assert np.max(rot_errs) < 16.0, rot_errs  # OpenCV: 12.4
        assert np.median(t_errs) < 55.0, t_errs  # OpenCV: 46.3

    def test_essential_pose_under_sharding(self):
        """The batched solver IS the matching track's production dispatch —
        run it with the batch sharded over the 8-device data mesh and assert
        the accuracy contract holds shard-for-shard. Bitwise equality with
        the unsharded run is NOT the contract: shard-shape-dependent fusion
        changes f32 accumulation order, and RANSAC's argmin amplifies
        epsilon score differences into different (equally valid) winners.
        What sharding must preserve is validity + pose quality vs ground
        truth on every pair. Complements the RPR-side sharded predict
        coverage in tests/test_multihost.py (SURVEY §2.8)."""
        from mapfree_tpu.parallel import make_mesh, shard_batch

        B, n_dev = 8, len(jax.devices())
        assert n_dev >= 8, "conftest forces an 8-device CPU mesh"
        pairs = [synth_pair(n_points=96, n_outliers=24, noise=0.5, seed=40 + b)
                 for b in range(B)]
        k0 = jnp.asarray(np.stack([p[0] for p in pairs]), jnp.float32)
        k1 = jnp.asarray(np.stack([p[1] for p in pairs]), jnp.float32)
        mask = jnp.asarray(np.stack([p[2] for p in pairs]))
        Kb = jnp.tile(jnp.asarray(K)[None], (B, 1, 1))
        key = jax.random.PRNGKey(7)

        out_single = essential_pose(key, k0, k1, mask, Kb, Kb, 2.0,
                                    n_iters=256, n5=64)

        mesh = make_mesh()
        batch = shard_batch({"k0": k0, "k1": k1, "mask": mask, "K": Kb}, mesh)
        out_sharded = essential_pose(
            key, batch["k0"], batch["k1"], batch["mask"], batch["K"],
            batch["K"], 2.0, n_iters=256, n5=64)

        for out in (out_single, out_sharded):
            assert np.asarray(out["valid"]).all()
            for b, (_, _, _, R_gt, t_gt, _) in enumerate(pairs):
                R_b = np.asarray(out["R"][b])
                t_b = np.asarray(out["t"][b])
                assert rot_err_deg(R_b, R_gt) < 3.0, b
                assert t_dir_err_deg(t_b, t_gt) < 10.0, b

    def test_adaptive_budget_matches_fixed(self):
        """Two-tier ladder (essential_pose_adaptive): an easy pair settles at
        the cheap tier, a hard one escalates to the full budget — accuracy
        must hold for both in one mixed batch."""
        from mapfree_tpu.ops.essential import essential_pose_adaptive

        easy = synth_pair(n_points=200, seed=21)
        hard = synth_pair(n_points=200, n_outliers=100, noise=0.5, seed=22)
        k0 = jnp.asarray(np.stack([easy[0], hard[0]]))
        k1 = jnp.asarray(np.stack([easy[1], hard[1]]))
        mask = jnp.asarray(np.stack([easy[2], hard[2]]))
        Ks = jnp.asarray(np.tile(K, (2, 1, 1)))
        out = essential_pose_adaptive(
            jax.random.PRNGKey(3), k0, k1, mask, Ks, Ks, 2.0, n_iters=512)
        assert rot_err_deg(np.asarray(out["R"][0]), easy[3]) < 1.5
        assert t_dir_err_deg(np.asarray(out["t"][0]), easy[4]) < 2.0
        assert rot_err_deg(np.asarray(out["R"][1]), hard[3]) < 4.0
        assert t_dir_err_deg(np.asarray(out["t"][1]), hard[4]) < 8.0

    def test_too_few_points_nan(self):
        k0 = np.zeros((1, 16, 2), np.float32)
        k1 = np.zeros((1, 16, 2), np.float32)
        mask = np.zeros((1, 16), bool)
        mask[0, :3] = True
        out = essential_pose(
            jax.random.PRNGKey(0), jnp.asarray(k0), jnp.asarray(k1),
            jnp.asarray(mask), jnp.asarray(K[None]), jnp.asarray(K[None]), 2.0,
            n_iters=32,
        )
        assert np.all(np.isnan(np.asarray(out["R"][0])))
        assert int(out["inliers"][0]) == 0

    def test_batched_pairs(self):
        pairs = [synth_pair(seed=s) for s in (3, 4, 5)]
        k0 = jnp.asarray(np.stack([p[0] for p in pairs]))
        k1 = jnp.asarray(np.stack([p[1] for p in pairs]))
        mask = jnp.asarray(np.stack([p[2] for p in pairs]))
        Ks = jnp.asarray(np.tile(K, (3, 1, 1)))
        out = essential_pose(jax.random.PRNGKey(2), k0, k1, mask, Ks, Ks, 2.0,
                             n_iters=256)
        for i, (_, _, _, R, t, _) in enumerate(pairs):
            assert rot_err_deg(np.asarray(out["R"][i]), R) < 1.5
            assert t_dir_err_deg(np.asarray(out["t"][i]), t) < 1.5

    def test_metric_scale_ransac(self):
        k0, k1, mask, R, t, X = synth_pair(seed=6)
        # depth maps consistent with the geometry
        depth0 = np.zeros((IMG_H, IMG_W), np.float32)
        depth1 = np.zeros((IMG_H, IMG_W), np.float32)
        X1 = X @ R.T + t
        for P, depth in ((X, depth0), (X1, depth1)):
            uv = (P @ K.T)
            uv = uv[:, :2] / uv[:, 2:]
            ui = np.clip(uv[:, 0].astype(int), 0, IMG_W - 1)
            vi = np.clip(uv[:, 1].astype(int), 0, IMG_H - 1)
            depth[vi, ui] = P[:, 2]

        out = essential_pose(
            jax.random.PRNGKey(3),
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), jnp.asarray(mask[None]),
            jnp.asarray(K[None]), jnp.asarray(K[None]), 2.0, n_iters=256,
        )
        t_metric, n_inl, ok = metric_scale_from_depth(
            out["R"], out["t"], jnp.asarray(k0[None]), jnp.asarray(k1[None]),
            out["inlier_mask"], jnp.asarray(depth0[None]), jnp.asarray(depth1[None]),
            jnp.asarray(K[None]), jnp.asarray(K[None]), scale_threshold=0.1,
        )
        assert bool(ok[0])
        t_est = np.asarray(t_metric[0])
        # sign of the unit translation may be flipped; metric scale projects
        # onto it so the recovered vector must match t up to solver sign
        err = min(np.linalg.norm(t_est - t), np.linalg.norm(t_est + t))
        assert err < 0.15, (t_est, t)


class TestPnP:
    def test_lambda_twist_minimal(self):
        """Lambda-Twist P3P (ops/pnp.py _p3p_poses) on exact instances: the
        candidate set must contain the true pose. f32 tail note: near the
        danger-cylinder configurations the depth system is locally flat at
        f32 resolution (measured residual-indistinguishable depths 4e-4
        apart), so a small tail of best-candidate error is inherent to the
        precision, not the solver — bars follow the measured distribution
        (500 trials: median 0.0, p90 0.019, p99 0.03, max 5.2 deg)."""
        from mapfree_tpu.ops.pnp import _p3p_poses

        gen = np.random.default_rng(11)
        trials = 100
        Xs, xs, Rg, tg = [], [], [], []
        for _ in range(trials):
            R = random_rotation(max_angle=np.pi, gen=gen)
            t = gen.normal(size=3)
            Z = np.stack([gen.uniform(-1, 1, 3), gen.uniform(-1, 1, 3),
                          gen.uniform(2, 6, 3)], -1)
            Xs.append((Z - t) @ R)
            xs.append(Z[:, :2] / Z[:, 2:])
            Rg.append(R)
            tg.append(t)
        Rs, ts, ok = jax.jit(jax.vmap(_p3p_poses))(
            jnp.asarray(np.stack(Xs), jnp.float32),
            jnp.asarray(np.stack(xs), jnp.float32))
        Rs, ts, ok = np.asarray(Rs), np.asarray(ts), np.asarray(ok)
        assert ok.any(axis=1).all(), "some instance yielded no candidate"
        bests = []
        for i in range(trials):
            errs = [rot_err_deg(Rs[i, k], Rg[i])
                    for k in range(4) if ok[i, k]]
            bests.append(min(errs))
        bests = np.asarray(bests)
        assert np.median(bests) < 0.01, np.median(bests)
        assert np.percentile(bests, 90) < 0.5, np.percentile(bests, 90)
        assert np.max(bests) < 30.0, np.max(bests)

    def _depth_for(self, X, k0):
        depth0 = np.zeros((IMG_H, IMG_W), np.float32)
        ui = np.clip(k0[:, 0].astype(int), 0, IMG_W - 1)
        vi = np.clip(k0[:, 1].astype(int), 0, IMG_H - 1)
        depth0[vi, ui] = X[:, 2]
        return depth0

    def test_clean_recovery(self):
        k0, k1, mask, R, t, X = synth_pair(seed=8)
        depth0 = self._depth_for(X, k0)
        out = pnp_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), jnp.asarray(mask[None]),
            jnp.asarray(depth0[None]), jnp.asarray(K[None]), jnp.asarray(K[None]),
            reproj_threshold=3.0, n_iters=256,
        )
        R_est = np.asarray(out["R"][0])
        t_est = np.asarray(out["t"][0])
        assert rot_err_deg(R_est, R) < 2.0
        assert np.linalg.norm(t_est - t) < 0.2, (t_est, t)

    def test_with_outliers(self):
        k0, k1, mask, R, t, X = synth_pair(n_outliers=60, seed=9)
        depth0 = self._depth_for(X, k0)
        out = pnp_pose(
            jax.random.PRNGKey(1),
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), jnp.asarray(mask[None]),
            jnp.asarray(depth0[None]), jnp.asarray(K[None]), jnp.asarray(K[None]),
            reproj_threshold=3.0, n_iters=1024,
        )
        assert rot_err_deg(np.asarray(out["R"][0]), R) < 3.0
        assert np.linalg.norm(np.asarray(out["t"][0]) - t) < 0.3

    def test_planar_scene(self):
        """Coplanar 3D points degenerate the DLT nullspace; the P3P minimal
        hypotheses must still recover the pose (MapFree scenes are often
        near-planar facades)."""
        local = np.random.default_rng(3)
        R = random_rotation(0.4, gen=local)
        t = local.normal(size=3) * 0.5
        n = 150
        X = np.stack([local.uniform(-2, 2, n), local.uniform(-1.5, 1.5, n),
                      np.full(n, 5.0)], -1)
        X1 = X @ R.T + t

        def proj(P):
            uv = P @ K.T
            return uv[:, :2] / uv[:, 2:]

        k0 = proj(X)
        k1 = proj(X1) + local.normal(size=(n, 2)) * 0.3
        depth0 = self._depth_for(X, k0)
        out = pnp_pose(
            jax.random.PRNGKey(3),
            jnp.asarray(k0[None], jnp.float32), jnp.asarray(k1[None], jnp.float32),
            jnp.asarray(np.ones((1, n), bool)), jnp.asarray(depth0[None]),
            jnp.asarray(K[None]), jnp.asarray(K[None]),
            reproj_threshold=3.0, n_iters=512,
        )
        assert rot_err_deg(np.asarray(out["R"][0]), R) < 2.0
        assert np.linalg.norm(np.asarray(out["t"][0]) - t) < 0.2

    def test_no_depth_nan(self):
        k0, k1, mask, R, t, X = synth_pair(seed=10)
        depth0 = np.zeros((IMG_H, IMG_W), np.float32)
        out = pnp_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), jnp.asarray(mask[None]),
            jnp.asarray(depth0[None]), jnp.asarray(K[None]), jnp.asarray(K[None]),
            reproj_threshold=3.0, n_iters=32,
        )
        assert np.all(np.isnan(np.asarray(out["R"][0])))


class TestProcrustes:
    def test_clean_recovery(self):
        k0, k1, mask, R, t, X = synth_pair(seed=11)
        X1 = X @ R.T + t
        depth0 = np.zeros((IMG_H, IMG_W), np.float32)
        depth1 = np.zeros((IMG_H, IMG_W), np.float32)
        for P, kk, depth in ((X, k0, depth0), (X1, k1, depth1)):
            ui = np.clip(kk[:, 0].astype(int), 0, IMG_W - 1)
            vi = np.clip(kk[:, 1].astype(int), 0, IMG_H - 1)
            depth[vi, ui] = P[:, 2]
        out = procrustes_pose(
            jax.random.PRNGKey(0),
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), jnp.asarray(mask[None]),
            jnp.asarray(depth0[None]), jnp.asarray(depth1[None]),
            jnp.asarray(K[None]), jnp.asarray(K[None]), max_corr_dist=0.3,
            n_iters=128,
        )
        assert rot_err_deg(np.asarray(out["R"][0]), R) < 3.0
        assert np.linalg.norm(np.asarray(out["t"][0]) - t) < 0.3

    def test_icp_refines(self):
        """ICP from a perturbed initialisation converges to the GT transform."""
        local = np.random.default_rng(12)
        cloud0 = local.uniform(-1, 1, size=(512, 3)).astype(np.float32)
        R = random_rotation(0.3)
        t = np.array([0.2, -0.1, 0.15], np.float32)
        cloud1 = (cloud0 @ R.T + t).astype(np.float32)
        mask = np.ones(512, bool)

        # perturbed init
        R0 = random_rotation(0.05) @ R
        t0 = t + 0.05
        R_ref, t_ref = icp_point_to_point(
            jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
            jnp.asarray(cloud0), jnp.asarray(mask),
            jnp.asarray(cloud1), jnp.asarray(mask), max_corr_dist=0.5,
        )
        assert rot_err_deg(np.asarray(R_ref), R) < 0.5
        assert np.linalg.norm(np.asarray(t_ref) - t) < 0.02

    def test_dense_cloud_helper(self):
        depth = np.zeros((24, 32), np.float32)
        depth[5:15, 5:25] = 2.0
        cloud, mask = dense_cloud_from_depth(depth, K, max_points=64)
        assert cloud.shape == (64, 3)
        assert mask.sum() == 64  # 200 valid pixels subsampled to 64
        assert np.allclose(cloud[mask][:, 2], 2.0)
