"""Golden-value tests pinning the evaluator numerics to the leaderboard
contract (VERDICT r1 item 6).

Every formula here is vendored INDEPENDENTLY of mapfree_tpu — quaternion
algebra written out by hand (transforms3d conventions, float64), VCRE
composed through explicit 4x4 matrices, AP computed by a direct O(N^2)
threshold sweep — and evaluated on a fixed random input set. The framework
evaluator must agree to 1e-12: any numeric drift in
mapfree_tpu/benchmark/{metrics,utils,reprojection}.py fails here before it
can silently change leaderboard scores.

Reference formulas: benchmark/metrics.py:47-67, benchmark/utils.py:95-182,
benchmark/reprojection.py:32-87 in /root/reference.
"""

import numpy as np
import pytest

from mapfree_tpu.benchmark.metrics import Inputs, MetricManager
from mapfree_tpu.benchmark.reprojection import reprojection_error
from mapfree_tpu.benchmark.utils import precision_recall, quat_angle_error

RNG = np.random.default_rng(20260816)
N_CASES = 64


# ----------------------------------------------------------------- vendored
# quaternion algebra, written out longhand (transforms3d conventions, wxyz)


def v_qnorm(q):
    return q / np.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + q[3] ** 2)


def v_qconj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]], np.float64)


def v_qmult(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        np.float64,
    )


def v_quat2mat(q):
    w, x, y, z = v_qnorm(np.asarray(q, np.float64))
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float64,
    )


def v_rot_err_sin_deg(q_gt, q_est):
    """2*arcsin(|vec(q_gt * q_est^-1)|) in degrees; unit-normalised inputs.

    NOTE the argument order: the evaluator computes the residual of the GT
    quaternion against the estimate (reference metrics.py:54-55 passes
    label=q_est, pred=q_gt into quat_angle_error, which forms
    pred * label^-1)."""
    r = v_qmult(v_qnorm(q_gt), v_qconj(v_qnorm(q_est)))
    s = min(1.0, np.sqrt(r[1] ** 2 + r[2] ** 2 + r[3] ** 2))
    return 2.0 * np.degrees(np.arcsin(s))


def v_vcre(q_gt, t_gt, q_est, t_est, K, W, H):
    """VCRE with the grid and projection written out independently."""
    step, nx, ny, nz, z0, y0 = 0.3, 7, 4, 7, 1.8, 0.0
    xs = (np.arange(nx) - (nx - 1) / 2) * step
    ys = (np.arange(ny) - (ny - 1) / 2) * step + y0
    zs = np.arange(nz) * step + z0
    xx, yy, zz = np.meshgrid(xs, ys, zs)
    pts = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=1)  # [196, 3]
    assert pts.shape == (196, 3)

    def proj(p):
        uvw = (K @ p.T).T
        uv = uvw[:, :2] / uvw[:, 2:3]
        return np.stack([np.clip(uv[:, 0], 0, W), np.clip(uv[:, 1], 0, H)], 1)

    T_est = np.eye(4)
    T_est[:3, :3] = v_quat2mat(q_est)
    T_est[:3, 3] = t_est
    T_gt = np.eye(4)
    T_gt[:3, :3] = v_quat2mat(q_gt)
    T_gt[:3, 3] = t_gt

    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    moved = (np.linalg.inv(T_est) @ T_gt @ ph.T).T[:, :3]
    return float(np.linalg.norm(proj(pts) - proj(moved), axis=1).mean())


def v_average_precision(confidence, tp, failures):
    """Direct O(N^2) AP: for each distinct confidence threshold, accept all
    frames at least that confident; AP = sum d_recall * precision."""
    confidence = np.asarray(confidence, np.float64)
    tp = np.asarray(tp, bool)
    ap, prev_rec = 0.0, 0.0
    for thr in sorted(set(confidence.tolist()), reverse=True):
        accept = confidence >= thr
        prec = tp[accept].sum() / accept.sum()
        rec = accept.sum() / (len(tp) + failures)
        ap += (rec - prev_rec) * prec
        prev_rec = rec
    return ap


# ---------------------------------------------------------------- fixtures


def random_unit_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def make_case(rng):
    q_gt = random_unit_quat(rng)
    t_gt = rng.normal(size=3) * 2
    # estimate: GT perturbed, magnitudes spanning tiny to large errors
    scale = 10.0 ** rng.uniform(-6, 0)
    dq = np.array([1.0, *(rng.normal(size=3) * scale)])
    q_est = v_qnorm(v_qmult(q_gt, v_qnorm(dq)))
    t_est = t_gt + rng.normal(size=3) * scale
    fx, fy = rng.uniform(300, 600, size=2)
    W, H = 540, 720
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1.0]])
    return q_gt, t_gt, q_est, t_est, K, W, H


CASES = [make_case(RNG) for _ in range(N_CASES)]


# ------------------------------------------------------------------- tests


@pytest.mark.parametrize("case", range(N_CASES))
def test_frame_metrics_match_vendored_formulas(case):
    q_gt, t_gt, q_est, t_est, K, W, H = CASES[case]
    inputs = Inputs(
        q_gt=q_gt, t_gt=t_gt, q_est=q_est, t_est=t_est,
        confidence=1.0, K=K, W=W, H=H,
    )
    assert MetricManager.trans_err(inputs) == pytest.approx(
        np.linalg.norm(t_est - t_gt), abs=1e-12
    )
    assert MetricManager.rot_err(inputs) == pytest.approx(
        v_rot_err_sin_deg(q_gt, q_est), abs=1e-10
    )
    assert MetricManager.reproj_err(inputs) == pytest.approx(
        v_vcre(q_gt, t_gt, q_est, t_est, K, W, H), abs=1e-9
    )


def test_quat_angle_error_cos_variant_matches():
    for case in range(0, N_CASES, 4):
        q_gt, _, q_est, _, _, _, _ = CASES[case]
        got = quat_angle_error(label=q_est, pred=q_gt, variant="cos")[0, 0]
        d = min(1.0, abs(float(np.dot(v_qnorm(q_gt), v_qnorm(q_est)))))
        # arccos near 1 amplifies ulp noise by 1/sqrt(1-d^2): only a relative
        # tolerance is meaningful for the cos variant at small angles (which
        # is exactly why the evaluator defaults to the sin variant)
        assert got == pytest.approx(
            2.0 * np.degrees(np.arccos(d)), rel=1e-4, abs=1e-9
        )


@pytest.mark.parametrize("failures", [0, 3])
@pytest.mark.parametrize("ties", [False, True])
def test_average_precision_matches_direct_sweep(failures, ties):
    rng = np.random.default_rng(7 + failures + ties)
    n = 40
    conf = rng.uniform(0, 10, size=n)
    if ties:
        conf = np.round(conf)  # repeated confidence values
    tp = rng.random(size=n) < 0.6
    _, _, ap = precision_recall(conf, tp, failures)
    assert ap == pytest.approx(v_average_precision(conf, tp, failures), abs=1e-12)


def test_vcre_identity_is_zero():
    q_gt, t_gt, _, _, K, W, H = CASES[0]
    err = reprojection_error(q_gt, t_gt, q_gt, t_gt, K, W, H)
    assert err == pytest.approx(0.0, abs=1e-12)  # inv(T) @ T rounding only
