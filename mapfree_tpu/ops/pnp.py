"""Batched PnP (2D-3D) with RANSAC + Gauss-Newton refinement.

TPU-native replacement for the reference's OpenCV PnP path
(reference lib/models/matching/pose_solver.py:175-235):
- ``cv.solvePnPRansac(SOLVEPNP_P3P)`` -> fixed-budget RANSAC with a vmapped
  DLT (6-point) minimal solver and pixel reprojection scoring;
- ``cv.solvePnPGeneric(SOLVEPNP_ITERATIVE)`` inlier refinement -> fixed-step
  Gauss-Newton on the axis-angle + translation parametrisation;
- the ||t|| > 1000 degenerate-solution guard is preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mapfree_tpu.geom.smallblas import (det3, f32_matmuls as _f32_matmuls,
                                        smallest_eigvecs, svd3)
from mapfree_tpu.geom.rotation import inv_rodrigues, rodrigues
from mapfree_tpu.ops.ransac import masked_sample_indices

_MIN_PNP_POINTS = 4
_GN_ITERS = 10
_SAMPLE_SIZE = 6


def _pose_from_P(p, Xh, w):
    """Orthogonalize a 12-vector projection estimate into (R, t)."""
    P = p.reshape(3, 4)
    # fix sign: points must be in front (positive depth on average)
    depths = Xh @ P[2]
    sgn = jnp.sign(jnp.sum(jnp.sign(depths) * w))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    P = P * sgn
    M = P[:, :3]
    U, S, Vt = svd3(M)
    R = U @ Vt
    R = R * jnp.sign(det3(R))
    scale = jnp.sum(S) / 3.0
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return R, t


def _dlt_pose(X, x, w):
    """Weighted DLT for the projection P = [R|t] from 3D-2D correspondences.

    Returns TWO pose candidates: for coplanar 3D points the DLT system has a
    2-dimensional nullspace (the classic planar pose ambiguity), so both of
    the two smallest eigenvectors are emitted as hypotheses — RANSAC scoring
    over all correspondences disambiguates. For well-conditioned samples the
    second candidate is noise and scores away.

    Args:
        X: [M, 3] 3D points (camera-0 frame); x: [M, 2] normalized image
        coords in camera 1; w: [M] weights.
    Returns (R [2,3,3], t [2,3]).
    """
    ones = jnp.ones_like(X[:, 0])
    Xh = jnp.concatenate([X, ones[:, None]], axis=-1)  # [M, 4]
    u, v = x[:, 0], x[:, 1]
    # two rows per point of A p = 0, p = vec(P) (12)
    row_u = jnp.concatenate(
        [Xh, jnp.zeros_like(Xh), -u[:, None] * Xh], axis=-1
    )  # [M, 12]
    row_v = jnp.concatenate(
        [jnp.zeros_like(Xh), Xh, -v[:, None] * Xh], axis=-1
    )
    A = jnp.concatenate([row_u * w[:, None], row_v * w[:, None]], axis=0)
    # bottom-2 subspace: the exact nullspace vector plus one more low-residual
    # direction as a second hypothesis (both get scored downstream)
    V = smallest_eigvecs(A.T @ A, 2)
    R0, t0 = _pose_from_P(V[:, 0], Xh, w)
    R1, t1 = _pose_from_P(V[:, 1], Xh, w)
    return jnp.stack([R0, R1]), jnp.stack([t0, t1])


_P3P_STARTS = jnp.asarray([
    [0.25, 0.25, 0.25],
    [0.5, 0.5, 0.5],
    [1.0, 1.0, 1.0],
    [2.0, 2.0, 2.0],
    [1.0, 1.0, 2.0],
    [2.0, 1.0, 1.0],
])


def _p3p_poses(X3, x3n):
    """P3P: poses from 3 3D-2D correspondences (planar-safe minimal solver).

    Solves the Grunert depth system
        s_i^2 + s_j^2 - 2 s_i s_j cos(angle_ij) = |P_i - P_j|^2
    with damped Newton from several deterministic starts (branchless; the up
    to 4 true solutions are covered by start multiplicity and RANSAC sample
    redundancy), then recovers (R, t) by Kabsch on the 3 camera-frame points.

    Args:
        X3: [3, 3] 3D points; x3n: [3, 2] normalized image coords.
    Returns (R [S, 3, 3], t [S, 3], valid [S]) for S starts.
    """
    from mapfree_tpu.geom.procrustes import procrustes

    f = jnp.concatenate([x3n, jnp.ones_like(x3n[:, :1])], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)  # bearings [3, 3]
    cos_ab = jnp.asarray([f[1] @ f[2], f[0] @ f[2], f[0] @ f[1]])
    d_sq = jnp.asarray([
        jnp.sum((X3[1] - X3[2]) ** 2),
        jnp.sum((X3[0] - X3[2]) ** 2),
        jnp.sum((X3[0] - X3[1]) ** 2),
    ])

    # isoceles-triangle scale estimate for the starts
    denom = jnp.sqrt(jnp.maximum(2.0 * (1.0 - cos_ab), 1e-9))
    s_bar = jnp.mean(jnp.sqrt(d_sq) / denom)
    starts = _P3P_STARTS * s_bar  # [S, 3]

    def residual(s):
        return jnp.asarray([
            s[1] ** 2 + s[2] ** 2 - 2 * s[1] * s[2] * cos_ab[0] - d_sq[0],
            s[0] ** 2 + s[2] ** 2 - 2 * s[0] * s[2] * cos_ab[1] - d_sq[1],
            s[0] ** 2 + s[1] ** 2 - 2 * s[0] * s[1] * cos_ab[2] - d_sq[2],
        ])

    def newton(s0):
        def step(s, _):
            r = residual(s)
            J = jax.jacfwd(residual)(s)
            delta = jnp.linalg.solve(J + 1e-9 * jnp.eye(3), r)
            s_new = jnp.maximum(s - delta, 1e-6)
            better = jnp.sum(residual(s_new) ** 2) < jnp.sum(r**2)
            return jnp.where(better, s_new, s), None

        s, _ = jax.lax.scan(step, s0, None, length=12)
        ok = jnp.sum(residual(s) ** 2) < 1e-6 * jnp.maximum(jnp.sum(d_sq), 1e-9)
        return s, ok

    depths, valid = jax.vmap(newton)(starts)  # [S, 3], [S]
    Z = depths[..., None] * f[None]  # camera-frame points [S, 3, 3]
    R, t = procrustes(jnp.broadcast_to(X3, Z.shape), Z)  # world -> camera
    return R, t[:, 0], valid


def _reproj_residual_sq(R, t, X, x_norm):
    """Squared reprojection residual in normalized coords, [N]."""
    Xc = X @ R.T + t
    z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    proj = Xc[:, :2] / z[:, None]
    behind = Xc[:, 2] <= 0
    err = jnp.sum((proj - x_norm) ** 2, axis=-1)
    return jnp.where(behind, 1e12, err)


def _gauss_newton(R0, t0, X, x_norm, w, n_iters=_GN_ITERS, damping=1e-6):
    """Fixed-iteration damped GN on (rvec, t) minimising weighted reprojection."""
    params0 = jnp.concatenate([inv_rodrigues(R0), t0])

    def residual(params):
        R = rodrigues(params[:3])
        t = params[3:]
        Xc = X @ R.T + t
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        proj = Xc[:, :2] / z[:, None]
        return ((proj - x_norm) * w[:, None]).reshape(-1)  # [2N]

    def step(params, _):
        r = residual(params)
        J = jax.jacfwd(residual)(params)  # [2N, 6]
        JtJ = J.T @ J + damping * jnp.eye(6)
        g = J.T @ r
        delta = jnp.linalg.solve(JtJ, g)
        new_params = params - delta
        # keep the update only if it reduces the cost
        better = jnp.sum(residual(new_params) ** 2) < jnp.sum(r**2)
        return jnp.where(better, new_params, params), None

    params, _ = jax.lax.scan(step, params0, None, length=n_iters)
    return rodrigues(params[:3]), params[3:]


@partial(jax.jit, static_argnames=("n_iters",))
@_f32_matmuls
def pnp_pose(key, pts0, pts1, mask, depth0, K0, K1,
             reproj_threshold, n_iters: int = 512):
    """Batched metric pose via PnP RANSAC + GN refine.

    Equivalent of PnPSolver.estimate_pose (reference pose_solver.py:184-235),
    vectorised over the batch:
    back-project map keypoints with the map depth, find the camera-1 pose of
    those 3D points from their 2D locations in the query image.

    Args:
        pts0, pts1: [B, N, 2] pixel coordinates; mask: [B, N].
        depth0: [B, H, W] map depth; K0, K1: [B, 3, 3].
        reproj_threshold: inlier threshold in pixels.
    Returns dict with R [B,3,3], t [B,3], inliers [B], valid [B].
    """
    from mapfree_tpu.geom.projection import backproject_3d
    from mapfree_tpu.ops.essential import gather_depth, normalize_keypoints

    B, N, _ = pts0.shape
    pts0_i = jnp.floor(pts0)
    d0 = gather_depth(depth0, pts0_i)
    valid = mask & (d0 > 0)

    X = backproject_3d(pts0_i, d0, K0)  # [B, N, 3]
    x1n = normalize_keypoints(pts1, K1)  # [B, N, 2]
    f_mean = (K1[:, 0, 0] + K1[:, 1, 1]) / 2.0
    thr_sq = (reproj_threshold / f_mean) ** 2  # [B]

    keys = jax.random.split(key, B)

    def per_pair(key, X, x1n, m, thr_sq):
        idx = masked_sample_indices(key, m, n_iters, _SAMPLE_SIZE)

        def solve_one(sample_idx):
            return _dlt_pose(X[sample_idx], x1n[sample_idx],
                             m[sample_idx].astype(X.dtype))

        Rs, ts = jax.vmap(solve_one)(idx)       # [It, 2, 3, 3], [It, 2, 3]
        Rs = Rs.reshape(-1, 3, 3)               # both nullspace candidates
        ts = ts.reshape(-1, 3)

        # P3P hypotheses from the first 3 points of each sample: minimal and
        # planar-safe (coplanar points degenerate the DLT nullspace)
        def solve_p3p(sample_idx):
            R3, t3, ok3 = _p3p_poses(X[sample_idx[:3]], x1n[sample_idx[:3]])
            # neutralize non-converged starts so they never win scoring
            R3 = jnp.where(ok3[:, None, None], R3, jnp.eye(3))
            t3 = jnp.where(ok3[:, None], t3, 1e9)
            return R3, t3

        R3s, t3s = jax.vmap(solve_p3p)(idx)
        Rs = jnp.concatenate([Rs, R3s.reshape(-1, 3, 3)])
        ts = jnp.concatenate([ts, t3s.reshape(-1, 3)])
        res = jax.vmap(lambda R, t: _reproj_residual_sq(R, t, X, x1n))(Rs, ts)
        capped = jnp.where(m, jnp.minimum(res, thr_sq), thr_sq)
        scores = jnp.sum(capped, axis=-1)
        best = jnp.argmin(scores)
        R_best, t_best = Rs[best], ts[best]
        inl = m & (res[best] < thr_sq)

        # EM-style iterative refinement: GN on the current inlier set, then
        # re-extract inliers; keep each round only if the inlier count does
        # not drop (reference refines once with >= 6 inliers)
        R_fin, t_fin, inl_fin = R_best, t_best, inl
        for _ in range(2):
            w = inl_fin.astype(X.dtype)
            R_ref, t_ref = _gauss_newton(R_fin, t_fin, X, x1n, w)
            res_ref = _reproj_residual_sq(R_ref, t_ref, X, x1n)
            inl_ref = m & (res_ref < thr_sq)
            ok = (jnp.sum(inl_fin) >= 6) & (jnp.sum(inl_ref) >= jnp.sum(inl_fin))
            R_fin = jnp.where(ok, R_ref, R_fin)
            t_fin = jnp.where(ok, t_ref, t_fin)
            inl_fin = jnp.where(ok, inl_ref, inl_fin)
        return R_fin, t_fin, jnp.sum(inl_fin)

    R, t, n = jax.vmap(per_pair)(keys, X, x1n, valid, thr_sq)

    ok = (jnp.sum(valid, axis=1) >= _MIN_PNP_POINTS) & (
        jnp.linalg.norm(t, axis=-1) <= 1000.0
    )
    R = jnp.where(ok[:, None, None], R, jnp.nan)
    t = jnp.where(ok[:, None], t, jnp.nan)
    n = jnp.where(ok, n, 0)
    return {"R": R, "t": t, "inliers": n, "valid": ok}
