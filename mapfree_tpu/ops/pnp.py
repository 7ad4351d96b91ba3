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
                                        qr_solve, smallest_eigvecs, svd3)
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


def _one_real_cubic_root(c):
    """One guaranteed-real root of c0 x^3 + c1 x^2 + c2 x + c3 (c: [4]).

    Branchless Cardano/trigonometric hybrid (jnp.where over the
    discriminant cases) + two Newton polish steps to recover f32 accuracy
    lost in the closed form. The leading coefficient is regularised; a
    degenerate (near-quadratic) cubic still produces SOME finite root and
    downstream validity gating rejects nonsense.
    """
    c0 = jnp.where(jnp.abs(c[0]) < 1e-20, 1e-20, c[0])
    a, b, d = c[1] / c0, c[2] / c0, c[3] / c0
    # depressed: t^3 + p t + q, x = t - a/3
    p = b - a * a / 3.0
    q = 2.0 * a**3 / 27.0 - a * b / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3
    # one-real-root branch (disc > 0): Cardano with sign-safe cbrts
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_card = jnp.cbrt(-q / 2.0 + sq) + jnp.cbrt(-q / 2.0 - sq)
    # three-real-roots branch (disc <= 0): trigonometric, take k=0
    pm = jnp.minimum(p, -1e-20)  # p < 0 in this branch
    m = 2.0 * jnp.sqrt(-pm / 3.0)
    acos_arg = jnp.clip(3.0 * q / (pm * m), -1.0, 1.0)
    t_trig = m * jnp.cos(jnp.arccos(acos_arg) / 3.0)
    x = jnp.where(disc > 0, t_card, t_trig) - a / 3.0
    for _ in range(2):  # Newton polish on the original cubic
        f = ((c0 * x + c[1]) * x + c[2]) * x + c[3]
        fp = (3.0 * c0 * x + 2.0 * c[1]) * x + c[2]
        x = x - f / jnp.where(jnp.abs(fp) < 1e-20, 1e-20, fp)
    return x


def _null_axis(D):
    """Unit null vector of a (near-)rank-2 symmetric 3x3: the largest row
    cross product (same closed-form recovery as the 5-point root step)."""
    crosses = jnp.stack([
        jnp.cross(D[0], D[1]), jnp.cross(D[0], D[2]), jnp.cross(D[1], D[2])])
    norms = jnp.linalg.norm(crosses, axis=-1)
    v = crosses[jnp.argmax(norms)]
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-20)


def _p3p_poses(X3, x3n):
    """P3P by Lambda-Twist (Persson & Nordberg, ECCV 2018) — closed form,
    planar-safe, all (up to 4) solutions; the SURVEY-prescribed minimal
    solver for the reference's cv.solvePnPRansac(SOLVEPNP_P3P) role
    (reference pose_solver.py:209-213, SURVEY §2.9 #5).

    Depth system: with unit bearings y_i and depths L_i, the pairwise
    distance constraints are L^T M_jk L = a_jk for three rank-2 forms M.
    Two homogeneous combinations D1, D2 have a pencil D1 + g D2 whose
    determinant is cubic in g; at a real root the form is rank 2 and
    factors the solution set into two planes; intersecting each plane with
    the D1-cone is a quadratic — four closed-form depth candidates, scaled
    back through one inhomogeneous constraint. No iteration, no
    nonsymmetric eigendecomposition; one cubic root + one 2x2 symmetric
    eigensplit + two quadratics per sample, all branchless.

    Args:
        X3: [3, 3] 3D points; x3n: [3, 2] normalized image coords.
    Returns (R [4, 3, 3], t [4, 3], valid [4]).
    """
    from mapfree_tpu.geom.procrustes import procrustes

    dtype = X3.dtype
    y = jnp.concatenate([x3n, jnp.ones_like(x3n[:, :1])], axis=-1)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)  # bearings [3, 3]
    b12, b13, b23 = y[0] @ y[1], y[0] @ y[2], y[1] @ y[2]
    a12 = jnp.sum((X3[0] - X3[1]) ** 2)
    a13 = jnp.sum((X3[0] - X3[2]) ** 2)
    a23 = jnp.sum((X3[1] - X3[2]) ** 2)

    def pair_form(i, j, b):
        M = jnp.zeros((3, 3), dtype)
        M = M.at[i, i].set(1.0).at[j, j].set(1.0)
        M = M.at[i, j].set(-b).at[j, i].set(-b)
        return M

    M12 = pair_form(0, 1, b12)
    M13 = pair_form(0, 2, b13)
    M23 = pair_form(1, 2, b23)
    D1 = M12 * a23 - M23 * a12
    D2 = M13 * a23 - M23 * a13

    # det(D1 + g D2) coefficients by column substitution (det3 is closed
    # form): [g^3, g^2, g^1, g^0]
    def mix(A, B, which):
        cols = [A[:, k] if w == 0 else B[:, k] for k, w in enumerate(which)]
        return det3(jnp.stack(cols, axis=1))

    c3 = det3(D2)
    c2 = mix(D1, D2, (0, 1, 1)) + mix(D1, D2, (1, 0, 1)) + mix(D1, D2, (1, 1, 0))
    c1 = mix(D1, D2, (0, 0, 1)) + mix(D1, D2, (0, 1, 0)) + mix(D1, D2, (1, 0, 0))
    c0 = det3(D1)
    g = _one_real_cubic_root(jnp.stack([c3, c2, c1, c0]))
    D0 = D1 + g * D2  # rank-2 symmetric

    # eigensplit of D0: null axis u3 closed-form; the nonzero pair from the
    # 2x2 restriction to the orthogonal complement
    u3 = _null_axis(D0)
    seed = jnp.where(jnp.abs(u3[0]) < 0.9,
                     jnp.asarray([1.0, 0.0, 0.0], dtype),
                     jnp.asarray([0.0, 1.0, 0.0], dtype))
    w1 = jnp.cross(u3, seed)
    w1 = w1 / jnp.maximum(jnp.linalg.norm(w1), 1e-20)
    w2 = jnp.cross(u3, w1)
    W = jnp.stack([w1, w2], axis=1)  # [3, 2]
    S = W.T @ D0 @ W  # [2, 2] symmetric
    tr, dif = S[0, 0] + S[1, 1], S[0, 0] - S[1, 1]
    rad = jnp.sqrt(jnp.maximum(dif * dif + 4.0 * S[0, 1] ** 2, 0.0))
    sig1 = (tr + rad) / 2.0  # >= sig2
    sig2 = (tr - rad) / 2.0
    # eigvec of the 2x2 for sig1 (branchless; the other is its rotation)
    e1 = jnp.where(
        jnp.abs(S[0, 1]) > 1e-20 * jnp.maximum(jnp.abs(dif), 1.0),
        jnp.stack([S[0, 1], sig1 - S[0, 0]]),
        jnp.where(S[0, 0] >= S[1, 1],
                  jnp.asarray([1.0, 0.0], dtype),
                  jnp.asarray([0.0, 1.0], dtype)))
    e1 = e1 / jnp.maximum(jnp.linalg.norm(e1), 1e-20)
    u1 = W @ e1
    u2 = W @ jnp.stack([-e1[1], e1[0]])

    # cone split: sig1 (u1.L)^2 + sig2 (u2.L)^2 = 0 -> u1.L = +-s u2.L
    s = jnp.sqrt(jnp.maximum(-sig2 / jnp.where(
        jnp.abs(sig1) < 1e-20, 1e-20, sig1), 0.0))
    # the cone split needs an indefinite pair sig1 > 0 > sig2; anything else
    # (PSD, NSD, or near-zero) is a degenerate sample
    degenerate_cone = (sig2 > -1e-12 * jnp.abs(sig1)) | (
        sig1 < 1e-12 * jnp.abs(sig2))

    def plane_candidates(sgn):
        n = u1 - sgn * s * u2  # plane normal: n.L = 0
        v1 = jnp.cross(n, u3)
        v1n = jnp.linalg.norm(v1)
        v1 = v1 / jnp.maximum(v1n, 1e-20)
        v2 = jnp.cross(n, v1)
        v2 = v2 / jnp.maximum(jnp.linalg.norm(v2), 1e-20)
        # restrict the D1 cone to the plane: quadratic in alpha/beta
        q11 = v1 @ D1 @ v1
        q12 = v1 @ D1 @ v2
        q22 = v2 @ D1 @ v2
        disc = jnp.maximum(q12 * q12 - q11 * q22, 0.0)
        root = jnp.sqrt(disc)
        q11s = jnp.where(jnp.abs(q11) < 1e-20, 1e-20, q11)
        dirs = jnp.stack([
            (-q12 + root) / q11s * v1 + v2,
            (-q12 - root) / q11s * v1 + v2,
        ])  # [2, 3]
        ok = jnp.stack([disc >= 0.0, disc >= 0.0])
        return dirs, ok

    dirs_p, ok_p = plane_candidates(jnp.asarray(1.0, dtype))
    dirs_m, ok_m = plane_candidates(jnp.asarray(-1.0, dtype))
    dirs = jnp.concatenate([dirs_p, dirs_m])  # [4, 3]
    ok = jnp.concatenate([ok_p, ok_m]) & ~degenerate_cone

    # scale through L^T M12 L = a12; depths must be positive
    quad = jnp.einsum("ki,ij,kj->k", dirs, M12, dirs)
    rho = jnp.sqrt(a12 / jnp.maximum(quad, 1e-20))
    L = rho[:, None] * dirs
    L = L * jnp.sign(jnp.sum(L, axis=-1, keepdims=True))  # front-of-camera sign
    valid = ok & (quad > 1e-12) & (jnp.min(L, axis=-1) > 0)

    # Gauss-Newton depth polish (the paper's own recommendation): the
    # closed form loses ~1e-3 relative accuracy in f32 on ill-conditioned
    # samples; two Newton steps on the three distance residuals restore it.
    # J rows are 2 M_jk L — a 3x3 solve per step via the batched QR kernel.
    a_vec = jnp.stack([a12, a13, a23])
    Ms = jnp.stack([M12, M13, M23])  # [3, 3, 3]

    def polish(L):
        r = jnp.einsum("i,cij,j->c", L, Ms, L) - a_vec
        J = 2.0 * jnp.einsum("cij,j->ci", Ms, L)  # [3, 3]
        delta = qr_solve(J, r[:, None])[:, 0]
        L_new = L - delta
        better = (jnp.sum((jnp.einsum("i,cij,j->c", L_new, Ms, L_new)
                           - a_vec) ** 2) < jnp.sum(r**2))
        return jnp.where(better, L_new, L)

    for _ in range(2):
        L = jax.vmap(polish)(L)

    Z = L[..., None] * y[None]  # camera-frame points [4, 3, 3]
    R, t = procrustes(jnp.broadcast_to(X3, Z.shape), Z)  # world -> camera
    t = t[:, 0]
    valid = (valid & jnp.isfinite(R).all(axis=(1, 2))
             & jnp.isfinite(t).all(axis=1))
    return R, t, valid


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
        # batched straight-line solve (smallblas) — see refine_essential_gn
        delta = qr_solve(JtJ, g[:, None])[:, 0]
        new_params = params - delta
        # keep the update only if it reduces the cost
        better = jnp.sum(residual(new_params) ** 2) < jnp.sum(r**2)
        return jnp.where(better, new_params, params), None

    params, _ = jax.lax.scan(step, params0, None, length=n_iters)
    return rodrigues(params[:3]), params[3:]


@partial(jax.jit, static_argnames=("n_iters", "point_depths"))
@_f32_matmuls
def pnp_pose(key, pts0, pts1, mask, depth0, K0, K1,
             reproj_threshold, n_iters: int = 512,
             point_depths: bool = False):
    """Batched metric pose via PnP RANSAC + GN refine.

    Equivalent of PnPSolver.estimate_pose (reference pose_solver.py:184-235),
    vectorised over the batch:
    back-project map keypoints with the map depth, find the camera-1 pose of
    those 3D points from their 2D locations in the query image.

    Args:
        pts0, pts1: [B, N, 2] pixel coordinates; mask: [B, N].
        depth0: [B, H, W] map depth — or, with ``point_depths=True``,
            [B, N] depths pre-gathered at floor(pts0) on the host (ships
            ~50x fewer bytes over the tunnel).
        K0, K1: [B, 3, 3].
        reproj_threshold: inlier threshold in pixels.
    Returns dict with R [B,3,3], t [B,3], inliers [B], valid [B].
    """
    from mapfree_tpu.geom.projection import backproject_3d
    from mapfree_tpu.ops.essential import gather_depth, normalize_keypoints

    B, N, _ = pts0.shape
    pts0_i = jnp.floor(pts0)
    d0 = depth0 if point_depths else gather_depth(depth0, pts0_i)
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
