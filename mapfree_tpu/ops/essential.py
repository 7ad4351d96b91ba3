"""Batched essential-matrix estimation: 8-point RANSAC, cheirality, scale.

TPU-native replacement for the reference's OpenCV path
(reference lib/models/matching/pose_solver.py:20-172):
- ``cv.findEssentialMat(USAC_MAGSAC)`` -> fixed-budget 8-point RANSAC with
  Sampson scoring + one inlier refit (vmapped minimal solver, no host loops);
- ``cv.recoverPose`` -> closed-form SVD decomposition of E into 4 candidate
  (R, t) + batched two-view cheirality depth count;
- metric scale from depth -> vectorised per-inlier scale hypotheses with the
  reference's 1-D scale-RANSAC (pose_solver.py:157-172) or mean aggregation.

All functions operate on normalized image coordinates with validity masks and
are jit/vmap-safe (float32; the 3x3 algebra is done with f32 matmuls which is
ample at the inlier refit stage).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

from mapfree_tpu.geom.smallblas import (det3,
                                        f32_matmuls as _f32_matmuls,
                                        qr_solve,
                                        nullspace_qr, smallest_eigvec,
                                        svd3)
from mapfree_tpu.ops.ransac import (
    inlier_mask,
    magsac_score,
    masked_sample_indices,
    msac_score,
)


def normalize_keypoints(kpts, K):
    """Pixel -> normalized camera coordinates (reference pose_solver.py:39-40)."""
    f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)  # [..., 2]
    c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)
    return (kpts - c[..., None, :]) / f[..., None, :]


def _eight_point(x0, x1, w):
    """Weighted 8-point algorithm on normalized coords.

    Args:
        x0, x1: [M, 2] normalized coordinates (M >= 8).
        w: [M] weights (0 for padding).
    Returns:
        E: [3, 3] essential matrix (projected onto the essential manifold).
    """
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    ones = jnp.ones_like(u0)
    # epipolar constraint x1^T E x0 = 0, row per correspondence
    A = jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1
    )  # [M, 9]
    A = A * w[:, None]
    # nullspace via shifted inverse iteration on A^T A (9x9 PSD): XLA's
    # eigh measures 111 ms for [8192, 9, 9] on a v5-lite, the Cholesky
    # iteration 8 ms (geom/smallblas.py)
    e = smallest_eigvec(A.T @ A)
    E = e.reshape(3, 3)
    # project to essential manifold: singular values -> (s, s, 0)
    U, S, Vt = svd3(E)
    s = (S[0] + S[1]) / 2.0
    return (U * jnp.asarray([s, s, 0.0])) @ Vt


# ------------------------------------------------------------ 5-point ------
#
# Nistér's minimal problem via the classical Gauss-Jordan reduction, shaped
# for vmap/TPU (no nonsymmetric eigendecomposition, no per-root nullspaces):
#
# 1. the 5 epipolar constraints give a 4-dim nullspace: E = x E1 + y E2 +
#    z E3 + E4;
# 2. det(E) = 0 and 2 E E^T E - tr(E E^T) E = 0 are 10 cubic constraints in
#    (x, y, z). Their coefficients over the 20 cubic monomials are extracted
#    NUMERICALLY: evaluate each constraint at 20 fixed generic points and
#    multiply by the precomputed inverse Vandermonde (exact interpolation of
#    a degree-3 polynomial, no symbolic expansion to maintain);
# 3. Gauss-Jordan elimination (one batched 10x10 QR solve) expresses the 10
#    monomials of (x,y)-degree >= 2 through the 10 low monomials
#    lo = [x, xz, xz^2, y, yz, yz^2, 1, z, z^2, z^3]; the Nistér row
#    combinations <x^2 z> - z<x^2>, <xyz> - z<xy>, <y^2 z> - z<y^2> leave a
#    3x3 matrix B(z) with polynomial entries (degree 3, 3, 4 per column)
#    acting on [x, y, 1];
# 4. det B(z) is Nistér's degree-10 polynomial, obtained CLOSED-FORM by six
#    small coefficient convolutions — no determinant evaluations at all;
# 5. roots are isolated on a tan(theta) grid (coefficients homogenised to
#    degree 10 in (sin, cos) so the polynomial stays bounded over all of R)
#    and polished by fixed-count 16-way subdivision; (x, y) at each root are
#    the null vector of B(z*) — a closed-form cross product of two rows.
#
# Per minimal sample this costs one 9x9 nullspace basis, 20 constraint
# evaluations, one 10x10 QR solve and elementwise polynomial algebra —
# replacing the previous hidden-variable path (32 batched 10x10
# determinants + one 10x10 inverse-iteration nullspace per root), which
# profiled at 66-80% of the whole essential pipeline (tools/solver_profile).

# (x, y) monomial order for the 20 cubic monomials in (x, y, z): pairs from
# _XY_MONOS with the z-power filling up to total degree 3. With this
# ordering columns 0-9 are exactly the monomials of (x,y)-degree >= 2
# (x^3, x^2 y, x y^2, y^3, x^2, x^2 z, xy, xyz, y^2, y^2 z) and columns
# 10-19 the low monomials (x, xz, xz^2, y, yz, yz^2, 1, z, z^2, z^3).
_XY_MONOS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
             (1, 0), (0, 1), (0, 0)]
_XYZ_MONOS = [(a, b, c) for a, b in _XY_MONOS for c in range(0, 4 - a - b)]
assert len(_XYZ_MONOS) == 20
assert all(a + b >= 2 for a, b, _ in _XYZ_MONOS[:10])

_rng = np.random.default_rng(12345)
_EVAL_PTS = _rng.uniform(-1.0, 1.0, size=(20, 3))
_VANDER = np.stack(
    [
        [p[0] ** a * p[1] ** b * p[2] ** c for a, b, c in _XYZ_MONOS]
        for p in _EVAL_PTS
    ]
)
_VANDER_INV = np.linalg.inv(_VANDER)  # cond ~1e3: exact-degree interpolation
del _rng

_MAX_ROOTS = 10
_GRID = 257  # theta samples for sign-change isolation
_SUBDIV_ROUNDS = 4  # 16-way subdivision rounds; (pi/256)/16^4 ~ 2e-7 rad
_GRID_EPS = 1e-3
_GRID_THETAS = np.linspace(-np.pi / 2 + _GRID_EPS, np.pi / 2 - _GRID_EPS, _GRID)
# homogenised degree-10 monomial basis s^k c^(10-k) on the grid: the
# polynomial p(tan theta) * cos^10 theta is bounded for every theta and has
# the same roots/sign pattern as p on (-pi/2, pi/2)
_GRID_SC10 = np.stack(
    [np.sin(_GRID_THETAS) ** k * np.cos(_GRID_THETAS) ** (10 - k)
     for k in range(11)], axis=-1)  # [_GRID, 11]


def _nister_constraints(p, basis):
    """The 10 cubic constraint values at (x, y, z) = p. basis: [4, 3, 3]."""
    E = p[0] * basis[0] + p[1] * basis[1] + p[2] * basis[2] + basis[3]
    EEt = E @ E.T
    T = 2.0 * (EEt @ E) - jnp.trace(EEt) * E
    return jnp.concatenate([T.reshape(9), det3(E)[None]])


def _sc_eval10(p10, thetas):
    """Evaluate the homogenised degree-10 polynomial at arbitrary thetas."""
    s, c = jnp.sin(thetas), jnp.cos(thetas)
    k = jnp.arange(11, dtype=p10.dtype)
    basis = s[..., None] ** k * c[..., None] ** (10.0 - k)
    return basis @ p10


def _five_point_candidates(x0, x1):
    """Essential-matrix candidates from 5 normalized correspondences.

    Returns (Es [_MAX_ROOTS, 3, 3], valid [_MAX_ROOTS]).
    """
    dtype = x0.dtype
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    ones = jnp.ones_like(u0)
    A = jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1
    )  # [5, 9]
    # exact 4-dim nullspace of the [5, 9] system by one Householder QR of
    # A^T (any orthonormal basis of the nullspace parameterises the same
    # family) — direct, backward stable, ~5 sequential reflections versus
    # the Cholesky inverse-iteration route's ~25 small sequential solves
    basis = nullspace_qr(A).T.reshape(4, 3, 3)

    # constraint coefficients over the 20 monomials: [10, 20]
    vals = jax.vmap(lambda p: _nister_constraints(p, basis))(
        jnp.asarray(_EVAL_PTS, dtype)
    )  # [20 points, 10 constraints]
    C = (jnp.asarray(_VANDER_INV, dtype) @ vals).T  # [10, 20]

    # Gauss-Jordan: hi_i + (X @ lo)_i = 0 for the 10 high monomials
    X = qr_solve(C[:, :10], C[:, 10:])  # [10, 10]

    # Nistér rows k/l/m = <hi z-row> - z <hi row> over lo-monomials; collect
    # per-variable polynomial coefficients in z (columns x, y, 1 of B)
    hiZ = X[jnp.asarray([5, 7, 9])]  # rows of x^2 z, xyz, y^2 z
    hi0 = X[jnp.asarray([4, 6, 8])]  # rows of x^2,   xy,  y^2
    Bx = jnp.stack(
        [hiZ[:, 0], hiZ[:, 1] - hi0[:, 0], hiZ[:, 2] - hi0[:, 1],
         -hi0[:, 2]], axis=-1)  # [3, 4] z^0..z^3
    By = jnp.stack(
        [hiZ[:, 3], hiZ[:, 4] - hi0[:, 3], hiZ[:, 5] - hi0[:, 4],
         -hi0[:, 5]], axis=-1)
    B1 = jnp.stack(
        [hiZ[:, 6], hiZ[:, 7] - hi0[:, 6], hiZ[:, 8] - hi0[:, 7],
         hiZ[:, 9] - hi0[:, 8], -hi0[:, 9]], axis=-1)  # [3, 5] z^0..z^4

    # det B(z): six coefficient convolutions -> degree-10 coefficients [11]
    def pm(p, q):
        return jnp.convolve(p, q)

    p10 = (
        pm(Bx[0], pm(By[1], B1[2]) - pm(By[2], B1[1]))
        - pm(By[0], pm(Bx[1], B1[2]) - pm(Bx[2], B1[1]))
        + pm(B1[0], pm(Bx[1], By[2]) - pm(Bx[2], By[1]))
    )  # [11]
    # scale-normalise: row scalings move neither roots nor null vectors
    p10 = p10 / jnp.maximum(jnp.max(jnp.abs(p10)), 1e-30)

    thetas = jnp.asarray(_GRID_THETAS, dtype)
    f = jnp.asarray(_GRID_SC10, dtype) @ p10  # [G]
    sign = jnp.where(f >= 0, 1.0, -1.0)
    is_bracket = sign[:-1] * sign[1:] < 0  # [G-1]
    # earliest _MAX_ROOTS brackets (fixed shape)
    pick_score = is_bracket.astype(dtype) * 2.0 - jnp.arange(_GRID - 1) * (
        1.0 / _GRID
    )
    _, bracket_idx = jax.lax.top_k(pick_score, _MAX_ROOTS)
    valid = is_bracket[bracket_idx]

    lo = thetas[bracket_idx]
    hi = thetas[bracket_idx + 1]
    s_lo = sign[bracket_idx]

    # root polish by 16-way subdivision: each round evaluates 16 interior
    # points of every bracket in ONE batched call and narrows the bracket
    # 16x — 4 sequential rounds reach (pi/128)/16^4 ~ 4e-7 rad where plain
    # bisection needs 30 sequential steps
    n_sub = 16
    offs = (jnp.arange(1, n_sub + 1, dtype=dtype)) / n_sub  # [16]

    def refine(carry, _):
        lo, hi = carry  # [_MAX_ROOTS]
        ts = lo[:, None] + (hi - lo)[:, None] * offs[None, :]  # [R, 16]
        fs = _sc_eval10(p10, ts.reshape(-1)).reshape(ts.shape)
        signs = jnp.where(fs >= 0, 1.0, -1.0)
        # bracket invariant: sign(lo) == s_lo, sign(hi) == -s_lo; the root
        # lies before the FIRST interior point whose sign differs from s_lo
        flipped = signs != s_lo[:, None]  # [R, 16]
        # append the hi endpoint (always flipped) so argmax is well-defined
        flipped = jnp.concatenate(
            [flipped, jnp.ones_like(flipped[:, :1])], axis=1)
        ts_ext = jnp.concatenate([ts, hi[:, None]], axis=1)  # [R, 17]
        k = jnp.argmax(flipped, axis=1)  # first flipped index, [R]
        new_hi = jnp.take_along_axis(ts_ext, k[:, None], axis=1)[:, 0]
        prev = jnp.take_along_axis(
            ts_ext, jnp.maximum(k - 1, 0)[:, None], axis=1)[:, 0]
        new_lo = jnp.where(k > 0, prev, lo)
        return (new_lo, new_hi), None

    (lo, hi), _ = jax.lax.scan(refine, (lo, hi), None, length=_SUBDIV_ROUNDS)
    theta_star = 0.5 * (lo + hi)

    # closed-form recovery: null vector of B(z*) via row cross products.
    # Homogenised rows [c Bx~, c By~, B1~] (a positive row scaling); the
    # most-independent row pair (largest cross norm) gives v ~ [x, y, 1].
    s, c = jnp.sin(theta_star), jnp.cos(theta_star)  # [_MAX_ROOTS]
    ps3 = jnp.stack([c**3, s * c**2, s**2 * c, s**3], axis=-1)  # [R, 4]
    ps4 = jnp.stack([c**4, s * c**3, s**2 * c**2, s**3 * c, s**4],
                    axis=-1)  # [R, 5]
    Bxt = ps3 @ Bx.T  # [R, 3]
    Byt = ps3 @ By.T
    B1t = ps4 @ B1.T
    rows = jnp.stack(
        [c[:, None] * Bxt, c[:, None] * Byt, B1t], axis=-1)  # [R, row, col]
    r0, r1, r2 = rows[:, 0], rows[:, 1], rows[:, 2]
    crosses = jnp.stack(
        [jnp.cross(r0, r1), jnp.cross(r0, r2), jnp.cross(r1, r2)],
        axis=1)  # [R, 3, 3]
    norms = jnp.linalg.norm(crosses, axis=-1)  # [R, 3]
    v = jnp.take_along_axis(
        crosses, jnp.argmax(norms, axis=1)[:, None, None], axis=1)[:, 0]
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)

    # E ~ x E1 + y E2 + z E3 + E4, homogenised by v2 c (no division):
    coef = jnp.stack(
        [v[:, 0] * c, v[:, 1] * c, v[:, 2] * s, v[:, 2] * c], axis=-1)
    E = jnp.einsum("rk,kij->rij", coef, basis)
    # project onto the essential manifold
    U, S, Vt = svd3(E)
    sv = (S[..., 0] + S[..., 1]) / 2.0
    Es = (U * jnp.stack([sv, sv, jnp.zeros_like(sv)], -1)[..., None, :]) @ Vt
    valid = (valid & jnp.isfinite(Es).all(axis=(1, 2))
             & (jnp.max(jnp.abs(Es), axis=(1, 2)) > 1e-12))
    Es = jnp.where(valid[:, None, None], Es, jnp.eye(3, dtype=dtype))
    return Es, valid


def _homography_4pt(x0, x1, w):
    """Weighted DLT homography from >= 4 normalized correspondences.

    x1 ~ H x0. Returns H [3, 3]."""
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    ones = jnp.ones_like(u0)
    zeros = jnp.zeros_like(u0)
    row_u = jnp.stack(
        [u0, v0, ones, zeros, zeros, zeros, -u1 * u0, -u1 * v0, -u1], axis=-1)
    row_v = jnp.stack(
        [zeros, zeros, zeros, u0, v0, ones, -v1 * u0, -v1 * v0, -v1], axis=-1)
    A = jnp.concatenate([row_u * w[:, None], row_v * w[:, None]], axis=0)
    return smallest_eigvec(A.T @ A).reshape(3, 3)


def homography_pose_candidates(H):
    """Faugeras SVD decomposition of a calibrated homography into 4 (R, t)
    candidates (H = R + t n^T / d family; the planar-scene pose source the
    8-point solver degenerates on — OpenCV's USAC covers this via DEGENSAC).

    Returns (Rs [4, 3, 3], ts [4, 3] unit-normalised up-to-sign).
    """
    U, S, Vt = svd3(H)
    d1, d2, d3 = S[0], S[1], S[2]
    s = det3(U) * det3(Vt)

    denom = jnp.maximum(d1**2 - d3**2, 1e-12)
    x1 = jnp.sqrt(jnp.maximum(d1**2 - d2**2, 0.0) / denom)
    x3 = jnp.sqrt(jnp.maximum(d2**2 - d3**2, 0.0) / denom)
    d2_safe = jnp.maximum(d2, 1e-12)

    def candidate(e1, e3):
        sin_t = (d1 - d3) * x1 * x3 * e1 * e3 / d2_safe
        cos_t = (d1 * x3**2 + d3 * x1**2) / d2_safe
        Rp = jnp.asarray([
            [cos_t, 0.0, -sin_t],
            [0.0, 1.0, 0.0],
            [sin_t, 0.0, cos_t],
        ])
        tp = (d1 - d3) * jnp.asarray([x1 * e1, 0.0, -x3 * e3])
        R = s * U @ Rp @ Vt
        t = U @ tp
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return R, t

    pairs = [(1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)]
    Rs, ts = zip(*[candidate(e1, e3) for e1, e3 in pairs])
    return jnp.stack(Rs), jnp.stack(ts)


@_f32_matmuls
def sampson_sq(E, x0, x1):
    """Squared Sampson distance of the epipolar constraint, [N]."""
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)  # [N, 3]
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    Ex0 = x0h @ E.T  # [N, 3]
    Etx1 = x1h @ E
    num = jnp.sum(x1h * Ex0, axis=-1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@_f32_matmuls
def sampson_sq_many(Es, x0, x1):
    """Squared Sampson distances for MANY hypotheses at once: [M, N].

    MXU formulation: every (hypothesis, point) epipolar value x1ᵀEx0 is the
    dot product of the flattened E with the flattened outer product x1h x0hᵀ,
    so ONE [M, 9] @ [9, N] matmul scores the whole grid; the four denominator
    rows (Ex0)_0,1 and (Eᵀx1)_0,1 are four more [M, 3] @ [3, N] matmuls.
    Unlike ``vmap(sampson_sq)`` this never materialises an [M, N, 3]
    intermediate — the live set is [M, N] — which is what lets the RANSAC
    scoring loop sweep tens of thousands of hypotheses per pair in one
    dispatch without blowing HBM.
    """
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)  # [N, 3]
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    cross = jnp.einsum("ni,nj->ijn", x1h, x0h).reshape(9, -1)  # [9, N]
    num = (Es.reshape(-1, 9) @ cross) ** 2  # [M, N]
    Ex0_0 = Es[:, 0, :] @ x0h.T
    Ex0_1 = Es[:, 1, :] @ x0h.T
    Etx1_0 = Es[:, :, 0] @ x1h.T
    Etx1_1 = Es[:, :, 1] @ x1h.T
    den = Ex0_0**2 + Ex0_1**2 + Etx1_0**2 + Etx1_1**2
    return num / jnp.maximum(den, 1e-12)


def score_hypotheses(Es, hypo_ok, x0, x1, mask, thr_sq, chunk: int = 4096):
    """MAGSAC scores for a large hypothesis set, chunked over hypotheses.

    Es [M, 3, 3] -> scores [M] (invalid hypotheses get +inf). Peak residual
    memory is [chunk, N] instead of [M, N]: at the 70%-outlier budgets the
    full set is >20k hypotheses per pair and an unchunked vmap over a batch
    of pairs allocates multi-GB intermediates (measured 18 GB at B=64,
    n5=2048).
    """
    M = Es.shape[0]
    if M <= chunk:
        scores = magsac_score(sampson_sq_many(Es, x0, x1), mask, thr_sq)
        return jnp.where(hypo_ok, scores, jnp.inf)
    pad = (-M) % chunk
    Es_p = jnp.concatenate([Es, jnp.tile(jnp.eye(3)[None], (pad, 1, 1))])
    ok_p = jnp.concatenate([hypo_ok, jnp.zeros(pad, bool)])

    def one(args):
        Es_c, ok_c = args
        s = magsac_score(sampson_sq_many(Es_c, x0, x1), mask, thr_sq)
        return jnp.where(ok_c, s, jnp.inf)

    scores = jax.lax.map(
        one, (Es_p.reshape(-1, chunk, 3, 3), ok_p.reshape(-1, chunk)))
    return scores.reshape(-1)[:M]


def _skew(v):
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], zero], -1),
        ],
        -2,
    )


@_f32_matmuls
def refine_essential_gn(E0, x0, x1, weights, n_iters: int = 8, damping: float = 1e-8):
    """Gauss-Newton polish of E on the essential manifold.

    Parametrises E = [t]_x R via (rvec, t) recovered by cheirality-free
    decomposition, minimises the weighted Sampson residuals. This is the
    accuracy step the 8-point linear solve lacks under pixel noise (OpenCV's
    USAC pipelines do an equivalent final LM polish).
    """
    from mapfree_tpu.geom.rotation import inv_rodrigues, rodrigues

    R1, R2, t = decompose_E(E0)
    # pick the R candidate whose [t]_x R best matches E0 in Frobenius norm
    def align(R):
        Ecand = _skew(t) @ R
        scale = jnp.sum(Ecand * E0) / jnp.maximum(jnp.sum(Ecand * Ecand), 1e-12)
        return jnp.sum((scale * Ecand - E0) ** 2)

    use_R1 = align(R1) < align(R2)
    R_init = jnp.where(use_R1, R1, R2)
    params0 = jnp.concatenate([inv_rodrigues(R_init), t])

    def make_E(params):
        R = rodrigues(params[:3])
        tt = params[3:]
        tt = tt / jnp.maximum(jnp.linalg.norm(tt), 1e-12)
        return _skew(tt) @ R

    def residual(params):
        E = make_E(params)
        return jnp.sqrt(sampson_sq(E, x0, x1) + 1e-16) * weights

    def step(params, _):
        r = residual(params)
        J = jax.jacfwd(residual)(params)  # [N, 6]
        JtJ = J.T @ J + damping * jnp.eye(6)
        # batched straight-line solve (smallblas): XLA's pivoted-LU
        # linalg.solve lowering is microseconds per tiny system and this
        # runs inside the per-pair GN scan
        delta = qr_solve(JtJ, (J.T @ r)[:, None])[:, 0]
        new_params = params - delta
        better = jnp.sum(residual(new_params) ** 2) < jnp.sum(r**2)
        return jnp.where(better, new_params, params), None

    params, _ = jax.lax.scan(step, params0, None, length=n_iters)
    return make_E(params)


@_f32_matmuls
def decompose_E(E):
    """E -> (R1, R2, t) candidates via SVD (cf. the reference's numpy variant
    at lib/utils/localize.py:872-889)."""
    U, _, Vt = svd3(E)
    # enforce proper rotations
    U = U * jnp.sign(det3(U))
    Vt = Vt * jnp.sign(det3(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def _two_view_depths(R, t, x0, x1):
    """Solve z1 * f1 = z0 * R f0 + t in least squares for each correspondence.

    f0/f1 are homogeneous rays of the normalized coords. Returns (z0, z1) [N].
    """
    f0 = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)  # [N, 3]
    f1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    Rf0 = f0 @ R.T  # [N, 3]
    # normal equations for [z0, z1]: [Rf0, -f1] z = -t
    a = jnp.sum(Rf0 * Rf0, axis=-1)
    b = -jnp.sum(Rf0 * f1, axis=-1)
    d = jnp.sum(f1 * f1, axis=-1)
    r0 = -jnp.sum(Rf0 * t, axis=-1)
    r1 = jnp.sum(f1 * t, axis=-1)
    det = a * d - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z0 = (d * r0 - b * r1) / det
    z1 = (a * r1 - b * r0) / det
    return z0, z1


@_f32_matmuls
def cheirality_pose(E, x0, x1, mask, max_depth=1e9):
    """Pick the (R, t) candidate with the most points in front of both
    cameras (cv.recoverPose equivalent, reference pose_solver.py:54-61)."""
    R1, R2, t = decompose_E(E)
    candidates = (
        (R1, t), (R1, -t), (R2, t), (R2, -t),
    )

    def count(Rt):
        R, tt = Rt
        z0, z1 = _two_view_depths(R, tt, x0, x1)
        ok = (z0 > 0) & (z1 > 0) & (z0 < max_depth) & (z1 < max_depth) & mask
        return jnp.sum(ok.astype(jnp.int32)), ok

    counts_masks = [count(c) for c in candidates]
    counts = jnp.stack([c for c, _ in counts_masks])
    masks = jnp.stack([m for _, m in counts_masks])
    Rs = jnp.stack([c[0] for c in candidates])
    ts = jnp.stack([c[1] for c in candidates])
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best], masks[best]


def _h_transfer_sq(H, x0, x1):
    """Squared symmetric-free transfer distance ||x1 - proj(H x0)||^2, [N]."""
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    y = x0h @ H.T
    z = jnp.where(jnp.abs(y[:, 2:3]) < 1e-12, 1e-12, y[:, 2:3])
    proj = y[:, :2] / z
    return jnp.sum((proj - x1) ** 2, axis=-1)


@_f32_matmuls
def estimate_homography(key, kpts0_n, kpts1_n, mask, thr, n_iters: int = 256):
    """Fixed-budget 4-point homography RANSAC on normalized coords.

    Used for planar-degeneracy rescue (DEGENSAC role): returns the best H,
    its inlier mask and count.
    """
    thr_sq = thr * thr
    idx = masked_sample_indices(key, mask, n_iters, 4)

    def solve_one(sample_idx):
        return _homography_4pt(kpts0_n[sample_idx], kpts1_n[sample_idx],
                               mask[sample_idx].astype(kpts0_n.dtype))

    Hs = jax.vmap(solve_one)(idx)
    res = jax.vmap(lambda H: _h_transfer_sq(H, kpts0_n, kpts1_n))(Hs)
    scores = msac_score(res, mask, thr_sq)
    best = jnp.argmin(scores)
    H_best = Hs[best]

    # one inlier refit
    inl = inlier_mask(res[best], mask, thr_sq)
    H_ref = _homography_4pt(kpts0_n, kpts1_n, inl.astype(kpts0_n.dtype))
    res_ref = _h_transfer_sq(H_ref, kpts0_n, kpts1_n)
    use = msac_score(res_ref, mask, thr_sq) < scores[best]
    H_fin = jnp.where(use, H_ref, H_best)
    inl_fin = inlier_mask(jnp.where(use, res_ref, res[best]), mask, thr_sq)
    return H_fin, inl_fin, jnp.sum(inl_fin)


def homography_cheirality_pose(H, x0, x1, mask):
    """Best (R, t) among the 4 Faugeras candidates of H (and their mirrored
    translations) by two-view positive-depth count. Sampson scoring cannot
    separate H-consistent poses on planar scenes; cheirality can."""
    Rs, ts = homography_pose_candidates(H)
    Rs = jnp.concatenate([Rs, Rs])
    ts = jnp.concatenate([ts, -ts])

    def count(R, t):
        z0, z1 = _two_view_depths(R, t, x0, x1)
        return jnp.sum(((z0 > 0) & (z1 > 0) & mask).astype(jnp.int32))

    counts = jax.vmap(count)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best]


@_f32_matmuls
def estimate_essential(key, kpts0_n, kpts1_n, mask, thr, n_iters: int = 512,
                       n5: int | None = None, lo_topk: int = 16):
    """Single-pair essential-matrix RANSAC (fixed budget, one dispatch).

    5-point Nistér + 8-point hypotheses, MAGSAC-style sigma-ladder scoring
    (chunked MXU evaluation over the whole hypothesis set), top-K local
    optimisation with soft Cauchy reweighting, Gauss-Newton manifold polish.
    TPU equivalent of OpenCV USAC_MAGSAC (reference pose_solver.py:46-48).

    Args:
        kpts0_n, kpts1_n: [N, 2] normalized coordinates.
        mask: [N] validity.
        thr: scalar inlier threshold in normalized units.
        n_iters: 8-point hypothesis budget.
        n5: 5-point minimal-sample budget (default n_iters // 4); each
            sample yields up to 10 candidate E's. This is THE accuracy
            knob at high outlier ratios (all-inlier sample probability
            w^5 vs w^8).
        lo_topk: hypotheses kept for local optimisation.
    Returns:
        E [3, 3], inliers [N] bool, valid (bool scalar: >= 5 valid points).
    """
    thr_sq = thr * thr
    k8, k5 = jax.random.split(key)
    idx = masked_sample_indices(k8, mask, n_iters, 8)  # [It, 8]

    def solve_one(sample_idx):
        x0 = kpts0_n[sample_idx]
        x1 = kpts1_n[sample_idx]
        w = mask[sample_idx].astype(kpts0_n.dtype)
        # minimal 8-point sample: the [8, 9] system has exact nullity 1, so
        # the direct QR nullspace applies (one Householder pass — the
        # weighted least-squares _eight_point stays on inverse iteration
        # for the over-determined LO refits)
        u0, v0 = x0[:, 0], x0[:, 1]
        u1, v1 = x1[:, 0], x1[:, 1]
        ones = jnp.ones_like(u0)
        A = jnp.stack(
            [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones],
            axis=-1) * w[:, None]
        E = nullspace_qr(A)[:, 0].reshape(3, 3)
        U, S, Vt = svd3(E)
        s = (S[0] + S[1]) / 2.0
        return (U * jnp.asarray([s, s, 0.0], E.dtype)) @ Vt

    Es8 = jax.vmap(solve_one)(idx)  # [It, 3, 3]

    # 5-point Nistér minimal hypotheses (reference pose_solver.py:46-48 uses
    # OpenCV's 5-point inside USAC_MAGSAC): at inlier ratio w the all-inlier
    # sample probability is w^5 vs w^8 — at 50% outliers that is 8x more
    # clean samples per budget, which is what decides the epipolar basin
    if n5 is None:
        n5 = max(n_iters // 4, 32)
    idx5 = masked_sample_indices(k5, mask, n5, 5)

    def solve_five(sample_idx):
        return _five_point_candidates(kpts0_n[sample_idx], kpts1_n[sample_idx])

    # chunk the minimal-solver sweep: its 10x10 resultant intermediates pad
    # ~20x under TPU tiling, so one flat vmap over n5 >= 2048 samples blows
    # the HBM budget (measured 20 GB at n5=2048, B=64); lax.map over
    # fixed-size chunks bounds the live set while keeping each chunk batched
    chunk = 256
    if n5 > chunk and n5 % chunk == 0:
        Es5, valid5 = jax.lax.map(
            jax.vmap(solve_five), idx5.reshape(n5 // chunk, chunk, 5))
    else:
        Es5, valid5 = jax.vmap(solve_five)(idx5)  # [n5, R, 3, 3], [n5, R]
    Es5 = Es5.reshape(-1, 3, 3)
    valid5 = valid5.reshape(-1)

    Es = jnp.concatenate([Es8, Es5])
    hypo_ok = jnp.concatenate(
        [jnp.ones(Es8.shape[0], bool), valid5]
    )
    scores = score_hypotheses(Es, hypo_ok, kpts0_n, kpts1_n, mask, thr_sq)

    # local optimisation on the TOP-K hypotheses (vmapped), not just the best:
    # iterated reweighted 8-point refits + a Gauss-Newton manifold polish.
    # Polishing several basins is what keeps contaminated-but-lucky samples
    # from winning under noise (the failure mode of single-candidate LO).
    _, top_idx = jax.lax.top_k(-scores, lo_topk)
    res_top = sampson_sq_many(Es[top_idx], kpts0_n, kpts1_n)  # [K, N]

    def local_opt(E0, res0, score0):
        E_cur, res_cur, score_cur = E0, res0, score0
        for _ in range(3):
            # soft Cauchy weights with support WIDER than the inlier gate
            # (2x threshold): when the true noise is at or above the user
            # threshold, a hard gate cuts half the genuine inliers and the
            # refit sees a biased subset — the same reason MAGSAC's
            # sigma-consensus fits up to sigma_max > threshold
            w = mask.astype(kpts0_n.dtype) / (1.0 + res_cur / (4.0 * thr_sq))
            E_refit = _eight_point(kpts0_n, kpts1_n, w)
            refit_res = sampson_sq(E_refit, kpts0_n, kpts1_n)
            refit_score = magsac_score(refit_res, mask, thr_sq)
            use = refit_score < score_cur
            E_cur = jnp.where(use, E_refit, E_cur)
            res_cur = jnp.where(use, refit_res, res_cur)
            score_cur = jnp.where(use, refit_score, score_cur)
        # manifold polish: IRLS Gauss-Newton on (R, t) with Cauchy weights
        # over all valid points (robust M-estimation, the role MAGSAC's sigma
        # marginalisation plays in the reference's OpenCV path)
        for _ in range(2):
            w = mask.astype(kpts0_n.dtype) / (1.0 + res_cur / thr_sq)
            E_gn = refine_essential_gn(E_cur, kpts0_n, kpts1_n, w)
            gn_res = sampson_sq(E_gn, kpts0_n, kpts1_n)
            gn_score = magsac_score(gn_res, mask, thr_sq)
            use = gn_score < score_cur
            E_cur = jnp.where(use, E_gn, E_cur)
            res_cur = jnp.where(use, gn_res, res_cur)
            score_cur = jnp.where(use, gn_score, score_cur)
        return E_cur, res_cur, score_cur

    E_c, res_c, score_c = jax.vmap(local_opt)(
        Es[top_idx], res_top, scores[top_idx]
    )
    winner = jnp.argmin(score_c)
    E_final = E_c[winner]
    res_final = res_c[winner]
    score_final = score_c[winner]

    # EM-style final convergence on the winner: alternate soft re-weighting
    # with a GN polish, keeping the best score seen (soft Cauchy support at
    # 2x threshold rather than a hard gate — see the LO comment; the
    # score-improvement guard makes this strictly no-worse)
    for _ in range(2):
        w_em = mask.astype(kpts0_n.dtype) / (1.0 + res_final / (4.0 * thr_sq))
        E_em = refine_essential_gn(E_final, kpts0_n, kpts1_n, w_em, n_iters=8)
        em_res = sampson_sq(E_em, kpts0_n, kpts1_n)
        em_score = magsac_score(em_res, mask, thr_sq)
        use = em_score < score_final
        E_final = jnp.where(use, E_em, E_final)
        res_final = jnp.where(use, em_res, res_final)
        score_final = jnp.where(use, em_score, score_final)

    inliers = inlier_mask(res_final, mask, thr_sq)

    valid = jnp.sum(mask.astype(jnp.int32)) >= 5
    return E_final, inliers, valid


@partial(jax.jit, static_argnames=("n_iters", "n5"))
@_f32_matmuls
def essential_pose(key, kpts0, kpts1, mask, K0, K1, pix_threshold,
                   n_iters: int = 512, n5: int | None = None):
    """Batched up-to-scale relative pose from 2D-2D correspondences.

    Equivalent of EssentialMatrixSolver.estimate_pose (reference
    pose_solver.py:29-61), vectorised over the batch.

    Args:
        kpts0, kpts1: [B, N, 2] pixel coordinates (padded).
        mask: [B, N] validity.
        K0, K1: [B, 3, 3].
        pix_threshold: RANSAC threshold in pixels.
    Returns dict with R [B,3,3], t [B,3] (unit), inliers [B] (cheirality
    count), inlier_mask [B,N] (E-matrix inliers), valid [B].
    """
    B = kpts0.shape[0]
    x0 = normalize_keypoints(kpts0, K0)
    x1 = normalize_keypoints(kpts1, K1)
    f_mean = (K0[:, 0, 0] + K1[:, 1, 1] + K0[:, 1, 1] + K1[:, 0, 0]) / 4.0
    thr = pix_threshold / f_mean  # [B]

    keys = jax.random.split(key, B)

    def per_pair(key, x0, x1, m, thr):
        k_e, k_h = jax.random.split(key)
        E, inl_e, valid = estimate_essential(k_e, x0, x1, m, thr, n_iters,
                                             n5=n5)
        R_e, t_e, n_e, _ = cheirality_pose(E, x0, x1, inl_e)

        # planar-degeneracy rescue (DEGENSAC role): when a single homography
        # explains (almost) all epipolar inliers, every H-consistent E scores
        # identically and the 8-point estimate is arbitrary; decompose the
        # robust H instead and pick the candidate by cheirality. Threshold
        # calibrated on synthetic data: true planes give overlap ratio ~1.0,
        # curved small-baseline scenes ~0.85.
        H, inl_h, n_h = estimate_homography(k_h, x0, x1, m, thr,
                                            n_iters=max(n_iters // 2, 64))
        R_h, t_h, _ = homography_cheirality_pose(H, x0, x1, inl_h)
        overlap = jnp.sum(inl_h & inl_e)
        planar = overlap >= 0.95 * jnp.sum(inl_e)

        R = jnp.where(planar, R_h, R_e)
        t = jnp.where(planar, t_h, t_e)
        inl = jnp.where(planar, inl_h, inl_e)
        n_cheir = jnp.where(planar, n_h, n_e)
        return R, t, n_cheir, inl, valid

    R, t, n, inl, valid = jax.vmap(per_pair)(keys, x0, x1, mask, thr)
    nan = jnp.nan
    R = jnp.where(valid[:, None, None], R, nan)
    t = jnp.where(valid[:, None], t, nan)
    n = jnp.where(valid, n, 0)
    # packed per-pair stats for the adaptive ladder's escalation decision:
    # [epipolar inliers, valid correspondences, valid flag] as ONE int32
    # array so the host driver pays a single tiny D2H round trip (the tunnel
    # charges ~5-30 ms per dispatch/fetch — docs/NOTES.md gotchas)
    adapt = jnp.stack(
        [jnp.sum(inl & mask, axis=1).astype(jnp.int32),
         jnp.sum(mask, axis=1).astype(jnp.int32),
         valid.astype(jnp.int32)], axis=1)
    return {"R": R, "t": t, "inliers": n, "inlier_mask": inl, "valid": valid,
            "adapt": adapt, "packed": _pack_outputs(R, t, n, adapt)}


def _pack_outputs(R, t, inliers, adapt):
    """[B, 16] f32 = [R row-major (9) | t (3) | inliers (1) | adapt (3)].

    Everything a host consumer needs in ONE array, so the whole result costs
    a single D2H round trip (counts are exact in f32 up to 2^24)."""
    B = R.shape[0]
    return jnp.concatenate(
        [R.reshape(B, 9), t.reshape(B, 3),
         inliers.reshape(B, 1).astype(jnp.float32),
         adapt.astype(jnp.float32)], axis=1)


@partial(jax.jit, static_argnames=("n_iters", "n5", "variant"))
def essential_pose_metric(key, kpts0, kpts1, mask, K0, K1, pix_threshold,
                          d0, d1, scale_threshold, variant: str = "ransac",
                          n_iters: int = 512, n5: int | None = None):
    """Essential-matrix RANSAC + metric-scale recovery fused into ONE jitted
    dispatch (a separate scale pass pays a second device round trip per
    batch; the reference runs both inside one host call too,
    pose_solver.py:114-172).

    ``d0``/``d1``: [B, N] depths pre-gathered at floor(kpts) on the host.
    Same contract as :func:`essential_pose`, except ``t`` is METRIC, ``R``
    is NaN where scale recovery found no valid-depth inlier, and
    ``inliers`` is the scale consensus count (the reference's confidence
    channel, pose_solver.py:159-172).
    """
    out = essential_pose(key, kpts0, kpts1, mask, K0, K1, pix_threshold,
                         n_iters=n_iters, n5=n5)
    t_m, inl, ok = metric_scale_from_point_depths(
        out["R"], out["t"], kpts0, kpts1, out["inlier_mask"], d0, d1, K0, K1,
        scale_threshold, variant=variant)
    R = jnp.where(ok[:, None, None], out["R"], jnp.nan)
    return {"R": R, "t": t_m, "inliers": inl,
            "inlier_mask": out["inlier_mask"], "valid": out["valid"],
            "adapt": out["adapt"],
            "packed": _pack_outputs(R, t_m, inl, out["adapt"])}


def essential_pose_adaptive(key, kpts0, kpts1, mask, K0, K1, pix_threshold,
                            n_iters: int = 512,
                            max_fail_prob: float = 0.01,
                            full_n5: int | None = None,
                            point_depths=None):
    """Two-tier batched essential-matrix estimation (host-level driver).
    Blocking form of :func:`essential_pose_adaptive_async` — see there for
    the tier-ladder design and the output contract.
    """
    return essential_pose_adaptive_async(
        key, kpts0, kpts1, mask, K0, K1, pix_threshold, n_iters=n_iters,
        max_fail_prob=max_fail_prob, full_n5=full_n5,
        point_depths=point_depths)()


def essential_pose_adaptive_async(key, kpts0, kpts1, mask, K0, K1,
                                  pix_threshold, n_iters: int = 512,
                                  max_fail_prob: float = 0.01,
                                  full_n5: int | None = None,
                                  point_depths=None):
    """Two-tier batched essential-matrix estimation (host-level driver).

    Async split: this function DISPATCHES tier 1 and returns immediately
    with a ``finish() -> dict`` continuation; ``finish`` blocks on tier 1's
    packed result, decides escalation, and runs tier 2 for the hard tail.
    A pipelined sweep (utils/submission.py) calls ``finish`` only when it
    drains its in-flight queue, so tier-1 solves of batches i+1..i+3
    overlap batch i's escalation check instead of serialising behind it.

    OpenCV's USAC terminates adaptively once enough iterations ran for the
    observed inlier ratio (reference pose_solver.py:46-48, prob=0.9999); a
    fixed-shape TPU dispatch cannot early-exit, so this mirrors the effect
    with a (n_iters, n5) budget ladder:

    - tier 1 is the standard fixed budget (n_iters 8-point, n_iters/4
      5-point samples). Its probability of missing every all-inlier
      minimal sample stays under ``max_fail_prob`` down to ~50% inlier
      ratio, so easy AND moderate batches finish in ONE device dispatch
      (round 3's extra cheap tier was a guaranteed-wasted dispatch at
      <=50% inliers — its escalation criterion could never pass there);
    - tier 2 is 5-point-heavy (``full_n5``, default 2 x n_iters -> 10x the
      candidate count of tier 1) for the hard tail: at low inlier ratios
      the minimal 5-point samples are what find the basin (w^5 >> w^8).
      Escalating pairs are GATHERED into a power-of-two sub-batch, so the
      compile count stays log2(B) and easy batches never pay for hard ones.

    A pair escalates only if tier 1's probability of having missed every
    all-inlier sample at its observed inlier ratio w —
    (1-w^5)^n5 (1-w^8)^n8 — exceeds ``max_fail_prob`` (USAC's adaptive
    termination criterion, evaluated post hoc). Tier results merge by
    epipolar-inlier count (best-of), so the two tiers' sample budgets
    compound instead of the rerun discarding tier 1's work.

    Same contract as :func:`essential_pose`. With ``point_depths``
    (a tuple ``(d0 [B,N], d1 [B,N], scale_threshold, variant)``), each tier
    runs the FUSED solver+metric-scale dispatch
    (:func:`essential_pose_metric`) so the matching track never pays a
    separate scale round trip.

    The returned dict additionally carries ``_host_packed`` — the [B, 16]
    numpy result of :func:`_pack_outputs` that the tier decision already
    fetched — so a host consumer gets R/t/inliers WITHOUT a second D2H
    round trip (models/matching.py uses it for pose extraction).
    """
    if full_n5 is None:
        full_n5 = 2 * n_iters
    # tier 1 runs n_iters/2 five-point samples (vs the fixed default's
    # n_iters/4): at 50% inliers that is what keeps the one-dispatch tier's
    # t-direction accuracy at OpenCV's level (measured: n5=128 gave tdir
    # med 0.25 deg vs OpenCV 0.18; the old escalate-everything-at-50% path
    # gave 0.24 — this buys the same accuracy without the second dispatch)
    n5_1 = max(n_iters // 2, 32)

    def solve(k, g, n5):
        sub = (lambda x: x) if g is None else (lambda x: x[g])
        args = tuple(sub(x) for x in (kpts0, kpts1, mask, K0, K1))
        if point_depths is None:
            return essential_pose(k, *args, pix_threshold,
                                  n_iters=n_iters, n5=n5)
        d0, d1, scale_thr, variant = point_depths
        return essential_pose_metric(
            k, *args, pix_threshold, sub(d0), sub(d1), scale_thr,
            variant=variant, n_iters=n_iters, n5=n5)

    B = kpts0.shape[0]
    k1_, k2_ = jax.random.split(key)
    out = solve(k1_, None, n5_1)  # tier 1 dispatched; NOT awaited here

    def finish():
        # ONE D2H round trip total for the no-escalation case: the solver
        # packs R/t/inliers AND the escalation stats [n_epipolar_inliers,
        # n_valid, valid] into out["packed"] in-graph; the same fetch that
        # drives the tier decision is attached as out["_host_packed"] so the
        # caller's pose extraction costs no second fetch (each tunnel round
        # trip is ~5-30 ms — docs/NOTES.md gotchas)
        p1 = np.asarray(out["packed"])
        n_inl = p1[:, 13]
        n_valid = np.maximum(p1[:, 14], 1)
        w = np.clip(n_inl / n_valid, 1e-3, 1 - 1e-3)
        log_fail = n5_1 * np.log1p(-(w**5)) + n_iters * np.log1p(-(w**8))
        need = (log_fail > np.log(max_fail_prob)) & (p1[:, 15] > 0)
        if not need.any():
            out["_host_packed"] = p1
            return out

        # gather the hard pairs into a power-of-two sub-batch
        idx = np.nonzero(need)[0]
        bucket = min(1 << (len(idx) - 1).bit_length(), B)
        gather = np.concatenate(
            [idx, np.zeros(bucket - len(idx), idx.dtype)])  # pad with pair 0
        g = jnp.asarray(gather)
        out_t = solve(k2_, g, full_n5)

        # scatter back, keeping whichever tier scored more epipolar inliers
        # (the budgets compound: a tier-1 win is evidence, not an accident)
        scatter = np.zeros(B, np.int32)
        scatter[idx] = np.arange(len(idx))  # rows of out_t per hard pair
        s = jnp.asarray(scatter)
        n_inl_t = out_t["adapt"][s, 0]  # tier-2 counts, already packed
        sel = jnp.asarray(need) & (n_inl_t >= jnp.asarray(n_inl))

        def pick(a, b):
            return jnp.where(sel.reshape((-1,) + (1,) * (a.ndim - 1)), b[s], a)

        merged = {k: pick(out[k], out_t[k]) for k in out}
        merged["_host_packed"] = np.asarray(merged["packed"])
        return merged

    return finish


def gather_depth(depth, kpts):
    """Sample depth maps at integer keypoint locations.

    Args:
        depth: [B, H, W]; kpts: [B, N, 2] pixel coords (x, y).
    Returns: [B, N] depths (0 outside the image).
    """
    B, H, W = depth.shape
    x = jnp.clip(kpts[..., 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(kpts[..., 1].astype(jnp.int32), 0, H - 1)
    return jax.vmap(lambda d, yy, xx: d[yy, xx])(depth, y, x)


@partial(jax.jit, static_argnames=("variant",))
def metric_scale_from_depth(R, t_unit, kpts0, kpts1, inlier_m, depth0, depth1,
                            K0, K1, scale_threshold, variant: str = "ransac"):
    """Recover the metric norm of the translation from depth MAPS [B, H, W]
    (gathers at the keypoints in-graph, then defers to
    :func:`metric_scale_from_point_depths`)."""
    kpts0_i = jnp.floor(kpts0)  # reference casts inlier kpts to int
    kpts1_i = jnp.floor(kpts1)
    d0 = gather_depth(depth0, kpts0_i)  # [B, N]
    d1 = gather_depth(depth1, kpts1_i)
    return metric_scale_from_point_depths(
        R, t_unit, kpts0, kpts1, inlier_m, d0, d1, K0, K1, scale_threshold,
        variant=variant)


def metric_scale_from_point_depths(R, t_unit, kpts0, kpts1, inlier_m, d0, d1,
                                   K0, K1, scale_threshold,
                                   variant: str = "ransac"):
    """Recover the metric norm of the translation from per-keypoint depths.

    Equivalent of EssentialMatrixMetricSolver(MEAN) (reference
    pose_solver.py:64-172): back-project E-inliers at both cameras, rotate
    cloud0 into cloud1's frame, project per-correspondence residuals onto the
    translation direction; aggregate by 1-D RANSAC (all N hypotheses scored
    densely) or by the mean of cloud means.

    ``d0``/``d1`` are [B, N] depths sampled at floor(kpts) — the host
    pipeline gathers them from the depth maps BEFORE transfer, so the
    tunnel ships [B, N] instead of two full [B, H, W] maps (~50x fewer
    bytes at 2048 correspondences and 540x720 maps).

    Returns (t_metric [B, 3], inliers [B], valid [B]).
    """
    from mapfree_tpu.geom.projection import backproject_3d

    kpts0_i = jnp.floor(kpts0)  # reference casts inlier kpts to int
    kpts1_i = jnp.floor(kpts1)
    valid_d = (d0 > 0) & (d1 > 0) & inlier_m  # [B, N]

    xyz0 = backproject_3d(kpts0_i, d0, K0)  # [B, N, 3]
    xyz1 = backproject_3d(kpts1_i, d1, K1)
    xyz0r = xyz0 @ jnp.swapaxes(R, 1, 2)  # rotate into camera-1 axes

    if variant == "mean":
        w = valid_d.astype(xyz0.dtype)[..., None]
        wsum = jnp.maximum(w.sum(axis=1), 1e-9)
        pmean0 = (xyz0r * w).sum(axis=1) / wsum
        pmean1 = (xyz1 * w).sum(axis=1) / wsum
        scale = jnp.sum((pmean1 - pmean0) * t_unit, axis=-1)  # [B]
        n_inl = jnp.sum(valid_d, axis=1)
    else:
        # per-correspondence scale hypotheses
        scale_i = jnp.sum((xyz1 - xyz0r) * t_unit[:, None, :], axis=-1)  # [B, N]
        diff = jnp.abs(scale_i[:, :, None] - scale_i[:, None, :])  # [B, N, N]
        ok = valid_d[:, :, None] & valid_d[:, None, :] & (diff < scale_threshold)
        counts = jnp.sum(ok, axis=1)  # [B, N] inliers per hypothesis
        counts = jnp.where(valid_d, counts, -1)
        best = jnp.argmax(counts, axis=-1)  # [B]
        scale = jnp.take_along_axis(scale_i, best[:, None], axis=1)[:, 0]
        n_inl = jnp.take_along_axis(counts, best[:, None], axis=1)[:, 0]

    has_depth = jnp.sum(valid_d, axis=1) >= 1
    t_metric = scale[:, None] * t_unit
    t_metric = jnp.where(has_depth[:, None], t_metric, jnp.nan)
    n_inl = jnp.where(has_depth, n_inl, 0)
    return t_metric, n_inl, has_depth
