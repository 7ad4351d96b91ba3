"""Batched small-matrix factorizations (geom/smallblas.py) vs numpy LAPACK."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapfree_tpu.geom.smallblas import smallest_eigvec, smallest_eigvecs, svd3


@pytest.mark.parametrize("seed", range(3))
def test_svd3_reconstruction_random(seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(257, 3, 3)).astype(np.float32)
    U, S, Vt = jax.jit(svd3)(jnp.asarray(A))
    U, S, Vt = map(np.asarray, (U, S, Vt))

    recon = U @ (S[..., None] * Vt)
    assert np.max(np.abs(recon - A)) < 2e-5

    # orthogonality
    eye = np.eye(3, dtype=np.float32)
    assert np.max(np.abs(U.transpose(0, 2, 1) @ U - eye)) < 2e-5
    assert np.max(np.abs(Vt @ Vt.transpose(0, 2, 1) - eye)) < 2e-5

    # singular values: descending, non-negative, match LAPACK
    assert np.all(S >= -1e-7)
    assert np.all(S[:, :-1] >= S[:, 1:] - 1e-6)
    S_np = np.linalg.svd(A, compute_uv=False)
    assert np.max(np.abs(S - S_np)) < 2e-5


def test_svd3_degenerate_cases():
    mats = np.stack([
        np.zeros((3, 3)),
        np.eye(3),
        np.diag([1.0, 1.0, 0.0]),
        np.diag([5.0, 5.0, 5.0]),
        np.outer([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),  # rank 1
    ]).astype(np.float32)
    U, S, Vt = svd3(jnp.asarray(mats))
    recon = np.asarray(U) @ (np.asarray(S)[..., None] * np.asarray(Vt))
    assert np.max(np.abs(recon - mats)) < 2e-5
    S_np = np.linalg.svd(mats, compute_uv=False)
    assert np.max(np.abs(np.asarray(S) - S_np)) < 2e-5
    # U/V must be completed to full orthonormal bases even at reduced rank
    # (LAPACK contract; procrustes' det-sign fix depends on it)
    eye = np.eye(3, dtype=np.float32)
    U, Vt = np.asarray(U), np.asarray(Vt)
    assert np.max(np.abs(U.transpose(0, 2, 1) @ U - eye)) < 2e-5
    assert np.max(np.abs(Vt @ Vt.transpose(0, 2, 1) - eye)) < 2e-5


def test_svd3_grad_finite():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(4, 3, 3)), jnp.float32)

    def f(A):
        U, S, Vt = svd3(A)
        return jnp.sum(S) + jnp.sum(U[..., 0] * Vt[..., 0, :])

    g = jax.grad(f)(A)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("n,k", [(9, 1), (9, 4), (10, 1), (3, 1)])
def test_smallest_eigvecs_span(n, k):
    """Subspace agrees with LAPACK's k smallest eigenvectors (projector
    comparison — the basis itself is only defined up to rotation)."""
    rng = np.random.default_rng(n * 10 + k)
    # PSD with a clear spectral gap below the k-th smallest
    Q = np.linalg.qr(rng.normal(size=(64, n, n)))[0]
    lam = np.sort(rng.uniform(1.0, 10.0, size=(64, n)), axis=-1)
    lam[:, :k] *= 1e-6  # near-nullspace
    M = (Q * lam[:, None, :]) @ Q.transpose(0, 2, 1)
    M = ((M + M.transpose(0, 2, 1)) / 2).astype(np.float32)

    X = np.asarray(smallest_eigvecs(jnp.asarray(M), k))
    _, V = np.linalg.eigh(M)
    V_k = V[..., :k]

    P_est = X @ X.transpose(0, 2, 1)
    P_ref = V_k @ V_k.transpose(0, 2, 1)
    assert np.max(np.abs(P_est - P_ref)) < 1e-3


def test_smallest_eigvec_exact_nullspace():
    """Minimal-sample nullspace: A [5, 9] -> nullspace of A^T A found
    exactly (the 5-point use case)."""
    rng = np.random.default_rng(1)
    A = rng.normal(size=(32, 5, 9)).astype(np.float32)
    M = A.transpose(0, 2, 1) @ A
    X = np.asarray(smallest_eigvecs(jnp.asarray(M), 4))
    # columns orthonormal and in the nullspace
    eye = np.eye(4, dtype=np.float32)
    assert np.max(np.abs(X.transpose(0, 2, 1) @ X - eye)) < 1e-4
    assert np.max(np.abs(A @ X)) < 1e-2  # A has O(1) entries


def test_smallest_eigvec_lo_refit_spectrum():
    """The least-squares-refit use case: M = sum w_i a_i a_i^T over noisy
    epipolar constraint rows — the residual eigenvalue is orders of magnitude
    below the data spread (lam0/lam1 ~ 1e-3), where inverse iteration
    converges geometrically. Rayleigh quotient must land at the bottom."""
    rng = np.random.default_rng(2)
    # rows = clean nullspace-constrained vectors + small noise
    e = rng.normal(size=(64, 9))
    e /= np.linalg.norm(e, axis=-1, keepdims=True)
    basis = np.stack([np.linalg.svd(e_[None])[2][1:] for e_ in e])  # [64,8,9]
    coef = rng.normal(size=(64, 256, 8))
    A = (coef @ basis + 0.01 * rng.normal(size=(64, 256, 9))).astype(np.float32)
    M = A.transpose(0, 2, 1) @ A
    x = np.asarray(smallest_eigvec(jnp.asarray(M)))
    lam = np.linalg.eigvalsh(M)
    rq = np.einsum("bi,bij,bj->b", x, M, x)
    gap = lam[:, 1] - lam[:, 0]
    assert np.all(rq <= lam[:, 0] + 0.01 * gap)


def test_det_small_matches_lapack():
    from mapfree_tpu.geom.smallblas import det3, det_small

    rng = np.random.default_rng(3)
    for n in (3, 5, 10):
        A = rng.normal(size=(512, n, n)).astype(np.float32)
        d = np.asarray(det_small(jnp.asarray(A)))
        d_np = np.linalg.det(A)
        scale = np.abs(d_np) + 1e-6
        # f32 vs LAPACK f64; the solver only needs the SIGN for bracketing
        assert np.max(np.abs(d - d_np) / scale) < 2e-2, n
        assert np.all(np.sign(d) == np.sign(d_np).astype(np.float32))
    # singular matrices -> 0
    A = rng.normal(size=(64, 10, 10)).astype(np.float32)
    A[:, -1] = A[:, 0]  # duplicate row
    d = np.asarray(det_small(jnp.asarray(A)))
    assert np.max(np.abs(d)) < 1e-2
    # det3 closed form
    A3 = rng.normal(size=(256, 3, 3)).astype(np.float32)
    assert np.max(np.abs(np.asarray(det3(jnp.asarray(A3))) - np.linalg.det(A3))) < 1e-4


def test_nullspace_qr_exact():
    from mapfree_tpu.geom.smallblas import nullspace_qr

    rng = np.random.default_rng(9)
    A = rng.normal(size=(256, 5, 9)).astype(np.float32)
    N = np.asarray(nullspace_qr(jnp.asarray(A)))
    assert N.shape == (256, 9, 4)
    # exact nullspace, orthonormal columns
    assert np.abs(np.einsum("bmn,bnk->bmk", A, N)).max() < 1e-5
    assert np.abs(np.einsum("bnk,bnl->bkl", N, N) - np.eye(4)).max() < 1e-5
    # same subspace as scipy (projector comparison)
    import scipy.linalg as sla

    for b in range(8):
        ns = sla.null_space(A[b])
        assert np.abs(ns @ ns.T - N[b] @ N[b].T).max() < 1e-5


def test_qr_solve_matches_lapack():
    from mapfree_tpu.geom.smallblas import qr_solve

    rng = np.random.default_rng(5)
    for n, m in ((3, 1), (9, 4), (10, 10)):
        A = rng.normal(size=(256, n, n)).astype(np.float32)
        B = rng.normal(size=(256, n, m)).astype(np.float32)
        X = np.asarray(qr_solve(jnp.asarray(A), jnp.asarray(B)))
        # Householder QR is backward stable: judge by residual, not by
        # distance to the f64 solution (random f32 matrices can be
        # arbitrarily ill-conditioned, which blows up forward error for
        # ANY solver)
        resid = np.abs(np.einsum("bij,bjm->bim", A, X) - B)
        scale = (np.abs(A).sum(-1).max(-1) * np.abs(X).max((-2, -1)))[
            :, None, None] + 1.0
        assert np.max(resid / scale) < 1e-5, (n, m)
    # singular A -> non-finite or useless-residual garbage; callers mask
    # such hypotheses by score/validity (RANSAC semantics), so the only
    # contract is that the output does NOT masquerade as a solution
    A = rng.normal(size=(8, 6, 6)).astype(np.float32)
    B = rng.normal(size=(8, 6, 2)).astype(np.float32)
    A[:, -1] = A[:, 0]  # exactly dependent rows, B inconsistent
    X = np.asarray(qr_solve(jnp.asarray(A), jnp.asarray(B)))
    resid = np.abs(np.einsum("bij,bjm->bim", A, X) - B).max((-2, -1))
    assert np.all(~np.isfinite(X).all((-2, -1)) | (resid > 1e-2))
