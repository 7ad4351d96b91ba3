"""Differentiable batched Kabsch/Procrustes alignment (jnp).

TPU-native port of the reference solver (reference: lib/utils/solver.py:4-37,
which uses torch.svd). Used both by the Procrustes regression heads and as the
minimal solver inside the batched Procrustes-RANSAC (reference replacement for
Open3D registration, lib/models/matching/pose_solver.py:285-287).

Supports per-point weights so masked (padded) correspondences can participate
in a fixed-shape RANSAC without NaN leakage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mapfree_tpu.geom.smallblas import det3, f32_matmuls as _f32_matmuls, svd3


@_f32_matmuls
def procrustes(A, B, weights=None):
    """Find R, t minimising || (A @ R^T + t) - B || over rigid transforms.

    Args:
        A: [B, N, 3] source points.
        B: [B, N, 3] target points.
        weights: optional [B, N] non-negative weights (e.g. inlier mask).
    Returns:
        R: [B, 3, 3]; t: [B, 1, 3]  (convention matches reference solver.py:
        B ≈ A @ R^T + t).
    """
    if weights is None:
        a_mean = A.mean(axis=1, keepdims=True)
        b_mean = B.mean(axis=1, keepdims=True)
        A_c = A - a_mean
        B_c = B - b_mean
        H = jnp.swapaxes(A_c, -1, -2) @ B_c
    else:
        w = weights[..., None]  # [B, N, 1]
        wsum = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-9)
        a_mean = (A * w).sum(axis=1, keepdims=True) / wsum
        b_mean = (B * w).sum(axis=1, keepdims=True) / wsum
        A_c = (A - a_mean) * w
        B_c = B - b_mean
        H = jnp.swapaxes(A_c, -1, -2) @ B_c

    U, S, Vt = svd3(H)
    V = jnp.swapaxes(Vt, -1, -2)
    det = det3(U @ Vt)
    # fix orientation so det(R) = +1: R = V @ diag(1, 1, sign) @ U^T
    sign = jnp.sign(det)[..., None]  # [B, 1]
    V_fixed = jnp.concatenate([V[..., :2], V[..., 2:] * sign[..., None]], axis=-1)
    R = V_fixed @ jnp.swapaxes(U, -1, -2)
    t = b_mean - a_mean @ jnp.swapaxes(R, -1, -2)
    return R, t
