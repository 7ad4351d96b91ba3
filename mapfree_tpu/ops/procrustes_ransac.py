"""Batched 3D-3D registration: correspondence-RANSAC Kabsch + fixed-iter ICP.

TPU-native replacement for the reference's Open3D path
(reference lib/models/matching/pose_solver.py:238-320):
- ``registration_ransac_based_on_correspondence`` -> fixed-budget RANSAC with
  a vmapped 3-point Kabsch minimal solver and Euclidean inlier scoring,
  followed by a weighted Kabsch refit on the inliers;
- ``registration_icp`` (30 iters) -> lax.scan point-to-point ICP with
  brute-force nearest neighbours over fixed-size subsampled clouds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mapfree_tpu.geom.procrustes import procrustes
from mapfree_tpu.geom.smallblas import f32_matmuls as _f32_matmuls
from mapfree_tpu.ops.ransac import masked_sample_indices

_MIN_POINTS = 3
_ICP_ITERS = 30


def _transform(R, t, X):
    return X @ R.T + t


@_f32_matmuls
def procrustes_ransac_single(key, xyz0, xyz1, mask, max_corr_dist,
                             n_iters: int = 256):
    """Single-pair rigid registration with known correspondences.

    Returns R [3,3], t [3], inlier count, final inlier mask.
    """
    thr_sq = max_corr_dist * max_corr_dist
    idx = masked_sample_indices(key, mask, n_iters, 3)

    def solve_one(sample_idx):
        A = xyz0[sample_idx][None]
        B = xyz1[sample_idx][None]
        w = mask[sample_idx].astype(xyz0.dtype)[None]
        R, t = procrustes(A, B, w)
        return R[0], t[0, 0]

    Rs, ts = jax.vmap(solve_one)(idx)  # [It, 3, 3], [It, 3]
    res = jax.vmap(lambda R, t: jnp.sum((_transform(R, t, xyz0) - xyz1) ** 2, -1))(
        Rs, ts
    )  # [It, N]
    inliers = (res < thr_sq) & mask
    counts = jnp.sum(inliers, axis=-1)
    best = jnp.argmax(counts)

    # local optimisation: IRLS-weighted Kabsch refits on the best hypothesis
    # (Cauchy weights, sigma = thr/3) — downweights borderline inliers that a
    # hard-threshold refit would let skew the fit
    sigma_sq = thr_sq / 9.0
    R_fin, t_fin = Rs[best], ts[best]
    res_fin = res[best]
    inl_fin = inliers[best]
    for _ in range(3):
        w = inl_fin.astype(xyz0.dtype) / (1.0 + res_fin / sigma_sq)
        R_ref, t_ref = procrustes(xyz0[None], xyz1[None], w[None])
        R_ref, t_ref = R_ref[0], t_ref[0, 0]
        res_ref = jnp.sum((_transform(R_ref, t_ref, xyz0) - xyz1) ** 2, axis=-1)
        inl_ref = (res_ref < thr_sq) & mask
        better = jnp.sum(inl_ref) >= jnp.sum(inl_fin)
        R_fin = jnp.where(better, R_ref, R_fin)
        t_fin = jnp.where(better, t_ref, t_fin)
        res_fin = jnp.where(better, res_ref, res_fin)
        inl_fin = jnp.where(better, inl_ref, inl_fin)
    return R_fin, t_fin, jnp.sum(inl_fin), inl_fin


@_f32_matmuls
def icp_point_to_point(R0, t0, cloud0, mask0, cloud1, mask1, max_corr_dist,
                       n_iters: int = _ICP_ITERS):
    """Fixed-iteration point-to-point ICP with brute-force NN (single pair).

    Equivalent of Open3D registration_icp with max_iteration=30 (reference
    pose_solver.py:307-315); clouds are fixed-size subsampled with masks.
    """
    thr_sq = max_corr_dist * max_corr_dist
    big = jnp.asarray(1e12, cloud0.dtype)

    def step(carry, _):
        R, t = carry
        moved = _transform(R, t, cloud0)  # [N0, 3]
        # squared distances [N0, N1]; masked columns excluded
        d2 = (
            jnp.sum(moved**2, -1)[:, None]
            - 2.0 * moved @ cloud1.T
            + jnp.sum(cloud1**2, -1)[None, :]
        )
        d2 = jnp.where(mask1[None, :], d2, big)
        nn = jnp.argmin(d2, axis=1)  # [N0]
        nn_d2 = jnp.take_along_axis(d2, nn[:, None], axis=1)[:, 0]
        w = (mask0 & (nn_d2 < thr_sq)).astype(cloud0.dtype)
        target = cloud1[nn]
        R_new, t_new = procrustes(cloud0[None], target[None], w[None])
        ok = jnp.sum(w) >= 3
        R = jnp.where(ok, R_new[0], R)
        t = jnp.where(ok, t_new[0, 0], t)
        return (R, t), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=n_iters)
    return R, t


@partial(jax.jit, static_argnames=("n_iters", "refine"))
@_f32_matmuls
def procrustes_pose(key, pts0, pts1, mask, depth0, depth1, K0, K1,
                    max_corr_dist, n_iters: int = 256, refine: bool = False,
                    icp_cloud0=None, icp_mask0=None, icp_cloud1=None,
                    icp_mask1=None):
    """Batched metric pose from 3D-3D correspondences.

    Equivalent of ProcrustesSolver.estimate_pose (reference
    pose_solver.py:247-320). When ``refine`` is set, fixed-size subsampled
    dense clouds (built host-side from the full depth maps) are refined with
    30-iteration ICP initialised at the RANSAC estimate.

    Returns dict with R [B,3,3], t [B,3], inliers [B], valid [B].
    """
    from mapfree_tpu.geom.projection import backproject_3d
    from mapfree_tpu.ops.essential import gather_depth

    B = pts0.shape[0]
    pts0_i = jnp.floor(pts0)
    pts1_i = jnp.floor(pts1)
    d0 = gather_depth(depth0, pts0_i)
    d1 = gather_depth(depth1, pts1_i)
    valid = mask & (d0 > 0) & (d1 > 0)

    xyz0 = backproject_3d(pts0_i, d0, K0)
    xyz1 = backproject_3d(pts1_i, d1, K1)

    keys = jax.random.split(key, B)
    R, t, n, _ = jax.vmap(
        lambda k, a, b, m: procrustes_ransac_single(k, a, b, m, max_corr_dist,
                                                    n_iters)
    )(keys, xyz0, xyz1, valid)

    if refine:
        assert icp_cloud0 is not None, "refine=True requires dense clouds"
        R, t = jax.vmap(
            lambda R0, t0, c0, m0, c1, m1: icp_point_to_point(
                R0, t0, c0, m0, c1, m1, max_corr_dist
            )
        )(R, t, icp_cloud0, icp_mask0, icp_cloud1, icp_mask1)

    ok = jnp.sum(valid, axis=1) >= _MIN_POINTS
    R = jnp.where(ok[:, None, None], R, jnp.nan)
    t = jnp.where(ok[:, None], t, jnp.nan)
    n = jnp.where(ok, n, 0)
    return {"R": R, "t": t, "inliers": n, "valid": ok}


def dense_cloud_from_depth(depth, K, max_points: int, seed: int = 0):
    """Host-side helper: subsample a fixed-size 3D cloud from a depth map.

    Args:
        depth: [H, W] numpy array; K: [3, 3].
    Returns (cloud [max_points, 3], mask [max_points]) numpy arrays.
    """
    import numpy as np

    from mapfree_tpu.geom.projection import backproject_3d as bp

    H, W = depth.shape
    vv, uu = np.mgrid[0:H, 0:W]
    uv = np.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1).astype(np.float32)
    d = depth.reshape(-1)
    valid = d > 0
    uv, d = uv[valid], d[valid]
    n = uv.shape[0]
    rng = np.random.default_rng(seed)
    if n > max_points:
        sel = rng.choice(n, size=max_points, replace=False)
        uv, d = uv[sel], d[sel]
        n = max_points
    cloud = np.zeros((max_points, 3), np.float32)
    maskv = np.zeros((max_points,), bool)
    if n > 0:
        cloud[:n] = bp(uv, d, K)
        maskv[:n] = True
    return cloud, maskv
