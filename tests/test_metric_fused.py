"""Fused solver+scale dispatch and host point-depth gathering.

Round-4 matching-track pipeline: the host gathers depth AT the
correspondences before transfer (ships [B, N] instead of [B, H, W] maps)
and the metric-scale recovery runs inside the SAME jitted dispatch as the
essential-matrix RANSAC (reference runs both within one host call too,
pose_solver.py:114-172). These tests pin the refactor to the previous
two-dispatch full-map path.
"""

import numpy as np

import jax
import jax.numpy as jnp

from mapfree_tpu.models.matching import FeatureMatchingModel
from mapfree_tpu.ops.essential import (
    essential_pose,
    essential_pose_adaptive,
    essential_pose_metric,
    gather_depth,
    metric_scale_from_depth,
    metric_scale_from_point_depths,
)

from tests.test_solvers import IMG_H, IMG_W, K, synth_pair


def _depth_maps(X, R, t):
    """Depth maps consistent with the two-view geometry."""
    depth0 = np.zeros((IMG_H, IMG_W), np.float32)
    depth1 = np.zeros((IMG_H, IMG_W), np.float32)
    X1 = X @ R.T + t
    for P, depth in ((X, depth0), (X1, depth1)):
        uv = P @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        ui = np.clip(uv[:, 0].astype(int), 0, IMG_W - 1)
        vi = np.clip(uv[:, 1].astype(int), 0, IMG_H - 1)
        depth[vi, ui] = P[:, 2]
    return depth0, depth1


def _batch(seed_list, n_outliers=0, noise=0.0):
    pairs = [synth_pair(seed=s, n_outliers=n_outliers, noise=noise)
             for s in seed_list]
    k0 = jnp.asarray(np.stack([p[0] for p in pairs]))
    k1 = jnp.asarray(np.stack([p[1] for p in pairs]))
    mask = jnp.asarray(np.stack([p[2] for p in pairs]))
    Ks = jnp.asarray(np.tile(K, (len(pairs), 1, 1)))
    maps = [_depth_maps(p[5], p[3], p[4]) for p in pairs]
    d0_maps = jnp.asarray(np.stack([m[0] for m in maps]))
    d1_maps = jnp.asarray(np.stack([m[1] for m in maps]))
    return pairs, k0, k1, mask, Ks, d0_maps, d1_maps


class TestHostDepthGather:
    def test_matches_device_gather(self):
        pairs, k0, k1, mask, Ks, d0_maps, d1_maps = _batch([1, 2])
        host = FeatureMatchingModel._gather_depth_host(
            np.asarray(d0_maps), np.asarray(k0))
        dev = gather_depth(d0_maps, jnp.floor(k0))
        np.testing.assert_array_equal(host, np.asarray(dev))

    def test_point_depths_equal_full_maps(self):
        """metric_scale_from_point_depths on host-gathered depths must equal
        metric_scale_from_depth on the full maps bit-for-bit."""
        pairs, k0, k1, mask, Ks, d0_maps, d1_maps = _batch([3, 4])
        out = essential_pose(jax.random.PRNGKey(0), k0, k1, mask, Ks, Ks,
                             2.0, n_iters=128)
        from_maps = metric_scale_from_depth(
            out["R"], out["t"], k0, k1, out["inlier_mask"],
            d0_maps, d1_maps, Ks, Ks, 0.1)
        d0 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d0_maps), np.asarray(k0))
        d1 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d1_maps), np.asarray(k1))
        from_points = jax.jit(metric_scale_from_point_depths,
                              static_argnames=("variant",))(
            out["R"], out["t"], k0, k1, out["inlier_mask"],
            jnp.asarray(d0), jnp.asarray(d1), Ks, Ks, 0.1)
        for a, b in zip(from_maps, from_points):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestFusedMetricDispatch:
    def test_fused_equals_two_dispatch(self):
        """essential_pose_metric (one dispatch) must reproduce the
        essential_pose + metric_scale_from_depth two-dispatch pipeline for
        the same PRNG key."""
        pairs, k0, k1, mask, Ks, d0_maps, d1_maps = _batch(
            [5, 6], n_outliers=40, noise=0.3)
        key = jax.random.PRNGKey(7)
        out = essential_pose(key, k0, k1, mask, Ks, Ks, 2.0, n_iters=128)
        t_m, inl, ok = metric_scale_from_depth(
            out["R"], out["t"], k0, k1, out["inlier_mask"],
            d0_maps, d1_maps, Ks, Ks, 0.1)
        R_ref = np.where(np.asarray(ok)[:, None, None],
                         np.asarray(out["R"]), np.nan)

        d0 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d0_maps), np.asarray(k0))
        d1 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d1_maps), np.asarray(k1))
        fused = essential_pose_metric(
            key, k0, k1, mask, Ks, Ks, 2.0, jnp.asarray(d0), jnp.asarray(d1),
            0.1, n_iters=128)
        np.testing.assert_allclose(np.asarray(fused["R"]), R_ref, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fused["t"]), np.asarray(t_m),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(fused["inliers"]),
                                      np.asarray(inl))

    def test_metric_accuracy(self):
        """Fused dispatch recovers the METRIC translation on clean pairs."""
        pairs, k0, k1, mask, Ks, d0_maps, d1_maps = _batch([8, 9, 10])
        d0 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d0_maps), np.asarray(k0))
        d1 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d1_maps), np.asarray(k1))
        fused = essential_pose_metric(
            jax.random.PRNGKey(1), k0, k1, mask, Ks, Ks, 2.0,
            jnp.asarray(d0), jnp.asarray(d1), 0.1, n_iters=256)
        for i, (_, _, _, R_gt, t_gt, _) in enumerate(pairs):
            t_est = np.asarray(fused["t"][i])
            err = min(np.linalg.norm(t_est - t_gt),
                      np.linalg.norm(t_est + t_gt))
            assert err < 0.2, (i, t_est, t_gt)


class TestAdaptiveFused:
    def test_point_depths_ladder(self):
        """The two-tier ladder with fused scale: a hard pair escalates and
        still comes back with a metric translation."""
        pairs, k0, k1, mask, Ks, d0_maps, d1_maps = _batch(
            [11, 12], n_outliers=110, noise=0.5)
        d0 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d0_maps), np.asarray(k0))
        d1 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d1_maps), np.asarray(k1))
        out = essential_pose_adaptive(
            jax.random.PRNGKey(2), k0, k1, mask, Ks, Ks, 2.0, n_iters=256,
            point_depths=(jnp.asarray(d0), jnp.asarray(d1), 0.1, "ransac"))
        for i, (_, _, _, R_gt, t_gt, _) in enumerate(pairs):
            t_est = np.asarray(out["t"][i])
            assert np.isfinite(t_est).all(), i
            err = min(np.linalg.norm(t_est - t_gt),
                      np.linalg.norm(t_est + t_gt))
            assert err < 0.3, (i, t_est, t_gt)


class TestPnPPointDepths:
    def test_point_depths_equal_full_map(self):
        from mapfree_tpu.ops.pnp import pnp_pose

        pairs, k0, k1, mask, Ks, d0_maps, _ = _batch([13, 14])
        key = jax.random.PRNGKey(3)
        full = pnp_pose(key, k0, k1, mask, d0_maps, Ks, Ks, 3.0, n_iters=128)
        d0 = FeatureMatchingModel._gather_depth_host(
            np.asarray(d0_maps), np.asarray(k0))
        pts = pnp_pose(key, k0, k1, mask, jnp.asarray(d0), Ks, Ks, 3.0,
                       n_iters=128, point_depths=True)
        for k in full:
            np.testing.assert_array_equal(np.asarray(full[k]),
                                          np.asarray(pts[k]))
