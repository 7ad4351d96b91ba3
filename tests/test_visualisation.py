"""Visualisation smoke tests: frustum geometry, scene render to MP4."""

import numpy as np

from mapfree_tpu.geom import quat2mat
from mapfree_tpu.visualisation import (
    LazyCamera,
    error_color,
    frustum_points,
    render_scene,
)

rng = np.random.default_rng(2)


def test_frustum_points_geometry():
    pts = frustum_points(np.eye(3), np.zeros(3), scale=0.2)
    assert pts.shape == (5, 3)
    assert np.allclose(pts[0], 0)          # apex at camera center
    assert np.allclose(pts[1:, 2], 0.24)   # image plane at scale*1.2


def test_error_color_endpoints():
    assert np.allclose(error_color(0.0, 0.0)[:2], (0, 1))   # green
    assert np.allclose(error_color(1.0, 0.0)[:2], (1, 0))   # red (t over thr)
    assert np.allclose(error_color(0.0, 90.0)[:2], (1, 0))  # red (R over thr)


def test_lazy_camera_smooths():
    cam = LazyCamera(smoothing=0.5)
    cam.update(np.zeros(3))
    cam.update(np.array([1.0, 0, 0]))
    assert 0 < cam.center[0] < 1.0  # smoothed between targets
    elev, azim = cam.elev_azim()
    assert np.isfinite(elev) and np.isfinite(azim)


def test_render_scene_writes_mp4(tmp_path):
    q = np.array([1.0, 0, 0, 0])
    gt = {i: (q, np.array([0.1 * i, 0, 1.0]), None) for i in range(0, 15, 5)}
    est = {
        0: (q, np.array([0.0, 0.02, 1.0]), 50.0),
        5: (q, np.array([0.5, 0.3, 1.2]), 10.0),
        # frame 10 missing -> "no estimate" path
    }
    out = tmp_path / "scene.mp4"
    n = render_scene(gt, est, out, fps=2)
    assert n == 3
    assert out.exists() and out.stat().st_size > 1000
