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


class TestRasterizer:
    def _raster(self):
        from mapfree_tpu.visualisation.raster import Rasterizer

        r = Rasterizer(160, 120)
        r.set_view(np.array([0.0, 0.0, -3.0]), np.zeros(3))
        return r

    def test_zbuffer_occlusion(self):
        r = self._raster()
        far = np.array([[[-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0]]])
        near = np.array([[[-1, -1, 0.0], [1, -1, 0.0], [0, 1, 0.0]]])
        r.draw_triangles(far, np.array([[255, 0, 0]]), shade=False)
        r.draw_triangles(near, np.array([[0, 255, 0]]), shade=False)
        # center pixel must show the NEAR (green) triangle
        cpix = r.color[60, 80]
        assert cpix[1] > 200 and cpix[0] < 50, cpix
        # drawing far again must NOT overwrite
        r.draw_triangles(far, np.array([[255, 0, 0]]), shade=False)
        assert r.color[60, 80][1] > 200

    def test_texture_mapping(self):
        r = self._raster()
        tex = np.zeros((8, 8, 3), np.uint8)
        tex[:4, :4] = (255, 0, 0)  # top-left quadrant (u,v < 0.5) -> red
        tex[4:, 4:] = (0, 0, 255)  # bottom-right quadrant -> blue
        tris = np.array([
            [[-1, -1, 0.0], [1, -1, 0.0], [1, 1, 0.0]],
            [[-1, -1, 0.0], [1, 1, 0.0], [-1, 1, 0.0]],
        ])
        uv = np.array([
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ], np.float64)
        r.draw_triangles(tris, np.zeros((2, 3)), shade=False,
                         texture=tex, uvs=uv)
        # square projects to x in [29, 131], y in [9, 111]; y is down in
        # view space so uv(0,0) lands top-left on screen
        assert r.color[20, 40][0] > 200      # red near top-left
        assert r.color[100, 120][2] > 200    # blue near bottom-right

    def test_render_scene_with_images(self, tmp_path):
        q = np.array([1.0, 0, 0, 0])
        gt = {i: (q, np.array([0.1 * i, 0, 1.0]), None) for i in (0, 5)}
        est = {0: (q, np.array([0.0, 0.02, 1.0]), 50.0)}
        imgs = {i: np.full((30, 40, 3), 200, np.uint8) for i in (0, 5)}
        out = tmp_path / "scene.mp4"
        n = render_scene(gt, est, out, fps=2, size=(320, 240),
                         scene_images=imgs)
        assert n == 2 and out.stat().st_size > 1000
