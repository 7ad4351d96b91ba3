"""Pure-numpy z-buffered software renderer for scene visualisation.

The reference renders with pyrender/EGL (reference
visualisation/render_scene.py + render_util.py, 865 LoC of mesh plumbing);
pyrender is not in this image, so this module provides the same visual
vocabulary — solid shaded camera-frustum meshes, image-textured frustum
planes, trajectory cuboids, a colormapped ground grid, position markers —
as a compact perspective rasterizer: project, clip, barycentric fill with a
z-buffer and headlight Lambert shading. Scenes are a few hundred triangles,
so a per-triangle numpy loop renders a 960x720 frame in tens of ms.
"""

from __future__ import annotations

import numpy as np


# ----------------------------------------------------------------- camera ---


def look_at(eye, center, up=(0.0, -1.0, 0.0)):
    """World->view rotation/translation for an observer at ``eye`` looking at
    ``center`` (OpenCV convention: +z forward, +y down)."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(center, np.float64) - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    upv = -np.asarray(up, np.float64)
    right = np.cross(upv, fwd)
    if np.linalg.norm(right) < 1e-9:  # up parallel to fwd: pick any right
        right = np.cross(np.array([1.0, 0.0, 0.0]), fwd)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # rows = view axes
    t = -R @ eye
    return R, t


# -------------------------------------------------------------- rasterizer --


class Rasterizer:
    """Perspective rasterizer with z-buffer, flat triangles and textures."""

    def __init__(self, width=960, height=720, fov_deg=55.0,
                 background=(12, 12, 16)):
        self.W, self.H = int(width), int(height)
        f = 0.5 * self.W / np.tan(np.radians(fov_deg) / 2)
        self.K = np.array([[f, 0, self.W / 2], [0, f, self.H / 2], [0, 0, 1.0]])
        self.background = np.asarray(background, np.uint8)
        self.near = 0.05
        self.clear()

    def clear(self):
        self.color = np.tile(self.background, (self.H, self.W, 1)).astype(np.uint8)
        self.depth = np.full((self.H, self.W), np.inf, np.float64)

    def set_view(self, eye, center, up=(0.0, -1.0, 0.0)):
        self.Rv, self.tv = look_at(eye, center, up)

    # -- low level ------------------------------------------------------

    def _project(self, pts_world):
        """[N, 3] world -> ([N, 2] pixels, [N] view depth)."""
        pv = pts_world @ self.Rv.T + self.tv
        z = pv[:, 2]
        uvw = pv @ self.K.T
        uv = uvw[:, :2] / np.maximum(z[:, None], 1e-9)
        return uv, z

    def draw_triangles(self, tris, colors, shade=True, texture=None,
                       uvs=None):
        """Rasterise triangles with the z-buffer.

        Args:
            tris: [N, 3, 3] world-space vertices.
            colors: [N, 3] uint8 face colors (ignored where textured).
            shade: headlight Lambert shading on face normals.
            texture: optional [h, w, 3] uint8 image; uvs [N, 3, 2] in [0, 1]
                map triangle corners into it (affine approximation, which is
                exact for the fronto-rendered image planes used here).
        """
        tris = np.asarray(tris, np.float64)
        colors = np.asarray(colors)
        for i in range(len(tris)):
            self._triangle(tris[i], colors[i], shade,
                           texture, None if uvs is None else uvs[i])

    def _triangle(self, tri, color, shade, texture, uv):
        pix, z = self._project(tri)
        if np.any(z <= self.near):  # cheap clip: drop near-plane crossers
            return
        x0 = max(int(np.floor(pix[:, 0].min())), 0)
        x1 = min(int(np.ceil(pix[:, 0].max())) + 1, self.W)
        y0 = max(int(np.floor(pix[:, 1].min())), 0)
        y1 = min(int(np.ceil(pix[:, 1].max())) + 1, self.H)
        if x0 >= x1 or y0 >= y1:
            return

        a, b, c = pix
        area = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(area) < 1e-9:
            return
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        w0 = ((b[0] - xs) * (c[1] - ys) - (b[1] - ys) * (c[0] - xs)) / area
        w1 = ((c[0] - xs) * (a[1] - ys) - (c[1] - ys) * (a[0] - xs)) / area
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            return

        # perspective-correct depth via 1/z interpolation
        invz = w0 / z[0] + w1 / z[1] + w2 / z[2]
        zpix = 1.0 / np.maximum(invz, 1e-12)
        zbuf = self.depth[y0:y1, x0:x1]
        win = inside & (zpix < zbuf)
        if not win.any():
            return

        if texture is not None and uv is not None:
            th, tw = texture.shape[:2]
            u = w0 * uv[0, 0] + w1 * uv[1, 0] + w2 * uv[2, 0]
            v = w0 * uv[0, 1] + w1 * uv[1, 1] + w2 * uv[2, 1]
            ti = np.clip((v * (th - 1)).astype(int), 0, th - 1)
            tj = np.clip((u * (tw - 1)).astype(int), 0, tw - 1)
            rgb = texture[ti, tj].astype(np.float64)
        else:
            rgb = np.broadcast_to(np.asarray(color, np.float64),
                                  win.shape + (3,)).copy()

        if shade:
            e0, e1 = tri[1] - tri[0], tri[2] - tri[0]
            n = np.cross(e0, e1)
            n = n / (np.linalg.norm(n) + 1e-12)
            view_dir = self.Rv[2]  # headlight along the view axis
            lam = 0.55 + 0.45 * abs(float(n @ view_dir))
            rgb = rgb * lam

        patch = self.color[y0:y1, x0:x1]
        patch[win] = np.clip(rgb[win], 0, 255).astype(np.uint8)
        self.depth[y0:y1, x0:x1] = np.where(win, zpix, zbuf)

    def blend_overlay(self, image, corner="tr", frac=0.28, border=2):
        """Picture-in-picture blend of ``image`` (the reference blends the
        query photo over the render, render_scene.py:172-192)."""
        import cv2

        h = int(self.H * frac)
        w = int(round(h * image.shape[1] / image.shape[0]))
        small = cv2.resize(image, (w, h))
        y0 = border
        x0 = self.W - w - border if corner.endswith("r") else border
        self.color[y0:y0 + h, x0:x0 + w] = small
        return self


# ------------------------------------------------------------ mesh library --

_FRUSTUM_FACES = [(0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 1)]


def frustum_corners(R_c2w, c, size=0.25, aspect=0.75):
    """Apex + 4 image-plane corners in world coordinates (apex first).
    Corner order: (-w,-h), (w,-h), (w,h), (-w,h) in camera axes."""
    w = size
    h = size * aspect
    z = size * 1.2
    local = np.array(
        [[0, 0, 0], [-w, -h, z], [w, -h, z], [w, h, z], [-w, h, z]], np.float64)
    return local @ np.asarray(R_c2w, np.float64).T + np.asarray(c, np.float64)


def frustum_mesh(R_c2w, c, color, size=0.25, aspect=0.75):
    """Solid frustum side faces: ([4, 3, 3] tris, [4, 3] colors)."""
    p = frustum_corners(R_c2w, c, size, aspect)
    tris = np.stack([p[list(f)] for f in _FRUSTUM_FACES])
    colors = np.tile(np.asarray(color, np.float64), (len(tris), 1))
    return tris, colors


def frustum_image_plane(R_c2w, c, size=0.25, aspect=0.75):
    """Two triangles spanning the frustum's image plane with uv coords —
    carries the query photo like the reference's get_image_box
    (render_util.py:32-105)."""
    p = frustum_corners(R_c2w, c, size, aspect)
    tris = np.stack([p[[1, 2, 3]], p[[1, 3, 4]]])
    # image v runs top->bottom: camera -h (top of image) -> v=0
    uv = np.array([
        [[0, 0], [1, 0], [1, 1]],
        [[0, 0], [1, 1], [0, 1]],
    ], np.float64)
    return tris, uv


def cuboid_from_line(p0, p1, color, thickness=0.01):
    """Axis-aligned-profile box along a segment (reference
    render_util.py:113-145): ([8, 3, 3] tris, colors)."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    d = p1 - p0
    n = np.linalg.norm(d)
    if n < 1e-9:
        return np.zeros((0, 3, 3)), np.zeros((0, 3))
    d = d / n
    helper = np.array([0.0, 1.0, 0.0]) if abs(d[1]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(d, helper)
    u /= np.linalg.norm(u)
    v = np.cross(d, u)
    quad = [u * thickness, v * thickness, -u * thickness, -v * thickness]
    tris = []
    for i in range(4):
        a0 = p0 + quad[i]
        a1 = p0 + quad[(i + 1) % 4]
        b0 = p1 + quad[i]
        b1 = p1 + quad[(i + 1) % 4]
        tris.append([a0, a1, b0])
        tris.append([a1, b1, b0])
    tris = np.asarray(tris)
    return tris, np.tile(np.asarray(color, np.float64), (len(tris), 1))


def position_marker(c, color, extent=0.03):
    """Small octahedron marker (reference render_util.py:148-162)."""
    c = np.asarray(c, np.float64)
    e = extent
    vx = np.array([[e, 0, 0], [-e, 0, 0], [0, e, 0], [0, -e, 0],
                   [0, 0, e], [0, 0, -e]]) + c
    faces = [(0, 2, 4), (2, 1, 4), (1, 3, 4), (3, 0, 4),
             (2, 0, 5), (1, 2, 5), (3, 1, 5), (0, 3, 5)]
    tris = np.stack([vx[list(f)] for f in faces])
    return tris, np.tile(np.asarray(color, np.float64), (len(tris), 1))


def ground_grid(center, span, y, n=12, base=(40, 44, 52), accent=(70, 90, 120)):
    """Checkerboard ground plane (the reference draws a colormapped grid,
    render_util.py:165-227)."""
    xs = np.linspace(center[0] - span, center[0] + span, n + 1)
    zs = np.linspace(center[2] - span, center[2] + span, n + 1)
    tris, cols = [], []
    for i in range(n):
        for j in range(n):
            col = base if (i + j) % 2 == 0 else accent
            a = [xs[i], y, zs[j]]
            b = [xs[i + 1], y, zs[j]]
            c = [xs[i + 1], y, zs[j + 1]]
            d = [xs[i], y, zs[j + 1]]
            tris += [[a, b, c], [a, c, d]]
            cols += [col, col]
    return np.asarray(tris, np.float64), np.asarray(cols, np.float64)


def retro_colormap(frac):
    """Error colormap in the spirit of the reference's get_retro_colors
    (render_scene.py:111-140): cyan-green at 0 -> magenta-red at 1."""
    frac = float(np.clip(frac, 0.0, 1.0))
    lo = np.array([80, 235, 180], np.float64)
    hi = np.array([240, 60, 120], np.float64)
    return lo + (hi - lo) * frac
