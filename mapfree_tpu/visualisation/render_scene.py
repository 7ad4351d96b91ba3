"""Per-scene render of GT vs estimated camera frustums.

Functional equivalent of reference visualisation/render_scene.py +
render_util.py (pyrender EGL offscreen + ffmpeg), rebuilt on matplotlib 3D +
cv2 VideoWriter (pyrender/ffmpeg are not in the base image): per frame, the
reference frustum, the GT query frustum and the estimated query frustum are
drawn; the estimate is colored by pose error (green -> red), frames below the
confidence threshold are dimmed; the observer camera is smoothed by
LazyCamera; frames are muxed to MP4.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from mapfree_tpu.geom.quaternion import quat2mat
from mapfree_tpu.visualisation.lazy_camera import LazyCamera


def frustum_points(R_c2w, c, scale=0.2, aspect=0.75):
    """5 corner points (apex + 4 image-plane corners) of a camera frustum in
    world coordinates. R_c2w columns are the camera axes."""
    w = scale
    h = scale * aspect
    z = scale * 1.2
    corners_cam = np.array(
        [[0, 0, 0], [-w, -h, z], [w, -h, z], [w, h, z], [-w, h, z]], np.float64
    )
    return corners_cam @ R_c2w.T + c


_FRUSTUM_EDGES = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]


def draw_frustum(ax, R_c2w, c, color, alpha=1.0, scale=0.2, lw=1.5):
    pts = frustum_points(R_c2w, c, scale)
    for i, j in _FRUSTUM_EDGES:
        ax.plot(
            [pts[i, 0], pts[j, 0]],
            [pts[i, 1], pts[j, 1]],
            [pts[i, 2], pts[j, 2]],
            color=color, alpha=alpha, linewidth=lw,
        )


def error_color(t_err_m, r_err_deg, t_thresh=0.25, r_thresh=5.0):
    """Green at zero error -> red at/beyond the acceptance thresholds."""
    frac = max(min(t_err_m / t_thresh, 1.0), min(r_err_deg / r_thresh, 1.0))
    return (frac, 1.0 - frac, 0.1)


def render_scene(scene_gt: dict, scene_est: dict, output_path,
                 confidence_threshold: float = 0.0, fps: int = 5,
                 figsize=(8, 6)):
    """Render one scene's estimates to MP4.

    Args:
        scene_gt: frame_num -> (q_c2w, t_c2w, _) ground truth (benchmark
            loader format).
        scene_est: frame_num -> (q_c2w, t_c2w, confidence) estimates.
        output_path: .mp4 path.
    Returns the number of frames rendered.
    """
    import cv2
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    frames = sorted(scene_gt.keys())
    if not frames:
        return 0

    cam = LazyCamera()
    writer = None
    n_rendered = 0

    # reference camera = identity (MapFree convention: seq0 frame is anchor)
    R_ref = np.eye(3)
    c_ref = np.zeros(3)

    all_centers = np.stack([scene_gt[f][1] for f in frames])
    span = max(np.ptp(all_centers, axis=0).max(), 1.0)
    mid = all_centers.mean(axis=0)

    for frame_num in frames:
        q_gt, t_gt, _ = scene_gt[frame_num]
        R_gt = quat2mat(q_gt)

        fig = plt.figure(figsize=figsize)
        ax = fig.add_subplot(111, projection="3d")
        draw_frustum(ax, R_ref, c_ref, color="tab:blue", scale=0.3, lw=2.0)
        draw_frustum(ax, R_gt, t_gt, color="tab:green")

        if frame_num in scene_est:
            q_est, t_est, conf = scene_est[frame_num]
            R_est = quat2mat(q_est)
            t_err = float(np.linalg.norm(t_est - t_gt))
            cos = np.clip((np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1)
            r_err = float(np.degrees(np.arccos(cos)))
            color = error_color(t_err, r_err)
            alpha = 1.0 if (conf or 0.0) >= confidence_threshold else 0.25
            draw_frustum(ax, R_est, t_est, color=color, alpha=alpha)
            title = f"frame {frame_num}: terr={t_err:.2f}m rerr={r_err:.1f}deg"
        else:
            title = f"frame {frame_num}: no estimate"

        cam.update(t_gt)
        elev, azim = cam.elev_azim()
        ax.view_init(elev=elev, azim=azim)
        ax.set_xlim(mid[0] - span, mid[0] + span)
        ax.set_ylim(mid[1] - span, mid[1] + span)
        ax.set_zlim(mid[2] - span, mid[2] + span)
        ax.set_title(title)

        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        plt.close(fig)

        if writer is None:
            h, w = buf.shape[:2]
            writer = cv2.VideoWriter(
                str(output_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
        writer.write(cv2.cvtColor(buf, cv2.COLOR_RGB2BGR))
        n_rendered += 1

    if writer is not None:
        writer.release()
    return n_rendered
