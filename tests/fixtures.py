"""Synthetic MapFree-format scene generator for integration tests."""

from pathlib import Path

import numpy as np

from mapfree_tpu.geom import quat2mat, qinverse, rotate_vector

try:
    import cv2
except ImportError:
    cv2 = None


def random_unit_quat(rng, max_angle=None):
    """Random unit quaternion; if max_angle (radians) is given, the rotation
    angle is bounded (useful when query cameras must keep the scene visible)."""
    if max_angle is None:
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        return q * np.sign(q[0]) if q[0] != 0 else q
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0, max_angle)
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def make_scene(root: Path, n_queries=10, img_hw=(72, 54), train=False, seed=0,
               depth_suffix=None, max_angle=None, t_scale=0.5):
    """Create a synthetic MapFree scene directory.

    Layout (matches the reference data format):
      seq0/frame_00000.jpg            reference frame
      seq1/frame_00000..N.jpg         query frames
      intrinsics.txt, poses.txt       per-frame K and w2c poses
      overlaps.npz                    only when train=True
      *.<suffix>.png                  16-bit depth in mm when depth_suffix set
    Returns dict frame_name -> (q_w2c, t_w2c).
    """
    rng = np.random.default_rng(seed)
    root = Path(root)
    (root / "seq0").mkdir(parents=True, exist_ok=True)
    (root / "seq1").mkdir(parents=True, exist_ok=True)
    H, W = img_hw

    frames = ["seq0/frame_00000.jpg"] + [
        f"seq1/frame_{i:05}.jpg" for i in range(n_queries)
    ]
    poses = {}
    intr_lines, pose_lines = [], []
    for name in frames:
        img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)
        assert cv2 is not None, "cv2 required for fixture generation"
        cv2.imwrite(str(root / name), img)
        if depth_suffix is not None:
            depth_mm = rng.integers(500, 5000, size=(H, W)).astype(np.uint16)
            cv2.imwrite(
                str(root / name).replace(".jpg", f".{depth_suffix}.png"), depth_mm
            )

        if name.startswith("seq0"):
            q = np.array([1.0, 0, 0, 0])
            t = np.zeros(3)
        else:
            q = random_unit_quat(rng, max_angle=max_angle)
            t = rng.normal(size=3) * t_scale
        poses[name] = (q, t)
        fx = fy = 100.0
        cx, cy = W / 2, H / 2
        intr_lines.append(f"{name} {fx} {fy} {cx} {cy} {W} {H}")
        pose_lines.append(
            f"{name} " + " ".join(f"{v:.9f}" for v in np.concatenate([q, t]))
        )

    (root / "intrinsics.txt").write_text("\n".join(intr_lines) + "\n")
    (root / "poses.txt").write_text("\n".join(pose_lines) + "\n")

    if train:
        # all (seq0 frame, seq1 frame) pairs with random overlaps
        idxs = np.array([(0, 0, 1, i) for i in range(n_queries)], dtype=np.int64)
        overlaps = rng.uniform(0.1, 0.9, size=len(idxs))
        np.savez(root / "overlaps.npz", idxs=idxs, overlaps=overlaps)

    return poses


def make_device_poses(root: Path, poses: dict, noise=0.0, seed=1):
    """Write poses_device.txt (multi-frame track; noisy tracking poses)."""
    rng = np.random.default_rng(seed)
    lines = []
    for name, (q, t) in poses.items():
        qd = q + rng.normal(size=4) * noise
        qd /= np.linalg.norm(qd)
        td = t + rng.normal(size=3) * noise
        lines.append(f"{name} " + " ".join(f"{v:.9f}" for v in np.concatenate([qd, td])))
    (Path(root) / "poses_device.txt").write_text("\n".join(lines) + "\n")


def gt_submission_line(name: str, q, t) -> str:
    """A pose line in submission format (w2c) with confidence."""
    vals = " ".join(f"{v:.6f}" for v in np.concatenate([q, t]))
    return f"{name} {vals} 100.0"
