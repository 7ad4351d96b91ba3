"""Benchmark pose-file IO and quaternion error metrics (host-side, float64).

Behavioural equivalent of reference benchmark/utils.py:12-182, rebuilt on the
framework's own quaternion library (no transforms3d dependency).
"""

from __future__ import annotations

import logging
import typing
from pathlib import Path

import numpy as np

from mapfree_tpu.geom.quaternion import (
    convert_world2cam_to_cam2world,
    qinverse,
    qmult,
)

VARIANTS_ANGLE_SIN = "sin"
VARIANTS_ANGLE_COS = "cos"


def load_poses(file: typing.IO, load_confidence: bool = False):
    """Load poses from a text file, converting w2c -> c2w.

    Format per line: ``imgpath qw qx qy qz tx ty tz [confidence]``.
    Invalid lines are skipped with a warning (reference: benchmark/utils.py:18-74).
    Returns dict: frame_num -> (q_c2w, t_c2w, confidence).
    """
    expected_parts = 9 if load_confidence else 8

    poses = {}
    for line_number, line in enumerate(file.readlines()):
        parts = tuple(line.strip().split(" "))

        if len(parts) != expected_parts:
            logging.warning(
                f"Invalid number of fields in file {getattr(file, 'name', '?')} line "
                f"{line_number}. Expected {expected_parts}, received {len(parts)}. "
                "Ignoring line."
            )
            continue

        try:
            name = parts[0]
            if "#" in name:
                logging.info(f"Ignoring comment line {line_number}")
                continue
            frame_num = int(name[-9:-4])
        except ValueError:
            logging.warning(
                f"Invalid frame number in line {line_number}. Expected formatting "
                '"seq1/frame_00000.jpg". Ignoring line.'
            )
            continue

        try:
            parts_float = tuple(map(float, parts[1:]))
            if any(np.isnan(v) or np.isinf(v) for v in parts_float):
                raise ValueError()
            qw, qx, qy, qz, tx, ty, tz = parts_float[:7]
            confidence = parts_float[7] if load_confidence else None
        except ValueError:
            logging.warning(f"Error parsing pose in line {line_number}. Ignoring line.")
            continue

        q = np.array((qw, qx, qy, qz), dtype=np.float64)
        t = np.array((tx, ty, tz), dtype=np.float64)

        if np.isclose(np.linalg.norm(q), 0):
            logging.warning(
                f"Error parsing pose in line {line_number}. "
                "Quaternion must have non-zero norm. Ignoring line."
            )
            continue

        q, t = convert_world2cam_to_cam2world(q, t)
        poses[frame_num] = (q, t, confidence)
    return poses


def subsample_poses(poses: dict, subsample: int = 1):
    return {k: v for i, (k, v) in enumerate(poses.items()) if i % subsample == 0}


def load_K(file_path: Path):
    """Load per-frame intrinsics from ``intrinsics.txt``."""
    K = {}
    W = H = None
    with Path(file_path).open("r", encoding="utf-8") as f:
        for line in f.readlines():
            if "#" in line:
                continue
            line = line.strip().split(" ")
            frame_num = int(line[0][-9:-4])
            fx, fy, cx, cy, W, H = map(float, line[1:])
            K[frame_num] = np.array(
                [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], dtype=np.float32
            )
    return K, W, H


def quat_angle_error(label, pred, variant: str = VARIANTS_ANGLE_SIN) -> np.ndarray:
    """Angle between two quaternions, degrees, shape [1, 1].

    'sin' variant: arcsin of the vector-part norm of the residual quaternion —
    numerically precise for small angles (reference: benchmark/utils.py:95-129).
    """
    assert variant in (VARIANTS_ANGLE_SIN, VARIANTS_ANGLE_COS)
    label = np.asarray(label, dtype=np.float64)
    pred = np.asarray(pred, dtype=np.float64)
    if label.ndim == 1:
        label = label[None]
    if pred.ndim == 1:
        pred = pred[None]
    if label.shape != (1, 4) or pred.shape != (1, 4):
        raise RuntimeError(
            f"Unexpected shapes label {label.shape}, pred {pred.shape}; expected (1, 4)"
        )

    q1 = pred / np.linalg.norm(pred, axis=1, keepdims=True)
    q2 = label / np.linalg.norm(label, axis=1, keepdims=True)
    if variant == VARIANTS_ANGLE_COS:
        d = np.abs(np.sum(q1 * q2, axis=1, keepdims=True))
        d = np.clip(d, a_min=-1, a_max=1)
        angle = 2.0 * np.degrees(np.arccos(d))
    else:
        residual = qmult(q1[0], qinverse(q2[0]))
        # 114.59... = 2 * 180 / pi
        angle = np.arcsin(
            np.clip(np.linalg.norm(residual[1:], keepdims=True), -1.0, 1.0)
        ) * (2.0 * 180.0 / np.pi)
        angle = angle[None]
    return angle.astype(np.float64)


def precision_recall(inliers, tp, failures):
    """Confidence-ranked precision/recall sweep with failure-aware recall.

    Matches the leaderboard evaluator exactly (reference: benchmark/utils.py:132-182):
    sort by confidence desc, take thresholds at distinct confidence values,
    recall denominator includes failures, AP = |sum(d_rec * prec)|.
    """
    assert len(inliers) == len(tp), "unequal shapes"

    inliers = np.array(inliers)
    sort_idx = np.argsort(inliers)[::-1]
    inliers = inliers[sort_idx]
    tp = np.array(tp).reshape(-1)[sort_idx]

    distinct_value_indices = np.where(np.diff(inliers))[0]
    threshold_idxs = np.r_[distinct_value_indices, inliers.size - 1]

    N = inliers.shape[0]
    rec = np.arange(N, dtype=np.float32) + 1
    cum_tp = np.cumsum(tp)
    prec = cum_tp[threshold_idxs] / rec[threshold_idxs]
    rec = rec[threshold_idxs] / (float(N) + float(failures))

    last_ind = rec.searchsorted(rec[-1])
    sl = slice(last_ind, None, -1)
    prec = np.r_[prec[sl], 1]
    rec = np.r_[rec[sl], 0]

    average_precision = np.abs(np.sum(np.diff(rec) * np.array(prec)[:-1]))
    return prec, rec, average_precision
