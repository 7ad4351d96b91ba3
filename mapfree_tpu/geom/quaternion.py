"""Quaternion algebra, backend-agnostic (numpy or jax.numpy).

Replaces the reference's dependency on ``transforms3d.quaternions``
(reference: lib/utils/rotationutils.py:2, benchmark/utils.py:6,
lib/datasets/mapfree.py:10). All functions use only indexing/arithmetic and a
tiny ``stack`` dispatch so the same code runs in float64 numpy on host (metric
parity) and traced jnp on TPU.

Convention: quaternions are (w, x, y, z), scalar first, matching the reference
and the MapFree pose-file format.
"""

from __future__ import annotations

import numpy as np


def _xp(*arrays):
    """Return jnp if any input is a jax array, else numpy."""
    for a in arrays:
        if type(a).__module__.startswith("jax"):
            import jax.numpy as jnp

            return jnp
    return np


def qinverse(q):
    """Inverse of unit quaternion(s) ``[..., 4]`` (conjugate / squared norm)."""
    xp = _xp(q)
    conj = q * xp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / xp.sum(q * q, axis=-1, keepdims=True)


def qconjugate(q):
    xp = _xp(q)
    return q * xp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmult(q1, q2):
    """Hamilton product of quaternions ``[..., 4] x [..., 4] -> [..., 4]``."""
    xp = _xp(q1, q2)
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return xp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotate_vector(v, q):
    """Rotate vector(s) ``[..., 3]`` by quaternion(s) ``[..., 4]``.

    v' = v + 2 * r x (s*v + r x v) / m   where q = (s, r), m = |q|^2
    """
    xp = _xp(v, q)
    s = q[..., :1]
    r = q[..., 1:]
    m = xp.sum(q * q, axis=-1, keepdims=True)
    cross1 = xp.cross(r, v)
    cross2 = xp.cross(r, s * v + cross1)
    return v + 2.0 * cross2 / m


def quat2mat(q):
    """Unit-normalised quaternion(s) ``[..., 4]`` -> rotation matrix ``[..., 3, 3]``."""
    xp = _xp(q)
    q = q / xp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = xp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1
    )
    row1 = xp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1
    )
    row2 = xp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return xp.stack([row0, row1, row2], axis=-2)


def mat2quat(R):
    """Rotation matrix ``[..., 3, 3]`` -> quaternion ``[..., 4]`` (w >= 0 branch-safe).

    Branch-free variant (safe under jit/vmap): computes all four Shepperd
    candidates and picks the numerically largest pivot.
    """
    xp = _xp(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate squared pivots (4*w^2, 4*x^2, 4*y^2, 4*z^2) offsets
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(v):
        return xp.sqrt(xp.maximum(v, 1e-24))

    # candidate w: pivot on w
    sw = _safe_sqrt(qw2) * 2.0
    cand_w = xp.stack(
        [0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1
    )
    sx = _safe_sqrt(qx2) * 2.0
    cand_x = xp.stack(
        [(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1
    )
    sy = _safe_sqrt(qy2) * 2.0
    cand_y = xp.stack(
        [(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy], axis=-1
    )
    sz = _safe_sqrt(qz2) * 2.0
    cand_z = xp.stack(
        [(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz], axis=-1
    )

    pivots = xp.stack([qw2, qx2, qy2, qz2], axis=-1)  # [..., 4]
    choice = xp.argmax(pivots, axis=-1)  # [...]
    cands = xp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4cand, 4]
    q = xp.take_along_axis(cands, choice[..., None, None], axis=-2)[..., 0, :]
    # canonical hemisphere: w >= 0
    sign = xp.where(q[..., :1] < 0, -1.0, 1.0)
    q = q * sign
    return q / xp.linalg.norm(q, axis=-1, keepdims=True)


def axangle2quat(vector, theta, is_normalized=False):
    """Axis-angle (3-vector, scalar angle) -> quaternion [4]."""
    xp = _xp(vector)
    vector = xp.asarray(vector)
    if not is_normalized:
        vector = vector / xp.linalg.norm(vector, axis=-1, keepdims=True)
    half = theta / 2.0
    return xp.concatenate(
        [xp.atleast_1d(xp.cos(half)), vector * xp.sin(half)], axis=-1
    )


def euler2quat(ai, aj, ak):
    """Intrinsic sxyz Euler angles -> quaternion (matches transforms3d.euler.euler2quat)."""
    ai, aj, ak = ai / 2.0, aj / 2.0, ak / 2.0
    ci, si = np.cos(ai), np.sin(ai)
    cj, sj = np.cos(aj), np.sin(aj)
    ck, sk = np.cos(ak), np.sin(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    return np.array(
        [
            cj * cc + sj * ss,
            cj * sc - sj * cs,
            cj * ss + sj * cc,
            cj * cs - sj * sc,
        ]
    )


def relative_pose_wxyz(q1_wxyz, t1, q2_wxyz, t2):
    """Relative pose composition (reference: lib/utils/rotationutils.py:58-61).

    Given world-to-camera poses (q1, t1) and (q2, t2), returns (q12, t12) such
    that X_c2 = R(q12) X_c1 + t12.
    """
    q12 = qmult(q2_wxyz, qinverse(q1_wxyz))
    t12 = t2 - rotate_vector(t1, q12)
    return q12, t12


def convert_world2cam_to_cam2world(q, t):
    """(reference: benchmark/utils.py:12-15)"""
    qinv = qinverse(q)
    tinv = -rotate_vector(t, qinv)
    return qinv, tinv
