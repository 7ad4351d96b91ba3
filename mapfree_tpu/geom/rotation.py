"""Rotation representations: 6D-ortho, axis-angle (Rodrigues), Euler.

TPU-native replacements for the reference's torch/scipy rotation code:
- ``rotation_matrix_from_ortho6d`` (reference: lib/utils/rotationutils.py:34-55,
  which hard-codes a CUDA tensor in its normalize — here it is pure jnp)
- ``cv.Rodrigues`` (reference: lib/models/matching/pose_solver.py:228)
- ``scipy.spatial.transform.Rotation`` Euler conversions used by the
  angular-bins head (reference: lib/models/regression/head.py:302-305) and the
  bin-loss GT derivation (reference: lib/utils/loss.py:47-56).

Everything is batched and traceable (jit/vmap-safe; no data-dependent branches).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_matrix_from_ortho6d(poses):
    """6D continuous rotation representation -> R.

    Args:
        poses: [B, 6] — first 3 raw x-axis, last 3 raw y-axis.
    Returns:
        R: [B, 3, 3] with columns (x, y, z).
    """
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    x = x_raw / jnp.maximum(jnp.linalg.norm(x_raw, axis=-1, keepdims=True), 1e-8)
    z = jnp.cross(x, y_raw)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def rodrigues(rvec):
    """Axis-angle vector(s) [..., 3] -> rotation matrix [..., 3, 3].

    Small-angle-safe via a first-order guard on sin(theta)/theta.
    """
    theta = jnp.linalg.norm(rvec, axis=-1, keepdims=True)  # [..., 1]
    safe_theta = jnp.maximum(theta, 1e-12)
    k = rvec / safe_theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zero = jnp.zeros_like(kx)
    K = jnp.stack(
        [
            jnp.stack([zero, -kz, ky], axis=-1),
            jnp.stack([kz, zero, -kx], axis=-1),
            jnp.stack([-ky, kx, zero], axis=-1),
        ],
        axis=-2,
    )
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    R = eye + jnp.sin(th) * K + (1.0 - jnp.cos(th)) * (K @ K)
    # identity for near-zero angle
    return jnp.where(th > 1e-12, R, eye)


def inv_rodrigues(R):
    """Rotation matrix [..., 3, 3] -> axis-angle vector [..., 3]."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee of antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    scale = jnp.where(
        sin_theta[..., None] > 1e-7,
        theta[..., None] / jnp.maximum(2.0 * sin_theta[..., None], 1e-12),
        0.5,  # small-angle limit theta/(2 sin theta) -> 1/2
    )
    return v * scale


def euler_xyz_to_matrix(angles_deg):
    """Extrinsic xyz Euler angles (degrees) [..., 3] -> R [..., 3, 3].

    Matches scipy ``Rotation.from_euler('xyz', a, degrees=True)`` — lowercase
    'xyz' in scipy is EXTRINSIC, i.e. R = Rz(c) @ Ry(b) @ Rx(a).
    """
    a = jnp.deg2rad(angles_deg)
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    Rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cx, -sx], -1),
            jnp.stack([zero, sx, cx], -1),
        ],
        -2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cy, zero, sy], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sy, zero, cy], -1),
        ],
        -2,
    )
    Rz = jnp.stack(
        [
            jnp.stack([cz, -sz, zero], -1),
            jnp.stack([sz, cz, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    # extrinsic x-y-z: apply Rx first in the world frame -> R = Rz @ Ry @ Rx
    return Rz @ Ry @ Rx


def matrix_to_euler_xyz(R):
    """R [..., 3, 3] -> extrinsic xyz Euler angles in degrees [..., 3].

    Inverse of :func:`euler_xyz_to_matrix` (R = Rz @ Ry @ Rx):
        R[2,0] = -sin(ay)
        R[2,1]/R[2,2] = tan(ax) terms, R[1,0]/R[0,0] = tan(az) terms.
    Gimbal lock handled by falling back to az = 0.
    """
    sy = -R[..., 2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    ay = jnp.arcsin(sy)
    cy = jnp.cos(ay)
    safe = jnp.abs(cy) > 1e-6
    ax = jnp.where(
        safe,
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
    )
    az = jnp.where(safe, jnp.arctan2(R[..., 1, 0], R[..., 0, 0]), 0.0)
    return jnp.rad2deg(jnp.stack([ax, ay, az], axis=-1))
