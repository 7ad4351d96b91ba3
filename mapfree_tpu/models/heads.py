"""Pose regression heads (flax.linen).

TPU-native equivalents of reference lib/models/regression/head.py:10-323.
Every head maps the aggregated feature volume [B, H, W, C] to a relative pose
(R [B, 3, 3], t [B, 1, 3]) plus an ``aux`` dict of intermediate predictions
consumed by specific losses (quaternion, scale, direction, rotation bins).

Differences from the reference, by design:
- heads are pure functions: no NaN hard-exits inside the graph (the training
  loop checks for non-finite losses host-side instead,
  cf. reference head.py:90-102);
- the angular-bins argmax decode is traced jnp (stop-gradient) instead of a
  host scipy round-trip (reference head.py:295-305).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from mapfree_tpu.geom.procrustes import procrustes
from mapfree_tpu.geom.rotation import euler_xyz_to_matrix, rotation_matrix_from_ortho6d
from mapfree_tpu.models.blocks import PreActBlock


class _ShallowTrunk(nn.Module):
    """2 stride-2 res-blocks + ravel (reference head.py:10-24 ResBlockMLP)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = PreActBlock(256, stride=2, dtype=self.dtype, name="resblock1")(x, train)
        x = PreActBlock(128, stride=2, dtype=self.dtype, name="resblock2")(x, train)
        # ravel in the reference's NCHW order so converted torch Dense
        # weights apply without a row permutation (reference head.py:22-24)
        return jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)


class _DeepTrunk(nn.Module):
    """4 stride-2 res-blocks, optional global avg-pool, ravel
    (reference head.py:27-50 DeepResBlock)."""

    batch_norm: bool = True
    avg_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = PreActBlock(64, stride=2, bn=self.batch_norm, dtype=self.dtype,
                        name="resblock1")(x, train)
        x = PreActBlock(128, stride=2, bn=self.batch_norm, dtype=self.dtype,
                        name="resblock2")(x, train)
        x = PreActBlock(256, stride=2, bn=self.batch_norm, dtype=self.dtype,
                        name="resblock3")(x, train)
        x = PreActBlock(512, stride=2, bn=self.batch_norm, dtype=self.dtype,
                        name="resblock4")(x, train)
        if self.avg_pool:
            x = x.mean(axis=(1, 2), keepdims=True)
        # NCHW-order ravel: see _ShallowTrunk (reference head.py:44-50)
        return jnp.transpose(x, (0, 3, 1, 2)).reshape(B, -1)


class _DeepMLP(nn.Module):
    """Dense(256)-ReLU-Dense(128)-ReLU-Dense(out) (reference head.py:115-122)."""

    out_dims: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(256, name="fc1")(x.astype(jnp.float32)))
        x = nn.relu(nn.Dense(128, name="fc2")(x))
        return nn.Dense(self.out_dims, name="fc3")(x)


def _procrustes_from_anchors(xyz, num_pts: int, add_basis: bool):
    """Anchors -> correspondences -> differentiable Kabsch
    (reference head.py:64-103)."""
    B = xyz.shape[0]
    basis = jnp.broadcast_to(jnp.eye(3, dtype=xyz.dtype), (B, 3, 3))
    if num_pts == 3:
        cor0 = basis
        cor1 = xyz
    else:
        cor0 = xyz[:, : num_pts // 2]
        cor1 = xyz[:, num_pts // 2:]
    if add_basis:
        if num_pts == 6:
            cor0 = cor0 + basis
        if num_pts in (3, 6):
            cor1 = cor1 + basis
    return procrustes(cor0, cor1)


class ProcrustesHead(nn.Module):
    """Regress 3D anchor correspondences, recover pose by Kabsch
    (reference head.py:53-163, both shallow and deep variants)."""

    num_pts: int = 6
    add_basis: bool = False
    deep: bool = True
    batch_norm: bool = True
    avg_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_volume, train: bool = False):
        B = feature_volume.shape[0]
        assert self.num_pts == 3 or (self.num_pts % 2 == 0 and self.num_pts >= 6), (
            "num_pts must be 3, 6 or an even number >= 6"
        )
        if self.deep:
            x = _DeepTrunk(self.batch_norm, self.avg_pool, self.dtype, name="trunk")(
                feature_volume, train
            )
            out = _DeepMLP(3 * self.num_pts, name="mlp")(x)
        else:
            x = _ShallowTrunk(self.dtype, name="trunk")(feature_volume, train)
            out = nn.Dense(3 * self.num_pts, name="mlp")(x.astype(jnp.float32))
        xyz = out.reshape(B, -1, 3)
        R, t = _procrustes_from_anchors(xyz, self.num_pts, self.add_basis)
        return R, t, {"anchors": xyz}


class QuatHead(nn.Module):
    """Quaternion + (unit direction, scale) or scaled translation
    (reference head.py:166-213 QuatDeepResBlock)."""

    separate_scale: bool = True
    batch_norm: bool = True
    avg_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_volume, train: bool = False):
        B = feature_volume.shape[0]
        x = _DeepTrunk(self.batch_norm, self.avg_pool, self.dtype, name="trunk")(
            feature_volume, train
        )
        out_dims = 8 if self.separate_scale else 7
        out = _DeepMLP(out_dims, name="mlp")(x)

        quat = out[:, :4]
        quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=1, keepdims=True), 1e-12)
        R = _quat_to_mat(quat)

        aux = {"q": quat}
        if self.separate_scale:
            scale = jnp.abs(out[:, 4]).reshape(B, 1, 1)
            direction = out[:, 5:]
            direction = direction / jnp.maximum(
                jnp.linalg.norm(direction, axis=1, keepdims=True), 1e-12
            )
            direction = direction.reshape(B, 1, 3)
            t = scale * direction
            aux["t_direction"] = direction
            aux["scale"] = scale
        else:
            t = out[:, 4:].reshape(B, 1, 3)
        return R, t, aux


class DirectHead(nn.Module):
    """6D-ortho rotation + translation (reference head.py:216-266)."""

    deep: bool = True
    batch_norm: bool = True
    avg_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_volume, train: bool = False):
        B = feature_volume.shape[0]
        if self.deep:
            x = _DeepTrunk(self.batch_norm, self.avg_pool, self.dtype, name="trunk")(
                feature_volume, train
            )
            out = _DeepMLP(9, name="mlp")(x)
        else:
            x = _ShallowTrunk(self.dtype, name="trunk")(feature_volume, train)
            out = nn.Dense(9, name="mlp")(x.astype(jnp.float32))
        R = rotation_matrix_from_ortho6d(out[:, :6])
        t = out[:, 6:].reshape(B, 1, 3)
        return R, t, {}


class AngularBinsHead(nn.Module):
    """Rotation as 360/180/360 Euler-angle bins; translation either direct or
    as spherical-angle bins + scale (reference head.py:269-323)."""

    separate_scale: bool = True
    batch_norm: bool = True
    avg_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_volume, train: bool = False):
        B = feature_volume.shape[0]
        x = _DeepTrunk(self.batch_norm, self.avg_pool, self.dtype, name="trunk")(
            feature_volume, train
        )
        out_dims = 360 * 2 + 180 + (360 + 180 + 1 if self.separate_scale else 3)
        out = nn.Dense(out_dims, name="mlp")(x.astype(jnp.float32))

        R_bins = out[:, :900]
        aux = {"R_bins": R_bins}
        # argmax decode (no gradient path, as in the reference's no_grad block)
        bins_ng = lax.stop_gradient(R_bins)
        angle_x = jnp.argmax(bins_ng[:, :360], axis=1) - 180
        angle_y = jnp.argmax(bins_ng[:, 360:540], axis=1) - 90
        angle_z = jnp.argmax(bins_ng[:, 540:], axis=1) - 180
        angles = jnp.stack([angle_x, angle_y, angle_z], axis=1).astype(jnp.float32)
        R = euler_xyz_to_matrix(angles)

        if self.separate_scale:
            t_sph_phi = out[:, 900:1260]
            t_sph_theta = out[:, 1260:1440]
            scale = jnp.abs(out[:, -1:])
            aux["t_sph_phi"] = t_sph_phi
            aux["t_sph_theta"] = t_sph_theta
            aux["scale"] = scale.reshape(B, 1, 1)
            phi = jnp.deg2rad(
                jnp.argmax(lax.stop_gradient(t_sph_phi), axis=1).astype(jnp.float32)
            )
            theta = jnp.deg2rad(
                jnp.argmax(lax.stop_gradient(t_sph_theta), axis=1).astype(jnp.float32)
            )
            t = scale * jnp.stack(
                [jnp.cos(phi) * jnp.sin(theta), jnp.sin(phi) * jnp.sin(theta),
                 jnp.cos(theta)],
                axis=1,
            )
        else:
            t = out[:, 900:]
        return R, t.reshape(B, 1, 3), aux


def _quat_to_mat(q):
    """Unit quaternion [B, 4] (w, x, y, z) -> R [B, 3, 3] (traced jnp)."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_head(cfg, dtype=jnp.float32) -> nn.Module:
    """String-dispatch on cfg.HEAD.TYPE, preserving the reference head names."""
    h = cfg.HEAD
    common = dict(batch_norm=bool(h.BATCH_NORM), avg_pool=bool(h.AVG_POOL), dtype=dtype)
    t = h.TYPE
    if t == "ProcrustesResBlockMLP":
        return ProcrustesHead(num_pts=h.NUM_PTS, add_basis=bool(h.ADD_BASIS),
                              deep=False, **common, name="head")
    if t == "ProcrustesDeepResBlock":
        return ProcrustesHead(num_pts=h.NUM_PTS, add_basis=bool(h.ADD_BASIS),
                              deep=True, **common, name="head")
    if t == "QuatDeepResBlock":
        return QuatHead(separate_scale=bool(h.SEPARATE_SCALE), **common, name="head")
    if t == "DirectResBlockMLP":
        return DirectHead(deep=False, **common, name="head")
    if t == "DirectDeepResBlockMLP":
        return DirectHead(deep=True, **common, name="head")
    if t == "AngularBinsDeepResBlockMLP":
        return AngularBinsHead(separate_scale=bool(h.SEPARATE_SCALE), **common,
                               name="head")
    raise NotImplementedError(f"Invalid head {t}")
