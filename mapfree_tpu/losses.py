"""Loss registry for relative pose regression.

TPU-native equivalent of reference lib/utils/loss.py:10-240. The reference
uses a decorator that introspects loss-fn argument names and derives ground
truth from a shared mutable data dict (host-side scipy for Euler bins). Here
each loss is a pure traced function ``loss(preds, batch) -> scalar`` where

- ``preds``: {'R': [B,3,3], 't': [B,1,3], plus head aux entries
  ('q', 'scale', 't_direction', 'R_bins', 't_sph_phi', 't_sph_theta')}
- ``batch``: {'T_0to1': [B,4,4], ...}

and all GT derivation (quaternion hemisphere fix, scale/direction GT,
Euler-angle bin targets, spherical-angle bin targets) happens in-graph.
Losses are registered by the same names as the reference so YAML configs work
unchanged.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp
from jax import lax, nn as jnn

from mapfree_tpu.geom.quaternion import mat2quat
from mapfree_tpu.geom.rotation import matrix_to_euler_xyz

LOSSES: Dict[str, Callable] = {}


def register(fn):
    LOSSES[fn.__name__] = fn
    return fn


def get_loss(name: str) -> Callable:
    if name not in LOSSES:
        raise NotImplementedError(f"Invalid loss {name}")
    return LOSSES[name]


def _gt(batch):
    Rgt = batch["T_0to1"][:, :3, :3]
    tgt = jnp.swapaxes(batch["T_0to1"][:, :3, 3:], 1, 2)  # [B, 1, 3]
    return Rgt, tgt


# ---------------------------------------------------------------- rotation --

@register
def rot_frobenius_loss(preds, batch):
    """MSE between residual rotation and identity (reference loss.py:79-92)."""
    Rgt, _ = _gt(batch)
    R = preds["R"]
    eye = jnp.eye(3, dtype=R.dtype)
    residual = jnp.swapaxes(Rgt, 1, 2) @ R
    return jnp.mean((residual - eye) ** 2)


@register
def rot_l1_loss(preds, batch):
    Rgt, _ = _gt(batch)
    R = preds["R"]
    eye = jnp.eye(3, dtype=R.dtype)
    residual = jnp.swapaxes(Rgt, 1, 2) @ R
    return jnp.mean(jnp.abs(residual - eye))


@register
def rot_angle_loss(preds, batch):
    """L1 of residual rotation angle in radians (reference loss.py:111-127)."""
    Rgt, _ = _gt(batch)
    R = preds["R"]
    residual = jnp.swapaxes(R, 1, 2) @ Rgt
    trace = jnp.trace(residual, axis1=-2, axis2=-1)
    cosine = jnp.clip((trace - 1) / 2, -0.99999, 0.99999)
    return jnp.mean(jnp.abs(jnp.arccos(cosine)))


@register
def rot_bin_loss(preds, batch):
    """Cross-entropy over Euler-angle bins (reference loss.py:130-135; GT
    derivation loss.py:45-56, traced instead of host scipy)."""
    Rgt, _ = _gt(batch)
    R_bins = preds["R_bins"]
    angles = matrix_to_euler_xyz(Rgt)  # degrees, extrinsic xyz
    offset = jnp.asarray([180.0, 90.0, 180.0])
    target = jnp.round(angles + offset).astype(jnp.int32)
    tx = jnp.clip(target[:, 0], 0, 359)
    ty = jnp.clip(target[:, 1], 0, 179)
    tz = jnp.clip(target[:, 2], 0, 359)

    def ce(logits, labels):
        logp = jnn.log_softmax(logits, axis=1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    lrx = ce(R_bins[:, :360], tx)
    lry = ce(R_bins[:, 360:540], ty)
    lrz = ce(R_bins[:, 540:], tz)
    return (lrx + lry + lrz) / 3


@register
def quat_l1_loss(preds, batch):
    Rgt, _ = _gt(batch)
    qgt = mat2quat(Rgt)  # already w>=0 hemisphere
    return jnp.mean(jnp.abs(preds["q"] - qgt))


@register
def robust_quat_l1_loss(preds, batch):
    """min(||q+qgt||, ||q-qgt||) averaged (reference loss.py:173-191)."""
    Rgt, _ = _gt(batch)
    qgt = mat2quat(Rgt)
    q = preds["q"]
    return jnp.mean(
        jnp.minimum(
            jnp.linalg.norm(q + qgt, axis=1), jnp.linalg.norm(q - qgt, axis=1)
        )
    )


# ------------------------------------------------------------- translation --

@register
def trans_l2_loss(preds, batch):
    _, tgt = _gt(batch)
    return jnp.mean((preds["t"] - tgt) ** 2)


@register
def trans_l1_loss(preds, batch):
    _, tgt = _gt(batch)
    return jnp.mean(jnp.abs(preds["t"] - tgt))


@register
def trans_ang_loss(preds, batch):
    """L1 of translation angular error, symmetric about pi/2
    (reference loss.py:206-222)."""
    _, tgt = _gt(batch)
    t = preds["t"]
    scale_t = jnp.linalg.norm(t, axis=-1)
    scale_tgt = jnp.linalg.norm(tgt, axis=-1)
    cosine = jnp.sum(t * tgt, axis=-1) / (scale_t * scale_tgt + 1e-6)
    cosine = jnp.clip(cosine, -0.99999, 0.99999)
    ang = jnp.arccos(cosine)
    ang = jnp.minimum(ang, math.pi - ang)
    return jnp.mean(jnp.abs(ang))


@register
def trans_scale_direction_loss(preds, batch):
    """L1 scale + L1 unit-direction (reference loss.py:194-203)."""
    _, tgt = _gt(batch)
    scalegt = jnp.linalg.norm(tgt, axis=-1, keepdims=True)  # [B,1,1]
    dirgt = tgt / jnp.maximum(jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-12)
    return jnp.mean(jnp.abs(preds["scale"] - scalegt)) + jnp.mean(
        jnp.abs(preds["t_direction"] - dirgt)
    )


@register
def trans_scale_l1_loss(preds, batch):
    _, tgt = _gt(batch)
    scalegt = jnp.linalg.norm(tgt, axis=-1, keepdims=True)
    return jnp.mean(jnp.abs(preds["scale"] - scalegt))


@register
def trans_sphbin_loss(preds, batch):
    """Scale L1 + cross-entropy over spherical-angle bins
    (reference loss.py:226-230; GT derivation loss.py:59-71)."""
    _, tgt = _gt(batch)
    scalegt = jnp.linalg.norm(tgt, axis=-1, keepdims=True)
    dirgt = (tgt / jnp.maximum(scalegt, 1e-12)).reshape(-1, 3)

    theta_gt = jnp.arccos(jnp.clip(dirgt[:, 2], -1.0, 1.0))
    phi_gt = jnp.arctan2(dirgt[:, 1], dirgt[:, 0] + 1e-5)
    phi_gt = jnp.where(phi_gt < 0, phi_gt + 2 * math.pi, phi_gt)
    theta_bin = jnp.clip(jnp.round(jnp.rad2deg(theta_gt)).astype(jnp.int32), 0, 179)
    phi_bin = jnp.round(jnp.rad2deg(phi_gt)).astype(jnp.int32)
    phi_bin = jnp.where(phi_bin == 360, 0, phi_bin)

    def ce(logits, labels):
        logp = jnn.log_softmax(logits, axis=1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))

    lscale = jnp.mean(jnp.abs(preds["scale"].reshape(-1) - scalegt.reshape(-1)))
    lphi = ce(preds["t_sph_phi"], phi_bin)
    ltheta = ce(preds["t_sph_theta"], theta_bin)
    return lscale + (lphi + ltheta) / 2


@register
def empty_loss(preds, batch):
    return jnp.zeros((), jnp.float32)


def combined_loss(preds, batch, rot_loss_name, trans_loss_name, lam,
                  s_r=None, s_t=None):
    """Total loss with fixed LAMBDA weighting or Kendall & Cipolla learnable
    weighting when LAMBDA == 0 (reference model.py:75-85)."""
    R_loss = get_loss(rot_loss_name)(preds, batch)
    t_loss = get_loss(trans_loss_name)(preds, batch)
    if lam == 0.0:
        loss = R_loss * jnp.exp(-s_r) + t_loss * jnp.exp(-s_t) + s_r + s_t
        loss = loss.reshape(())
    else:
        loss = R_loss + lam * t_loss
    return R_loss, t_loss, loss
