"""Composed relative-pose regression network.

TPU-native equivalent of reference lib/models/regression/model.py:14-73 /
236-248: shared-weight two-view encoder -> correlation aggregator -> pose head.
The reference's ``eval()`` string dispatch becomes explicit registries; the
Lightning training machinery lives in :mod:`mapfree_tpu.train` instead.

The network is a pure flax module: ``apply`` returns (R, t, aux); auxiliary
predictions feed the loss registry. The Kendall learnable loss weights (s_r,
s_t, used when TRAINING.LAMBDA == 0 — reference model.py:56-59) are parameters
of this module so they ride the same optimizer/checkpoint path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mapfree_tpu.models.aggregators import build_aggregator
from mapfree_tpu.models.encoders import build_encoder
from mapfree_tpu.models.heads import build_head


class RegressionNet(nn.Module):
    encoder: nn.Module
    aggregator: nn.Module
    head: nn.Module
    multi_frame: bool = False
    learnable_loss_weights: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image0, image1, train: bool = False, ref_idx=None):
        """image0: [B, H, W, 3]; image1: [B, H, W, 3] (single-frame) or
        [B, F, H, W, 3] (multi-frame; only the final query frame is encoded,
        matching reference model.py:240-241).

        With ``ref_idx`` [B] int32, image0 is instead [U, H, W, 3] of UNIQUE
        reference frames and each pair's ref features are gathered after the
        encoder — an eval batch shares 1-2 refs across 32 pairs, so the
        encoder (85% of the forward) runs on U+B images instead of 2B (the
        reference re-encodes the ref per pair, submission.py:33-58)."""
        if self.multi_frame:
            image1 = image1[:, -1]

        # images may arrive as raw uint8 NHWC (4x cheaper host->device
        # transfer) or as planar YUV420 uint8 [B, H*3/2, W] (8x cheaper;
        # rank-3 by construction) — normalise/unpack on device
        def to_float(img):
            if img.ndim == 3:
                from mapfree_tpu.ops.image import yuv420_to_rgb

                return yuv420_to_rgb(img, self.compute_dtype)
            scale = 1.0 / 255.0 if img.dtype == jnp.uint8 else 1.0
            return img.astype(self.compute_dtype) * scale

        image0 = to_float(image0)
        image1 = to_float(image1)

        # shared-weight two-view encoding in one batched dispatch: stacking
        # the views doubles the conv batch (better MXU utilisation) instead of
        # running the encoder twice.
        U = image0.shape[0]
        stacked = jnp.concatenate([image0, image1], axis=0)
        vols = self.encoder(stacked, train)
        vol0, vol1 = vols[:U], vols[U:]
        if ref_idx is not None:
            vol0 = vol0[ref_idx]

        global_volume = self.aggregator(vol0, vol1, train)
        R, t, aux = self.head(global_volume, train)

        if self.learnable_loss_weights:
            aux["s_r"] = self.param("s_r", nn.initializers.zeros, (1,))
            aux["s_t"] = self.param("s_t", nn.initializers.zeros, (1,))
        return R.astype(jnp.float32), t.astype(jnp.float32), aux


def fuse_frame_poses(R_f, t_f, q_device, t_device, weights):
    """Chain per-frame relative-pose estimates through the device tracking
    and fuse them in the LAST frame's coordinates.

    Args:
        R_f, t_f: [B, F, 3, 3] / [B, F, 3] predicted T_ref->f (w2c).
        q_device, t_device: [B, F, 4] / [B, F, 3] per-frame device-tracking
            poses, world-to-camera.
        weights: [B, F] convex frame weights.
    Returns:
        (R [B,3,3], t [B,3]) fused T_ref->last, plus the per-frame chained
        estimates (R_est [B,F,3,3], t_est [B,F,3]).

    If every per-frame prediction is exact and the device tracking is exact,
    every chained estimate equals T_ref->last and the fusion returns it
    exactly (for any weights) — the estimator is consistent by construction.
    """
    from mapfree_tpu.geom.quaternion import mat2quat, quat2mat

    # T_f->last = T_last o T_f^-1 (w2c convention)
    R_dev = quat2mat(q_device.astype(jnp.float32))  # [B, F, 3, 3]
    R_last = R_dev[:, -1:]
    t_dev = t_device.astype(jnp.float32)
    t_last = t_dev[:, -1:]
    R_rel = R_last @ jnp.swapaxes(R_dev, -1, -2)  # [B, F, 3, 3]
    t_rel = t_last - jnp.einsum("bfij,bfj->bfi", R_rel, t_dev)

    R_est = R_rel @ R_f.astype(jnp.float32)  # estimates of T_ref->last
    t_est = jnp.einsum("bfij,bfj->bfi", R_rel, t_f.astype(jnp.float32)) + t_rel

    # weighted chordal-L2 rotation mean + weighted translation mean
    q_est = mat2quat(R_est)  # [B, F, 4]
    M = jnp.einsum("bf,bfi,bfj->bij", weights, q_est, q_est)
    _, eigvecs = jnp.linalg.eigh(M)
    q_fused = eigvecs[..., -1]  # [B, 4]
    q_fused = q_fused * jnp.sign(q_fused[..., :1] + 1e-12)
    R = quat2mat(q_fused)
    t = jnp.einsum("bf,bfi->bi", weights, t_est)
    return R, t, R_est, t_est


class RegressionMultiFrameFusionNet(nn.Module):
    """TRUE multi-frame fusion — the capability the reference leaves on the
    table (its MultiFrame model encodes only the last query frame,
    reference model.py:240-241; SURVEY.md §5 flags the 9-frame batched
    encode as the TPU opportunity).

    Design (one SPMD dispatch, everything batched over B*F):
    1. encode the reference frame and ALL F query frames in one conv batch;
    2. run the correlation aggregator + pose head per query frame by folding
       F into the batch axis -> per-frame relative pose T_ref->f;
    3. chain each estimate through the device-tracking relative pose
       T_f->last (from poses_device.txt, w2c) to express every frame's
       evidence in the LAST frame's coordinates;
    4. fuse: softmax-weighted chordal-L2 rotation mean (top eigenvector of
       the weighted quaternion outer-product sum) + weighted translation
       mean, with per-frame weights predicted from the pooled global volume.

    With exact per-frame predictions the fusion is exact (the chained
    transforms agree), so the model can only gain from the extra frames.
    """

    encoder: nn.Module
    aggregator: nn.Module
    head: nn.Module
    learnable_loss_weights: bool = False
    compute_dtype: Any = jnp.float32

    needs_device_poses = True

    @nn.compact
    def __call__(self, image0, image1, train: bool = False,
                 q_device=None, t_device=None):
        """image0: [B, H, W, 3]; image1: [B, F, H, W, 3];
        q_device/t_device: [B, F, 4] / [B, F, 3] per-frame device-tracking
        poses, world-to-camera (batch keys abs_q_1_w2c_device /
        abs_c_1_c2w_device)."""
        assert q_device is not None and t_device is not None, (
            "fusion model needs device-tracking poses"
        )
        B, F = image1.shape[:2]
        scale = 1.0 / 255.0 if image0.dtype == jnp.uint8 else 1.0
        image0 = image0.astype(self.compute_dtype) * scale
        image1 = image1.astype(self.compute_dtype) * scale

        # one conv dispatch for all B * (F + 1) frames
        stacked = jnp.concatenate(
            [image0, image1.reshape((B * F,) + image1.shape[2:])], axis=0
        )
        vols = self.encoder(stacked, train)
        vol0 = vols[:B]
        vols1 = vols[B:]  # [B*F, h, w, C]

        # per-frame aggregation/head by folding F into the batch
        vol0_rep = jnp.repeat(vol0, F, axis=0)
        gv = self.aggregator(vol0_rep, vols1, train)  # [B*F, h', w', C']
        R_f, t_f, aux = self.head(gv, train)
        R_f = R_f.astype(jnp.float32).reshape(B, F, 3, 3)
        t_f = t_f.astype(jnp.float32).reshape(B, F, 3)

        # frame confidence from the pooled global volume
        pooled = jnp.mean(gv.astype(self.compute_dtype), axis=(1, 2))  # [B*F, C']
        logits = nn.Dense(1, dtype=jnp.float32, name="frame_weight")(
            pooled.astype(jnp.float32)
        ).reshape(B, F)
        w = jax.nn.softmax(logits, axis=-1)  # [B, F]

        R, t, R_est, t_est = fuse_frame_poses(R_f, t_f, q_device, t_device, w)
        t = t.reshape(B, 1, 3)

        aux = dict(aux)
        aux["per_frame_R"] = R_est
        aux["per_frame_t"] = t_est
        aux["frame_weights"] = w
        if self.learnable_loss_weights:
            aux["s_r"] = self.param("s_r", nn.initializers.zeros, (1,))
            aux["s_t"] = self.param("s_t", nn.initializers.zeros, (1,))
        return R, t, aux


def build_regression_net(cfg) -> RegressionNet:
    compute_dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    encoder = build_encoder(cfg.ENCODER, dtype=compute_dtype,
                            remat=bool(cfg.TPU.REMAT))
    aggregator = build_aggregator(cfg.AGGREGATOR, dtype=compute_dtype,
                                  fused=bool(cfg.TPU.FUSED_CORRELATION))
    head = build_head(cfg, dtype=compute_dtype)
    if cfg.MODEL == "RegressionMultiFrameFusion":
        return RegressionMultiFrameFusionNet(
            encoder=encoder,
            aggregator=aggregator,
            head=head,
            learnable_loss_weights=(cfg.TRAINING.LAMBDA == 0.0),
            compute_dtype=compute_dtype,
        )
    return RegressionNet(
        encoder=encoder,
        aggregator=aggregator,
        head=head,
        multi_frame=(cfg.MODEL == "RegressionMultiFrame"),
        learnable_loss_weights=(cfg.TRAINING.LAMBDA == 0.0),
        compute_dtype=compute_dtype,
    )
