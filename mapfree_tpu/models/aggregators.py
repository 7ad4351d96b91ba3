"""Feature aggregators: correlation-volume warping (the paper's core op).

TPU-native re-design of reference lib/models/regression/aggregator.py:6-200.
The dense [B, HW, HW] correlation volume is computed as a single einsum that
XLA tiles onto the MXU with float32 accumulation; softmax + soft-warp +
positional moments are fused elementwise/matmul ops — no Python loops, no
materialised transposes.

Layout: feature volumes are NHWC [B, H, W, C]; flattened position index is
i = h * W + w (row-major), matching the reference's view(B, D, H*W).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from mapfree_tpu.models.blocks import PreActBlock


def _flatten(vol):
    B, H, W, C = vol.shape
    return vol.reshape(B, H * W, C)


def _uv_grid(H, W, dtype):
    """[HW, 2] grid of (u, v) coords in [-1, 1]; u indexes H, v indexes W
    (matches reference aggregator.py:81-84 meshgrid ordering)."""
    u = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
    v = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
    uu = jnp.repeat(u, W)
    vv = jnp.tile(v, H)
    return jnp.stack([uu, vv], axis=-1)


class CorrelationVolumeWarping(nn.Module):
    """Soft cross-view warping via a dense correlation volume.

    For each position i in view0, softmax over all positions j of view1 gives
    a matching distribution; view1 features are soft-warped into view0's frame
    and concatenated with view0 features plus optional channels:
    soft-argmax warp position (2), uniform grid (2), max score (1),
    compressed correlation volume, upsampled positional encoding.
    (reference: aggregator.py:42-116)
    """

    position_encoder: bool = False
    position_encoder_im1: bool = False
    max_score_channel: bool = False
    normalise_dot: bool = False
    cv_outlayers: int = 0
    cv_half_channels: bool = False
    upsample_pos_enc: int = 0
    dustbin: bool = False
    fused: bool = True  # use the Pallas fused kernel on TPU when applicable
    dtype: Any = jnp.float32

    def _can_fuse(self) -> bool:
        """The fused kernel covers every variant except the dustbin softmax
        structure and the compressed-CV channels (which need the full
        correlation volume)."""
        from mapfree_tpu.ops.correlation import fused_path_available

        return (
            self.fused
            and not self.dustbin
            and self.cv_outlayers == 0
            and fused_path_available()
        )

    @nn.compact
    def __call__(self, vol0, vol1, train: bool = False):
        assert vol0.shape == vol1.shape, "Feature volumes shape must match"
        B, H, W, C = vol0.shape
        HW = H * W
        f0 = _flatten(vol0)
        f1 = _flatten(vol1)

        if self.normalise_dot:
            f0 = f0 / jnp.maximum(jnp.linalg.norm(f0, axis=-1, keepdims=True), 1e-12)
            f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-12)

        if self._can_fuse():
            from mapfree_tpu.ops.correlation import fused_correlation_warp

            q = f0[..., : C // 2] if self.cv_half_channels else f0
            k = f1[..., : C // 2] if self.cv_half_channels else f1
            grid = _uv_grid(H, W, jnp.float32)
            warped1, pos_enc, max_score = fused_correlation_warp(q, k, f1, grid)

            parts = [f0.astype(jnp.float32), warped1]
            if self.position_encoder:
                parts.append(pos_enc)
                if self.position_encoder_im1:
                    parts.append(jnp.broadcast_to(grid[None], (B, HW, 2)))
                if self.upsample_pos_enc > 0:
                    feats = (
                        jnp.concatenate(
                            [pos_enc, jnp.broadcast_to(grid[None], (B, HW, 2))],
                            axis=-1,
                        )
                        if self.position_encoder_im1
                        else pos_enc
                    )
                    feats = feats.reshape(B, H, W, -1).astype(self.dtype)
                    feats = PreActBlock(
                        self.upsample_pos_enc, dtype=self.dtype,
                        name="pos_encoder_block",
                    )(feats, train)
                    parts.append(feats.reshape(B, HW, -1).astype(jnp.float32))
            if self.max_score_channel:
                parts.append(max_score)
            agg = jnp.concatenate(parts, axis=-1)
            return agg.reshape(B, H, W, -1).astype(self.dtype)

        if self.cv_half_channels:
            corr = jnp.einsum(
                "bic,bjc->bij", f0[..., : C // 2], f1[..., : C // 2],
                preferred_element_type=jnp.float32,
            )
        else:
            corr = jnp.einsum(
                "bic,bjc->bij", f0, f1, preferred_element_type=jnp.float32
            )

        if self.dustbin:
            bin_score = self.param(
                "bin_score", lambda key: 100.0 * jnp.ones((1, 1, 1), jnp.float32)
            )
            # learned bin row/col appended to the correlation volume
            col = jnp.broadcast_to(bin_score, (B, HW, 1))
            row = jnp.broadcast_to(bin_score, (B, 1, HW + 1))
            corr = jnp.concatenate([corr, col], axis=2)
            corr = jnp.concatenate([corr, row], axis=1)
            # non-learned dustbin feature (zeros) appended to view1 features
            f1_ext = jnp.concatenate([f1, jnp.zeros((B, 1, C), f1.dtype)], axis=1)
        else:
            f1_ext = f1

        cvol = jnp.nan_to_num(corr)
        cvol = nn.softmax(cvol, axis=2)  # rows: distribution over view1 positions

        warped1 = jnp.einsum(
            "bij,bjc->bic", cvol, f1_ext.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if self.dustbin:
            warped1 = warped1[:, :HW]  # drop the dustbin row
            cvol_main = cvol[:, :HW, :HW]
        else:
            cvol_main = cvol

        parts = [f0.astype(jnp.float32), warped1]

        if self.position_encoder:
            grid = _uv_grid(H, W, jnp.float32)  # [HW, 2]
            pos_enc = jnp.einsum(
                "bij,jk->bik", cvol_main, grid, preferred_element_type=jnp.float32
            )  # soft-argmax warp position [B, HW, 2]
            parts.append(pos_enc)
            if self.position_encoder_im1:
                parts.append(jnp.broadcast_to(grid[None], (B, HW, 2)))
            if self.upsample_pos_enc > 0:
                feats = (
                    jnp.concatenate(
                        [pos_enc, jnp.broadcast_to(grid[None], (B, HW, 2))], axis=-1
                    )
                    if self.position_encoder_im1
                    else pos_enc
                )
                feats = feats.reshape(B, H, W, -1).astype(self.dtype)
                feats = PreActBlock(
                    self.upsample_pos_enc, dtype=self.dtype, name="pos_encoder_block"
                )(feats, train)
                parts.append(feats.reshape(B, HW, -1).astype(jnp.float32))

        if self.max_score_channel:
            max_score = jnp.max(cvol, axis=2, keepdims=True)[:, :HW]  # [B, HW, 1]
            parts.append(max_score)

        if self.cv_outlayers > 0:
            # correlation rows as channels over the view1 spatial grid
            cv_img = jnp.swapaxes(cvol_main, 1, 2).reshape(B, H, W, HW)
            cv_reduced = PreActBlock(
                self.cv_outlayers, dtype=self.dtype, name="cv_block"
            )(cv_img.astype(self.dtype), train)
            parts.append(cv_reduced.reshape(B, HW, -1).astype(jnp.float32))

        agg = jnp.concatenate(parts, axis=-1)
        return agg.reshape(B, H, W, -1).astype(self.dtype)


class CorrelationVolumeWarpingQKV(nn.Module):
    """QKV-projected variant (reference: aggregator.py:119-191)."""

    position_encoder: bool = False
    max_score_channel: bool = False
    normalise_dot: bool = False
    residual_att: bool = False
    fused: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vol0, vol1, train: bool = False):
        assert vol0.shape == vol1.shape, "Feature volumes shape must match"
        B, H, W, C = vol0.shape
        HW = H * W

        q_proj = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="Q_mlp")
        k_proj = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="K_mlp")
        v_proj = nn.Conv(C, (1, 1), use_bias=False, dtype=self.dtype, name="V_mlp")

        q = q_proj(vol0)
        k = k_proj(vol1)
        v0 = v_proj(vol0)
        v1 = v_proj(vol1)
        if self.residual_att:
            q = q + vol0
            k = k + vol1
            v0 = v0 + vol0
            v1 = v1 + vol1

        q, k, v0, v1 = map(_flatten, (q, k, v0, v1))
        if self.normalise_dot:
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        from mapfree_tpu.ops.correlation import fused_path_available

        if self.fused and fused_path_available():
            from mapfree_tpu.ops.correlation import fused_correlation_warp

            grid = _uv_grid(H, W, jnp.float32)
            warped1, pos_enc, max_score = fused_correlation_warp(q, k, v1, grid)
            parts = [v0.astype(jnp.float32), warped1]
            if self.position_encoder:
                parts.append(pos_enc)
            if self.max_score_channel:
                parts.append(max_score)
            agg = jnp.concatenate(parts, axis=-1)
            return agg.reshape(B, H, W, -1).astype(self.dtype)

        corr = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        cvol = nn.softmax(jnp.nan_to_num(corr), axis=2)
        warped1 = jnp.einsum(
            "bij,bjc->bic", cvol, v1.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

        parts = [v0.astype(jnp.float32), warped1]
        if self.position_encoder:
            grid = _uv_grid(H, W, jnp.float32)
            parts.append(
                jnp.einsum("bij,jk->bik", cvol, grid, preferred_element_type=jnp.float32)
            )
        if self.max_score_channel:
            parts.append(jnp.max(cvol, axis=2, keepdims=True))

        agg = jnp.concatenate(parts, axis=-1)
        return agg.reshape(B, H, W, -1).astype(self.dtype)


class Concat(nn.Module):
    """Channel concatenation ablation (reference: aggregator.py:194-200)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vol0, vol1, train: bool = False):
        return jnp.concatenate([vol0, vol1], axis=-1)


def aggregator_out_channels(agg_cfg, volume_channels: int) -> int:
    """Channel count of the aggregated volume (reference: aggregator.py:19-34)."""
    if agg_cfg.TYPE == "Concat":
        return 2 * volume_channels
    n = 2 * volume_channels
    if agg_cfg.POSITION_ENCODER:
        n += 2
    if agg_cfg.TYPE == "CorrelationVolumeWarping" and agg_cfg.POSITION_ENCODER_IM1:
        n += 2
    if agg_cfg.MAX_SCORE_CHANNEL:
        n += 1
    if agg_cfg.TYPE == "CorrelationVolumeWarping":
        if agg_cfg.CV_OUTLAYERS > 0:
            n += agg_cfg.CV_OUTLAYERS
        if agg_cfg.UPSAMPLE_POS_ENC > 0:
            n += agg_cfg.UPSAMPLE_POS_ENC
    return n


def build_aggregator(agg_cfg, dtype=jnp.float32, fused: bool = True) -> nn.Module:
    if agg_cfg.TYPE == "CorrelationVolumeWarping":
        return CorrelationVolumeWarping(
            fused=fused,
            position_encoder=bool(agg_cfg.POSITION_ENCODER),
            position_encoder_im1=bool(agg_cfg.POSITION_ENCODER_IM1),
            max_score_channel=bool(agg_cfg.MAX_SCORE_CHANNEL),
            normalise_dot=bool(agg_cfg.NORMALISE_DOT),
            cv_outlayers=int(agg_cfg.CV_OUTLAYERS or 0),
            cv_half_channels=bool(agg_cfg.CV_HALF_CHANNELS),
            upsample_pos_enc=int(agg_cfg.UPSAMPLE_POS_ENC or 0),
            dustbin=bool(agg_cfg.DUSTBIN),
            dtype=dtype,
            name="aggregator",
        )
    if agg_cfg.TYPE == "CorrelationVolumeWarpingQKV":
        return CorrelationVolumeWarpingQKV(
            fused=fused,
            position_encoder=bool(agg_cfg.POSITION_ENCODER),
            max_score_channel=bool(agg_cfg.MAX_SCORE_CHANNEL),
            normalise_dot=bool(agg_cfg.NORMALISE_DOT),
            residual_att=bool(agg_cfg.RESIDUAL_ATT),
            dtype=dtype,
            name="aggregator",
        )
    if agg_cfg.TYPE == "Concat":
        return Concat(dtype=dtype, name="aggregator")
    raise NotImplementedError(f"Invalid aggregator {agg_cfg.TYPE}")
