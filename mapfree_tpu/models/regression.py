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
    def __call__(self, image0, image1, train: bool = False):
        """image0: [B, H, W, 3]; image1: [B, H, W, 3] (single-frame) or
        [B, F, H, W, 3] (multi-frame; only the final query frame is encoded,
        matching reference model.py:240-241)."""
        if self.multi_frame:
            image1 = image1[:, -1]

        # images may arrive as raw uint8 (4x cheaper host->device transfer;
        # the loader ships decoded JPEG bytes) — normalise on device
        scale = 1.0 / 255.0 if image0.dtype == jnp.uint8 else 1.0
        image0 = image0.astype(self.compute_dtype) * scale
        image1 = image1.astype(self.compute_dtype) * scale

        # shared-weight two-view encoding in one batched dispatch: stacking
        # the views doubles the conv batch (better MXU utilisation) instead of
        # running the encoder twice.
        B = image0.shape[0]
        stacked = jnp.concatenate([image0, image1], axis=0)
        vols = self.encoder(stacked, train)
        vol0, vol1 = vols[:B], vols[B:]

        global_volume = self.aggregator(vol0, vol1, train)
        R, t, aux = self.head(global_volume, train)

        if self.learnable_loss_weights:
            aux["s_r"] = self.param("s_r", nn.initializers.zeros, (1,))
            aux["s_t"] = self.param("s_t", nn.initializers.zeros, (1,))
        return R.astype(jnp.float32), t.astype(jnp.float32), aux


def build_regression_net(cfg) -> RegressionNet:
    compute_dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    encoder = build_encoder(cfg.ENCODER, dtype=compute_dtype,
                            remat=bool(cfg.TPU.REMAT))
    aggregator = build_aggregator(cfg.AGGREGATOR, dtype=compute_dtype,
                                  fused=bool(cfg.TPU.FUSED_CORRELATION))
    head = build_head(cfg, dtype=compute_dtype)
    return RegressionNet(
        encoder=encoder,
        aggregator=aggregator,
        head=head,
        multi_frame=(cfg.MODEL == "RegressionMultiFrame"),
        learnable_loss_weights=(cfg.TRAINING.LAMBDA == 0.0),
        compute_dtype=compute_dtype,
    )
