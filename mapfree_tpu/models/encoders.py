"""Feature encoders: ResNet and ResUNet (flax.linen, NHWC).

TPU-native equivalents of the reference encoders
(reference: lib/models/regression/encoder/resnet.py:7-37,
lib/models/regression/encoder/resunet.py:41-128). Both produce a feature
volume for the correlation aggregator:

- ResNet: 7x7 stride-2 stem + 3 pre-act stages, each followed by 2x avg-pool
  (1/64 resolution output, 256*expansion channels).
- ResUNet: CAPS-style residual U-Net; stem to H/4, encoder stages to H/16,
  decoder with skip-concats back to H/4 with ``NUM_OUT_LAYERS`` channels.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from mapfree_tpu.models.blocks import (
    ConvBnElu,
    PreActBlock,
    PreActBottleneck,
    PreActBottleneckDepthwise,
    UpConv,
)

BLOCK_TYPES = [PreActBlock, PreActBottleneck, PreActBottleneckDepthwise]


def parse_num_blocks(spec: str) -> list:
    return [int(x) for x in spec.strip().split("-")]


def encoder_out_channels(encoder_cfg) -> int:
    """Number of channels of the encoder output volume (used by aggregator)."""
    if encoder_cfg.TYPE == "ResNet":
        block = BLOCK_TYPES[encoder_cfg.BLOCK_TYPE]
        return 256 * block.expansion
    if encoder_cfg.TYPE == "ResUNet":
        n = encoder_cfg.NUM_OUT_LAYERS
        return 128 if n is None else n
    raise NotImplementedError(f"Invalid encoder {encoder_cfg.TYPE}")


class _Stage(nn.Module):
    """A stack of residual blocks; first block carries the stride."""

    block: Type[nn.Module]
    planes: int
    num_blocks: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = [self.stride] + [1] * (self.num_blocks - 1)
        for i, s in enumerate(strides):
            x = self.block(self.planes, stride=s, dtype=self.dtype, name=f"block{i}")(
                x, train
            )
        return x


class ResNet(nn.Module):
    """(reference: encoder/resnet.py:7-37)"""

    block_type: int
    num_blocks: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = BLOCK_TYPES[self.block_type]
        # 7x7 stride-2 stem; reference uses padding=1 (slightly crops borders)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _Stage(block, 64, self.num_blocks[0], 1, self.dtype, name="layer1")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = _Stage(block, 128, self.num_blocks[1], 2, self.dtype, name="layer2")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = _Stage(block, 256, self.num_blocks[2], 2, self.dtype, name="layer3")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResUNet(nn.Module):
    """(reference: encoder/resunet.py:41-128)"""

    block_type: int
    num_blocks: Sequence[int]
    num_out_layers: int = 128
    not_concat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = BLOCK_TYPES[self.block_type]

        # stem: 7x7 stride 2 -> BN -> ReLU -> 3x3 maxpool stride 2 (H/4)
        x1 = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                     dtype=self.dtype, name="firstconv")(x)
        x1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                          dtype=self.dtype, name="firstbn")(x1)
        x1 = nn.relu(x1)
        x1 = nn.max_pool(x1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # encoder stages (H/4, H/8, H/16)
        x2 = _Stage(block, 64, self.num_blocks[0], 1, self.dtype, name="encoder1")(x1, train)
        x3 = _Stage(block, 128, self.num_blocks[1], 2, self.dtype, name="encoder2")(x2, train)
        x4 = _Stage(block, 256, self.num_blocks[2], 2, self.dtype, name="encoder3")(x3, train)

        # decoder: upsample + skip-concat back to H/4
        y = UpConv(512, 3, 2, dtype=self.dtype, name="upconv4")(x4, train)
        if not self.not_concat:
            y = _skip_concat(y, x3)
        y = ConvBnElu(512, 3, 1, dtype=self.dtype, name="iconv4")(y, train)

        y = UpConv(256, 3, 2, dtype=self.dtype, name="upconv3")(y, train)
        if not self.not_concat:
            y = _skip_concat(y, x2)
        y = ConvBnElu(256, 3, 1, dtype=self.dtype, name="iconv3")(y, train)

        y = ConvBnElu(self.num_out_layers, 1, 1, dtype=self.dtype, name="outconv")(y, train)
        return y


def _skip_concat(y, skip):
    """Pad (or crop, for negative deltas) the SKIP tensor spatially to the
    upsampled tensor's size, concat channels [upsampled, skip] — exactly the
    reference's skipconnect(x1=skip, x2=upsampled): it pads x1 and returns
    cat([x2, x1]) (reference resunet.py:91-103; torch F.pad semantics where
    negative pads crop). Both the pad target and the concat order matter for
    weight-converted checkpoints: the downstream iconv consumes
    [upsampled | skip] channel blocks in that order."""

    def _fit(x, axis, target):
        d = target - x.shape[axis]
        lo, hi = d // 2, d - d // 2
        if d > 0:
            pads = [(0, 0)] * x.ndim
            pads[axis] = (lo, hi)
            return jnp.pad(x, pads)
        if d < 0:
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(-lo, x.shape[axis] + hi)
            return x[tuple(idx)]
        return x

    skip = _fit(skip, 1, y.shape[1])
    skip = _fit(skip, 2, y.shape[2])
    return jnp.concatenate([y, skip], axis=-1)


def build_encoder(encoder_cfg, dtype=jnp.float32, remat: bool = False) -> nn.Module:
    """remat=True rematerialises encoder activations in the backward pass
    (jax.checkpoint): trades recompute FLOPs for HBM during training."""
    num_blocks = parse_num_blocks(encoder_cfg.NUM_BLOCKS)
    if encoder_cfg.TYPE == "ResNet":
        cls = nn.remat(ResNet, static_argnums=(2,)) if remat else ResNet
        return cls(encoder_cfg.BLOCK_TYPE, num_blocks, dtype=dtype, name="encoder")
    if encoder_cfg.TYPE == "ResUNet":
        n = encoder_cfg.NUM_OUT_LAYERS
        cls = nn.remat(ResUNet, static_argnums=(2,)) if remat else ResUNet
        return cls(
            encoder_cfg.BLOCK_TYPE,
            num_blocks,
            num_out_layers=128 if n is None else n,
            not_concat=bool(encoder_cfg.NOT_CONCAT),
            dtype=dtype,
            name="encoder",
        )
    raise NotImplementedError(f"Invalid encoder {encoder_cfg.TYPE}")
