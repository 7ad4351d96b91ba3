"""Shared conv building blocks (flax.linen, NHWC).

TPU-native re-design of the reference's torch blocks
(reference: lib/models/regression/encoder/preact.py:13-96,
lib/models/regression/encoder/resunet.py:15-38). NHWC layout keeps the channel
dim on the TPU lane dimension; convs compile onto the MXU. Compute dtype is
configurable (bfloat16 by default for TPU) while parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PreActBlock(nn.Module):
    """Pre-activation residual basic block (He et al., arXiv:1603.05027).

    Matches reference preact.py:13-36: BN-ReLU-Conv3x3(stride)-BN-ReLU-Conv3x3,
    with a 1x1 conv shortcut (applied to the pre-activated input) when stride
    or channel count changes.
    """

    planes: int
    stride: int = 1
    bn: bool = True
    dtype: Dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = x
        if self.bn:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn1",
            )(out)
        out = nn.relu(out)

        needs_proj = self.stride != 1 or in_planes != self.expansion * self.planes
        if needs_proj:
            shortcut = nn.Conv(
                self.expansion * self.planes, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, dtype=self.dtype, name="shortcut",
            )(out)
        else:
            shortcut = x

        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(out)
        if self.bn:
            out = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn2",
            )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(1, 1), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        return out + shortcut


class PreActBottleneck(nn.Module):
    """Pre-activation bottleneck block, expansion 4 (reference preact.py:39-64)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        out = nn.relu(out)

        needs_proj = self.stride != 1 or in_planes != self.expansion * self.planes
        if needs_proj:
            shortcut = nn.Conv(
                self.expansion * self.planes, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, dtype=self.dtype, name="shortcut",
            )(out)
        else:
            shortcut = x

        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn3",
        )(out)
        out = nn.relu(out)
        out = nn.Conv(self.expansion * self.planes, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        return out + shortcut


class PreActBottleneckDepthwise(nn.Module):
    """Grouped-conv bottleneck variant (reference preact.py:67-96)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        groups = min(in_planes, self.planes)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        out = nn.relu(out)

        needs_proj = self.stride != 1 or in_planes != self.expansion * self.planes
        if needs_proj:
            shortcut = nn.Conv(
                self.expansion * self.planes, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, feature_group_count=groups, dtype=self.dtype,
                name="shortcut",
            )(out)
        else:
            shortcut = x

        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      feature_group_count=groups, dtype=self.dtype, name="conv1")(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
            use_bias=False, feature_group_count=groups, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn3",
        )(out)
        out = nn.relu(out)
        out = nn.Conv(self.expansion * self.planes, (1, 1), use_bias=False,
                      feature_group_count=groups, dtype=self.dtype, name="conv3")(out)
        return out + shortcut


class ConvBnElu(nn.Module):
    """Conv + BatchNorm + ELU (reference resunet.py:15-26 ``conv``)."""

    features: int
    kernel_size: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel_size,) * 2, strides=(self.stride,) * 2,
            padding=pad, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.elu(x)


class UpConv(nn.Module):
    """Bilinear 2x upsample + ConvBnElu (reference resunet.py:29-38)."""

    features: int
    kernel_size: int = 3
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        x = _resize_bilinear_align_corners(x, (H * self.scale, W * self.scale))
        return ConvBnElu(self.features, self.kernel_size, 1, dtype=self.dtype,
                         name="conv1")(x, train)


def _interp_matrix(in_size: int, out_size: int):
    """[out, in] align-corners linear-interpolation matrix (two nonzeros per
    row), built in numpy at trace time — shapes are static."""
    import numpy as np

    if out_size == 1 or in_size == 1:
        src = np.zeros((out_size,), np.float32)
    else:
        src = np.arange(out_size, dtype=np.float32) * (in_size - 1) / (out_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = src - lo
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def _resize_bilinear_align_corners(x, out_hw):
    """Bilinear resize with align_corners=True semantics (matches the
    reference's F.interpolate(..., align_corners=True), resunet.py:36-37).

    Implemented as two small dense interpolation matmuls instead of gathers:
    TPU gathers move one row per cycle and measured 9.6 ms for the decoder's
    H/8->H/4 upsample at 512 channels, 2x the cost of the 512->256 conv that
    follows it; the [out, in] matmul form runs on the MXU in ~0.1 ms
    (docs/NOTES.md perf breakdown). The interpolation matrices have two
    nonzeros per row and are graph constants (<25 kB).
    """
    B, H, W, C = x.shape
    out_h, out_w = out_hw
    if (out_h, out_w) == (H, W):
        return x

    mh = jnp.asarray(_interp_matrix(H, out_h), x.dtype)
    mw = jnp.asarray(_interp_matrix(W, out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = jnp.einsum("pw,bhwc->bhpc", mw, x,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x
