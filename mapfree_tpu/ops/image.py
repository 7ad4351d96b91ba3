"""On-device image format ops.

:func:`yuv420_to_rgb` unpacks the loader's planar YUV420 batches (native
decoder `pack_yuv420`) into [0, 1] RGB inside the jitted forward. Shipping
4:2:0 chroma halves the host->device bytes of a uint8 RGB batch — the
dominant stage of the submission sweep on a remote link (reference analog:
submission.py:33-58 ships full float tensors per pair) — and JPEG chroma was
4:2:0-subsampled on disk to begin with, so the extra round trip costs ~1/255.

The chroma upsample is two half-pixel-centre interpolation matmuls (MXU)
rather than a gather: TPU gathers move one row per cycle (docs/NOTES.md,
models/blocks.py `_resize_bilinear_align_corners` has the measurements).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _interp_matrix_halfpix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] linear-interpolation matrix with half-pixel-centre sampling
    (cv2.resize INTER_LINEAR convention; for 2x chroma upsampling this is the
    triangle filter libjpeg's fancy h2v2 upsampler applies). Two nonzeros per
    row; built in numpy at trace time (shapes are static)."""
    src = (np.arange(out_size, dtype=np.float32) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


def yuv420_to_rgb(packed, dtype=jnp.float32):
    """Planar YUV420 uint8 [..., H*3/2, W] -> RGB [..., H, W, 3] in [0, 1].

    Layout (native decoder `pack_yuv420`): rows 0..H are the Y plane; the
    bottom H/2 rows hold the quarter-res chroma side by side (U in columns
    0..W/2, V in the rest). Colour matrix = libjpeg's JFIF full-range
    YCbCr->RGB (jdcolor.c constants), so the output matches the RGB decode
    path up to the 4:2:0 chroma round trip.
    """
    *lead, H15, W = packed.shape
    H = (H15 * 2) // 3
    flat = packed.reshape((-1, H15, W))

    y = flat[:, :H, :].astype(jnp.float32)
    uv = flat[:, H:, :].astype(jnp.float32) - 128.0
    u, v = uv[:, :, : W // 2], uv[:, :, W // 2:]

    mh = jnp.asarray(_interp_matrix_halfpix(H // 2, H))
    mw = jnp.asarray(_interp_matrix_halfpix(W // 2, W))

    def up2(c):
        c = jnp.einsum("oh,bhw->bow", mh, c,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("pw,bhw->bhp", mw, c,
                          preferred_element_type=jnp.float32)

    u, v = up2(u), up2(v)
    r = y + 1.402 * v
    g = y - 0.344136286 * u - 0.714136286 * v
    b = y + 1.772 * u
    rgb = jnp.stack([r, g, b], axis=-1) * (1.0 / 255.0)
    rgb = jnp.clip(rgb, 0.0, 1.0).astype(dtype)
    return rgb.reshape(tuple(lead) + (H, W, 3))


def yuv420_pack_host(rgb01: np.ndarray) -> np.ndarray:
    """Host fallback of the native packer: RGB float [0,1] [N, H, W, 3] ->
    planar YUV420 uint8 [N, H*3/2, W] (JFIF forward matrix + 2x2 box chroma).
    Used when the C++ decoder is not built; also the test oracle."""
    x = rgb01.astype(np.float32) * 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    n, h, w = y.shape
    assert h % 2 == 0 and w % 2 == 0, "yuv420 requires even dims"

    def box2(c):
        return c.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))

    out = np.empty((n, h + h // 2, w), np.uint8)
    out[:, :h, :] = np.clip(y + 0.5, 0, 255).astype(np.uint8)
    out[:, h:, : w // 2] = np.clip(box2(cb) + 0.5, 0, 255).astype(np.uint8)
    out[:, h:, w // 2:] = np.clip(box2(cr) + 0.5, 0, 255).astype(np.uint8)
    return out
