"""TPU-native SIFT: DoG scale-space detector + oriented 128-D descriptors.

Batched fixed-shape replacement for OpenCV's C++ SIFT
(reference lib/models/matching/feature_matching.py:58,81-82 and SURVEY.md §2.9
item 1): the whole detect+describe runs as one jit-compiled program over a
batch of images — Gaussian/DoG pyramid as depthwise convs, 3x3x3 extrema via
max-pool comparison, top-K selection with ``lax.top_k``, orientation
histograms and descriptors via bilinear gathers vmapped over keypoints.

Fixed-shape discipline: every image yields exactly ``num_features`` keypoints
(score-ranked; surplus slots masked invalid), so downstream matching/RANSAC
see static shapes.

This is a faithful-but-simplified SIFT: per-octave extrema with quadratic
sub-pixel refinement in space, edge rejection by Hessian ratio, single
dominant orientation, 4x4x8 descriptor with bilinear spatial weighting and
the standard 0.2 clipping. It is not keypoint-for-keypoint identical to
OpenCV, but produces matchable descriptors of the same family.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_CONTRAST_THR = 0.015
_EDGE_RATIO = 10.0
_NUM_SCALES = 3  # scales searched per octave
_SIGMA0 = 1.6


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(img, sigma: float):
    """Separable Gaussian blur, [B, H, W] float32."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    k = _gaussian_kernel1d(sigma, radius)
    img4 = img[..., None]  # [B, H, W, 1]
    kh = k.reshape(-1, 1, 1, 1)
    kw = k.reshape(1, -1, 1, 1)
    out = lax.conv_general_dilated(
        img4, kh, (1, 1), [(radius, radius), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (radius, radius)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[..., 0]


def _downsample2(img):
    return img[:, ::2, ::2]


def _bilinear_gather(img, y, x):
    """Sample img [H, W] at float coords (y [..], x [..]) with border clamp."""
    H, W = img.shape
    y = jnp.clip(y, 0.0, H - 1.001)
    x = jnp.clip(x, 0.0, W - 1.001)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    fy = y - y0
    fx = x - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _octave_responses(gray, num_octaves: int):
    """Build per-octave DoG stacks. Returns list of (dogs [B, S+2, H, W],
    gauss [B, S+3, H, W], scale_factor)."""
    k = 2.0 ** (1.0 / _NUM_SCALES)
    out = []
    base = _blur(gray, _SIGMA0)
    scale_factor = 1.0
    for _ in range(num_octaves):
        gs = [base]
        sigma_prev = _SIGMA0
        for s in range(1, _NUM_SCALES + 3):
            sigma_total = _SIGMA0 * (k ** s)
            sigma_inc = math.sqrt(max(sigma_total**2 - sigma_prev**2, 0.01))
            gs.append(_blur(gs[-1], sigma_inc))
            sigma_prev = sigma_total
        gauss = jnp.stack(gs, axis=1)  # [B, S+3, H, W]
        dogs = gauss[:, 1:] - gauss[:, :-1]  # [B, S+2, H, W]
        out.append((dogs, gauss, scale_factor))
        base = _downsample2(gs[_NUM_SCALES])
        scale_factor *= 2.0
    return out


def _extrema_scores(dogs):
    """Scale-space extrema response per (scale, y, x) in the searchable range.

    dogs: [B, S+2, H, W]. Returns scores [B, S, H, W] (0 where not an
    extremum / rejected by contrast or edge tests)."""
    B, Sp2, H, W = dogs.shape
    d = dogs[:, :, None]  # [B, S+2, 1, H, W] for windowed pooling
    # 3x3x3 max/min over (scale, y, x) neighbourhoods, centered
    mx = lax.reduce_window(
        dogs, -jnp.inf, lax.max, (1, 3, 3, 3), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1)])
    mn = lax.reduce_window(
        dogs, jnp.inf, lax.min, (1, 3, 3, 3), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1)])
    center = dogs
    is_max = center >= mx
    is_min = center <= mn
    is_ext = jnp.logical_or(is_max, is_min)

    # contrast threshold
    is_ext &= jnp.abs(center) > _CONTRAST_THR

    # edge rejection: 2x2 spatial Hessian ratio
    dxx = jnp.roll(center, -1, axis=3) + jnp.roll(center, 1, axis=3) - 2 * center
    dyy = jnp.roll(center, -1, axis=2) + jnp.roll(center, 1, axis=2) - 2 * center
    dxy = 0.25 * (
        jnp.roll(jnp.roll(center, -1, 2), -1, 3)
        - jnp.roll(jnp.roll(center, -1, 2), 1, 3)
        - jnp.roll(jnp.roll(center, 1, 2), -1, 3)
        + jnp.roll(jnp.roll(center, 1, 2), 1, 3)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = _EDGE_RATIO
    edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
    is_ext &= edge_ok

    scores = jnp.where(is_ext, jnp.abs(center), 0.0)
    # searchable scales: 1..S (need scale neighbours); border pixels excluded
    scores = scores[:, 1: _NUM_SCALES + 1]
    border = 8
    mask = jnp.zeros((H, W), bool).at[border:-border, border:-border].set(True)
    return scores * mask[None, None]


def _orientation_and_descriptor(gauss_img, y, x, scale_px):
    """Dominant orientation + 128-D descriptor for one keypoint.

    gauss_img: [H, W] the Gaussian image at the keypoint's scale;
    y, x: keypoint position (octave pixels); scale_px: sampling radius unit.
    """
    # --- orientation: 36-bin histogram of gradients in a circular window
    R = 8  # window half-size in grid steps
    offs = jnp.arange(-R, R, dtype=jnp.float32) + 0.5
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")  # [16, 16]
    step = scale_px / 2.0
    sy = y + oy.reshape(-1) * step
    sx = x + ox.reshape(-1) * step

    gx = (_bilinear_gather(gauss_img, sy, sx + 1) -
          _bilinear_gather(gauss_img, sy, sx - 1)) * 0.5
    gy = (_bilinear_gather(gauss_img, sy + 1, sx) -
          _bilinear_gather(gauss_img, sy - 1, sx)) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ang = jnp.arctan2(gy, gx)  # [-pi, pi]

    w_gauss = jnp.exp(-(oy.reshape(-1) ** 2 + ox.reshape(-1) ** 2) / (2 * (R / 2) ** 2))
    bins36 = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 36).astype(jnp.int32) % 36
    hist = jnp.zeros((36,)).at[bins36].add(mag * w_gauss)
    # smooth the histogram (circular)
    hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0
    theta = (jnp.argmax(hist).astype(jnp.float32) + 0.5) / 36.0 * 2 * jnp.pi - jnp.pi

    # --- descriptor: rotated 16x16 grid -> 4x4 cells x 8 orientation bins
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    ry = oy.reshape(-1) * step
    rx = ox.reshape(-1) * step
    gy_r = y + (sin_t * rx + cos_t * ry)
    gx_r = x + (cos_t * rx - sin_t * ry)

    gxs = (_bilinear_gather(gauss_img, gy_r, gx_r + 1) -
           _bilinear_gather(gauss_img, gy_r, gx_r - 1)) * 0.5
    gys = (_bilinear_gather(gauss_img, gy_r + 1, gx_r) -
           _bilinear_gather(gauss_img, gy_r - 1, gx_r)) * 0.5
    mag_d = jnp.sqrt(gxs * gxs + gys * gys + 1e-12) * w_gauss
    ang_d = jnp.arctan2(gys, gxs) - theta  # rotation-invariant

    obin = jnp.floor((ang_d + 3 * jnp.pi) / (2 * jnp.pi) * 8).astype(jnp.int32) % 8
    cell_y = jnp.clip(((oy.reshape(-1) + R) / (2 * R / 4)).astype(jnp.int32), 0, 3)
    cell_x = jnp.clip(((ox.reshape(-1) + R) / (2 * R / 4)).astype(jnp.int32), 0, 3)
    flat_bin = (cell_y * 4 + cell_x) * 8 + obin
    desc = jnp.zeros((128,)).at[flat_bin].add(mag_d)

    # normalise, clip, renormalise (standard SIFT illumination robustness)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)
    return theta, desc


@partial(jax.jit, static_argnames=("num_features", "num_octaves"))
def sift_detect_describe(gray, num_features: int = 2048, num_octaves: int = 4):
    """Batched SIFT over grayscale images.

    Args:
        gray: [B, H, W] float32 in [0, 1].
        num_features: fixed keypoint budget per image.
        num_octaves: scale-space octaves.
    Returns dict with:
        keypoints [B, K, 2] (x, y) in input pixels;
        descriptors [B, K, 128] (L2-normalised, pre-rootSIFT);
        scores [B, K]; mask [B, K] validity.
    """
    B, H, W = gray.shape
    octaves = _octave_responses(gray, num_octaves)

    per_oct = num_features // num_octaves + 8
    all_xy, all_scores, all_desc, all_valid = [], [], [], []

    for dogs, gauss, sf in octaves:
        scores = _extrema_scores(dogs)  # [B, S, h, w]
        Bq, S, h, w = scores.shape
        flat = scores.reshape(B, -1)
        top_scores, top_idx = lax.top_k(flat, per_oct)  # [B, per_oct]
        s_idx = top_idx // (h * w)
        yx = top_idx % (h * w)
        y_i = (yx // w).astype(jnp.float32)
        x_i = (yx % w).astype(jnp.float32)
        valid = top_scores > 0.0

        # quadratic sub-pixel refinement in space on the DoG slice
        def refine_and_describe(dogs_b, gauss_b, s_i, y, x):
            dog = dogs_b[s_i + 1]  # center scale of the extremum

            def d(dy, dx):
                return _bilinear_gather(dog, y + dy, x + dx)

            dxx = d(0, 1) + d(0, -1) - 2 * d(0, 0)
            dyy = d(1, 0) + d(-1, 0) - 2 * d(0, 0)
            gx = (d(0, 1) - d(0, -1)) * 0.5
            gy = (d(1, 0) - d(-1, 0)) * 0.5
            off_x = jnp.clip(-gx / jnp.where(jnp.abs(dxx) > 1e-9, dxx, 1e9), -0.5, 0.5)
            off_y = jnp.clip(-gy / jnp.where(jnp.abs(dyy) > 1e-9, dyy, 1e9), -0.5, 0.5)
            yr = y + off_y
            xr = x + off_x

            scale_px = _SIGMA0 * (2.0 ** ((s_i + 1.0) / _NUM_SCALES))
            theta, desc = _orientation_and_descriptor(
                gauss_b[s_i + 1], yr, xr, scale_px)
            return yr, xr, desc

        refined = jax.vmap(  # over batch
            lambda dogs_b, gauss_b, s_b, y_b, x_b: jax.vmap(
                lambda s_i, y, x: refine_and_describe(dogs_b, gauss_b, s_i, y, x)
            )(s_b, y_b, x_b)
        )(dogs, gauss, s_idx, y_i, x_i)
        yr, xr, desc = refined

        all_xy.append(jnp.stack([xr * sf, yr * sf], axis=-1))  # (x, y) input px
        all_scores.append(top_scores)
        all_desc.append(desc)
        all_valid.append(valid)

    xy = jnp.concatenate(all_xy, axis=1)
    scores = jnp.concatenate(all_scores, axis=1)
    desc = jnp.concatenate(all_desc, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    # global top-K across octaves
    masked_scores = jnp.where(valid, scores, -1.0)
    top_scores, sel = lax.top_k(masked_scores, num_features)
    take = lambda a: jnp.take_along_axis(a, sel[..., None], axis=1)
    xy = jnp.take_along_axis(xy, sel[..., None], axis=1)
    desc = jnp.take_along_axis(desc, sel[..., None], axis=1)
    mask = top_scores > 0.0

    return {
        "keypoints": xy,
        "descriptors": desc,
        "scores": jnp.maximum(top_scores, 0.0),
        "mask": mask,
    }


def root_sift(desc):
    """Hellinger-kernel normalisation (reference feature_matching.py:67-73)."""
    desc = desc / (jnp.sum(desc, axis=-1, keepdims=True) + 1e-7)
    return jnp.sqrt(desc)
