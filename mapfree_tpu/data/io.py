"""Host-side image/depth IO.

Equivalent of reference lib/datasets/utils.py:7-81, returning NHWC numpy
arrays (TPU-native layout; the reference returns CHW torch tensors). Decoding
stays on host CPU; resize happens at decode time so the device program sees
fixed shapes.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

try:
    import mapfree_native  # C++ batch JPEG decode (native/decoder.cpp)

    _HAS_NATIVE = True
except Exception:  # pragma: no cover
    _HAS_NATIVE = False

HAS_NATIVE_DECODER = _HAS_NATIVE


def decode_resize_batch(paths, width: int, height: int, num_threads: int = 0,
                        uint8: bool = False, yuv420: bool = False):
    """Decode+resize a batch of JPEGs in one call: float32 [0, 1] NHWC by
    default, raw uint8 NHWC when ``uint8`` (4x fewer bytes to ship to the
    device; models divide by 255 on-device), or planar YUV420 uint8
    [N, H*3/2, W] when ``yuv420`` (8x fewer bytes than float RGB; models
    unpack on device via ops/image.yuv420_to_rgb).

    Uses the native C++ thread-pool decoder when built (python native/build.py
    — releases the GIL, one allocation for the whole batch), else falls back
    to per-image cv2 decode.
    """
    if _HAS_NATIVE:
        return mapfree_native.decode_resize_batch(
            [str(p) for p in paths], width, height, num_threads, uint8=uint8,
            yuv420=yuv420,
        )
    out = np.stack(
        [read_color_image(p, resize=(width, height)) for p in paths]
    )
    if yuv420:
        from mapfree_tpu.ops.image import yuv420_pack_host

        return yuv420_pack_host(out)
    if uint8:
        out = (out * 255.0 + 0.5).astype(np.uint8)
    return out


def imread_rgb(path) -> np.ndarray:
    """Read an image as RGB uint8 [H, W, 3]."""
    if _HAS_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(f"could not read image {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def read_color_image(path, resize=None, augment_fn=None) -> np.ndarray:
    """Read, resize to (w, h), normalize to [0, 1] float32 NHWC
    (reference lib/datasets/utils.py:58-74, minus the CHW permute)."""
    image = imread_rgb(path)
    if resize is not None:
        if _HAS_CV2:
            image = cv2.resize(image, tuple(resize))
        else:  # pragma: no cover
            from PIL import Image

            image = np.asarray(Image.fromarray(image).resize(tuple(resize)))
    image = image.astype(np.float32) / 255.0
    if augment_fn is not None:
        image = augment_fn(image)
    return image  # (h, w, 3)


def read_depth_image(path) -> np.ndarray:
    """Read a 16-bit depth png in millimeters -> float32 meters [H, W]
    (reference lib/datasets/utils.py:77-81)."""
    if _HAS_CV2:
        depth = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if depth is None:
            raise FileNotFoundError(f"could not read depth {path}")
    else:  # pragma: no cover
        from PIL import Image

        depth = np.asarray(Image.open(path))
    return (depth / 1000.0).astype(np.float32)


def get_resized_wh(w, h, resize=None):
    """Resize the longer edge to ``resize`` keeping aspect ratio
    (reference lib/datasets/utils.py:20-26)."""
    if resize is not None:
        scale = resize / max(h, w)
        return int(round(w * scale)), int(round(h * scale))
    return w, h


def get_divisible_wh(w, h, df=None):
    """Floor dims to a multiple of ``df`` (reference utils.py:29-34)."""
    if df is not None:
        return int(w // df * df), int(h // df * df)
    return w, h


def pad_bottom_right(inp, pad_size, ret_mask=False):
    """Pad a [H, W] or [C, H, W] array to a square ``pad_size`` canvas with an
    optional validity mask (reference utils.py:37-55; the fixed-shape batching
    precedent for variable-size inputs)."""
    assert isinstance(pad_size, int) and pad_size >= max(inp.shape[-2:]), (
        f"{pad_size} < {max(inp.shape[-2:])}"
    )
    mask = None
    if inp.ndim == 2:
        padded = np.zeros((pad_size, pad_size), dtype=inp.dtype)
        padded[: inp.shape[0], : inp.shape[1]] = inp
        if ret_mask:
            mask = np.zeros((pad_size, pad_size), dtype=bool)
            mask[: inp.shape[0], : inp.shape[1]] = True
    elif inp.ndim == 3:
        padded = np.zeros((inp.shape[0], pad_size, pad_size), dtype=inp.dtype)
        padded[:, : inp.shape[1], : inp.shape[2]] = inp
        if ret_mask:
            mask = np.zeros((inp.shape[0], pad_size, pad_size), dtype=bool)
            mask[:, : inp.shape[1], : inp.shape[2]] = True
    else:
        raise NotImplementedError()
    return padded, mask


def grayscale3(image: np.ndarray) -> np.ndarray:
    """Black & white augmentation keeping 3 channels
    (reference datamodules.py:37-38 Grayscale(num_output_channels=3))."""
    gray = image @ np.asarray([0.299, 0.587, 0.114], image.dtype)
    return np.repeat(gray[..., None], 3, axis=-1)


def color_jitter(rng: np.random.Generator, brightness=0.4, contrast=0.4,
                 saturation=0.4, hue=0.0):
    """Returns an augment_fn applying random brightness/contrast/saturation
    (host-side equivalent of torchvision ColorJitter defaults used by the
    reference datamodules.py:36)."""

    def fn(image: np.ndarray) -> np.ndarray:
        out = image
        b = rng.uniform(max(0, 1 - brightness), 1 + brightness)
        out = out * b
        c = rng.uniform(max(0, 1 - contrast), 1 + contrast)
        mean = out.mean()
        out = (out - mean) * c + mean
        s = rng.uniform(max(0, 1 - saturation), 1 + saturation)
        gray = out @ np.asarray([0.299, 0.587, 0.114], out.dtype)
        out = (out - gray[..., None]) * s + gray[..., None]
        return np.clip(out, 0.0, 1.0).astype(np.float32)

    return fn
