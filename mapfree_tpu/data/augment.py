"""On-device training augmentation over uint8 batches.

The reference augments on the host inside torchvision transforms
(reference lib/datasets/datamodules.py:33-40: ColorJitter(0.4, 0.4, 0.4) or
Grayscale(num_output_channels=3)) — which forces the loader onto the float32
decode path and quadruples host->device transfer bytes. Here the loader
always ships uint8 and the jitter runs in-graph on device: per-image factors
drawn from the train-step PRNG, the whole thing fused by XLA into the input
normalisation, so augmented training pays the same H2D cost as eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def _to_float01(image):
    if image.shape[-1] != 3:
        # packed planar YUV420 uint8 [..., H*3/2, W] (the loader's cheapest
        # transfer format, data/mapfree.py) — unpack on device first
        from mapfree_tpu.ops.image import yuv420_to_rgb

        return yuv420_to_rgb(image)
    if image.dtype == jnp.uint8:
        return image.astype(jnp.float32) / 255.0
    return image.astype(jnp.float32)


def device_grayscale(image):
    """[..., H, W, 3] -> float32 [0, 1] grayscale kept as 3 channels
    (device twin of data/io.py grayscale3)."""
    image = _to_float01(image)
    gray = image @ _LUMA
    return jnp.repeat(gray[..., None], 3, axis=-1)


def device_color_jitter(key, image, brightness=0.4, contrast=0.4,
                        saturation=0.4):
    """Random brightness/contrast/saturation, one factor triple PER IMAGE.

    Input [..., H, W, 3] uint8 or float01 — every leading axis is treated as
    batch (multi-frame [B, F, H, W, 3] gets independent factors per frame,
    like the host transform which runs once per decoded image). Same math as
    data/io.py color_jitter: scale, then contrast about the per-image mean,
    then saturation about per-pixel luma, clipped to [0, 1].
    """
    image = _to_float01(image)
    lead = image.shape[:-3]
    fshape = lead + (1, 1, 1)
    kb, kc, ks = jax.random.split(key, 3)

    def factor(k, strength):
        return jax.random.uniform(
            k, fshape, minval=max(0.0, 1.0 - strength), maxval=1.0 + strength)

    out = image * factor(kb, brightness)
    mean = out.mean(axis=(-1, -2, -3), keepdims=True)
    out = (out - mean) * factor(kc, contrast) + mean
    gray = (out @ _LUMA)[..., None]
    out = (out - gray) * factor(ks, saturation) + gray
    return jnp.clip(out, 0.0, 1.0)


def make_device_augment(cfg):
    """Augment callable ``fn(key, batch_dict) -> batch_dict`` for the train
    step, or None when the config needs no on-device augmentation.

    Active when ``TPU.DEVICE_AUGMENT`` is on and the dataset requests an
    augmentation; the DataModule then skips its host transform so the loader
    stays on the uint8 batch-decode path.
    """
    if not bool(cfg.TPU.DEVICE_AUGMENT):
        return None
    black_white = bool(cfg.DATASET.BLACK_WHITE)
    jitter = cfg.DATASET.AUGMENTATION_TYPE == "colorjitter"
    if not (black_white or jitter):
        return None

    def augment(key, batch):
        batch = dict(batch)
        if black_white:
            batch["image0"] = device_grayscale(batch["image0"])
            batch["image1"] = device_grayscale(batch["image1"])
            return batch
        k0, k1 = jax.random.split(key)
        batch["image0"] = device_color_jitter(k0, batch["image0"])
        batch["image1"] = device_color_jitter(k1, batch["image1"])
        return batch

    return augment
