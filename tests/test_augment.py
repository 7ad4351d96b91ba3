"""On-device augmentation: math parity with the host transforms, per-image
randomness, and integration into the train step + DataModule uint8 path."""

import numpy as np

import jax
import jax.numpy as jnp

from mapfree_tpu.data.augment import (
    device_color_jitter,
    device_grayscale,
    make_device_augment,
)
from mapfree_tpu.data.io import grayscale3


def _img(shape=(2, 8, 6, 3), seed=0, dtype=np.uint8):
    rng = np.random.default_rng(seed)
    if dtype == np.uint8:
        return rng.integers(0, 256, size=shape, dtype=np.uint8)
    return rng.uniform(size=shape).astype(np.float32)


class TestGrayscale:
    def test_matches_host(self):
        img = _img()
        dev = np.asarray(device_grayscale(jnp.asarray(img)))
        host = grayscale3(img.astype(np.float32) / 255.0)
        np.testing.assert_allclose(dev, host, atol=1e-6)

    def test_channels_equal(self):
        out = np.asarray(device_grayscale(jnp.asarray(_img())))
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        np.testing.assert_array_equal(out[..., 1], out[..., 2])


class TestColorJitter:
    def test_zero_strength_is_normalise(self):
        img = _img()
        out = np.asarray(device_color_jitter(
            jax.random.PRNGKey(0), jnp.asarray(img),
            brightness=0.0, contrast=0.0, saturation=0.0))
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0,
                                   atol=1e-6)

    def test_bounds_and_dtype(self):
        out = device_color_jitter(jax.random.PRNGKey(1), jnp.asarray(_img()))
        assert out.dtype == jnp.float32
        o = np.asarray(out)
        assert o.min() >= 0.0 and o.max() <= 1.0

    def test_per_image_factors(self):
        # identical images in the batch must get DIFFERENT jitter
        one = _img(shape=(1, 8, 6, 3))
        img = np.concatenate([one, one], axis=0)
        out = np.asarray(device_color_jitter(jax.random.PRNGKey(2),
                                             jnp.asarray(img)))
        assert np.abs(out[0] - out[1]).max() > 1e-3

    def test_multiframe_leading_axes(self):
        # [B, F, H, W, 3]: every frame augmented independently
        one = _img(shape=(1, 1, 8, 6, 3))
        img = np.tile(one, (2, 3, 1, 1, 1))
        out = np.asarray(device_color_jitter(jax.random.PRNGKey(3),
                                             jnp.asarray(img)))
        assert out.shape == img.shape
        assert np.abs(out[0, 0] - out[0, 1]).max() > 1e-3

    def test_deterministic_in_key(self):
        img = jnp.asarray(_img())
        a = device_color_jitter(jax.random.PRNGKey(4), img)
        b = device_color_jitter(jax.random.PRNGKey(4), img)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_matches_host_math_at_fixed_factors(self):
        # with degenerate uniform ranges the factors are deterministic; the
        # remaining pipeline (scale -> contrast about mean -> saturation
        # about luma -> clip) must equal the host transform's with the same
        # factors (data/io.py color_jitter)
        img = _img(shape=(1, 8, 6, 3)).astype(np.float32) / 255.0

        class FixedRng:
            def __init__(self, vals):
                self.vals = list(vals)

            def uniform(self, lo, hi):
                return self.vals.pop(0)

        from mapfree_tpu.data.io import color_jitter

        # host draws b, c, s in order; device draws with independent keys —
        # force all three equal by zero-width strength intervals around
        # distinct points is impossible, so instead replicate the math here
        b, c, s = 1.2, 0.85, 1.3
        host_fn = color_jitter(FixedRng([b, c, s]))
        host = host_fn(img[0])
        out = img[0] * b
        mean = out.mean()
        out = (out - mean) * c + mean
        gray = out @ np.asarray([0.299, 0.587, 0.114], np.float32)
        out = np.clip((out - gray[..., None]) * s + gray[..., None], 0, 1)
        np.testing.assert_allclose(host, out, atol=1e-6)


class TestWiring:
    def test_make_device_augment_dispatch(self):
        from mapfree_tpu.config import cfg as default_cfg

        c = default_cfg.clone()
        assert make_device_augment(c) is None  # no augmentation requested
        c.DATASET.AUGMENTATION_TYPE = "colorjitter"
        fn = make_device_augment(c)
        assert fn is not None
        batch = {"image0": jnp.asarray(_img()), "image1": jnp.asarray(_img()),
                 "T_0to1": jnp.zeros((2, 4, 4))}
        out = fn(jax.random.PRNGKey(0), batch)
        assert out["image0"].dtype == jnp.float32
        assert "T_0to1" in out  # non-image keys pass through
        c.TPU.DEVICE_AUGMENT = False
        assert make_device_augment(c) is None
        c.TPU.DEVICE_AUGMENT = True
        c.DATASET.BLACK_WHITE = True
        out = make_device_augment(c)(jax.random.PRNGKey(0), batch)
        o = np.asarray(out["image1"])
        np.testing.assert_array_equal(o[..., 0], o[..., 2])

    def test_datamodule_keeps_uint8_path(self):
        from mapfree_tpu.config import cfg as default_cfg
        from mapfree_tpu.data.datamodule import DataModule

        c = default_cfg.clone()
        c.DATASET.DATA_SOURCE = "MapFree"
        c.DATASET.AUGMENTATION_TYPE = "colorjitter"
        dm = DataModule(c)
        assert dm._transforms() is None  # device augment owns it
        c.TPU.DEVICE_AUGMENT = False
        assert dm._transforms() is not None  # host fallback still exists

    def test_train_step_applies_augment(self):
        """With jitter on, two train steps from the same state+batch must see
        different augmented inputs (step-folded key), and loss stays finite."""
        from tests.test_train import make_batch, tiny_cfg

        from mapfree_tpu.models import build_regression_net
        from mapfree_tpu.train import init_state, make_train_step

        cfg = tiny_cfg()
        cfg.DATASET.AUGMENTATION_TYPE = "colorjitter"
        net = build_regression_net(cfg)
        batch = make_batch(B=4)
        # image values in [0,1] so clipping doesn't flatten the jitter
        batch["image0"] = jnp.abs(batch["image0"]) % 1.0
        batch["image1"] = jnp.abs(batch["image1"]) % 1.0
        state = init_state(net, cfg, jax.random.PRNGKey(0), batch)
        step = make_train_step(net, cfg, donate=False)
        state1, logs1 = step(state, batch)
        state2, logs2 = step(state1, batch)  # same batch, new step index
        assert np.isfinite(float(logs1["train/loss"]))
        assert np.isfinite(float(logs2["train/loss"]))
        # the augmentation (not the params) must differ between steps:
        # replay step 2 with state1's params but step index forced via state1
        # — different loss from logs1 on identical raw batch implies the
        # jitter actually varied with the step counter
        assert float(logs1["train/loss"]) != float(logs2["train/loss"])


def test_device_color_jitter_accepts_yuv420():
    """The train loader may ship packed planar YUV420 (half the bytes);
    the device augment must unpack it and produce (near-)identical jitter
    output to the RGB path — within the 4:2:0 chroma round-trip bound."""
    import jax
    import numpy as np

    from mapfree_tpu.data.augment import device_color_jitter
    from mapfree_tpu.data.io import decode_resize_batch, HAS_NATIVE_DECODER

    if not HAS_NATIVE_DECODER:
        import pytest

        pytest.skip("native decoder not built")
    import cv2
    import tempfile
    from pathlib import Path

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        # smooth photo-like content (worst-case noise chroma is bounded in
        # test_image_ops; here we pin the augment plumbing)
        base = rng.integers(0, 235, size=(12, 9, 3), dtype=np.uint8)
        img = cv2.resize(base, (48, 64), interpolation=cv2.INTER_CUBIC)
        p = str(Path(d) / "a.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        rgb = decode_resize_batch([p], 48, 64, uint8=True)
        yuv = decode_resize_batch([p], 48, 64, uint8=True, yuv420=True)

    key = jax.random.PRNGKey(3)
    out_rgb = np.asarray(device_color_jitter(key, rgb))
    out_yuv = np.asarray(device_color_jitter(key, yuv))
    assert out_yuv.shape == out_rgb.shape == (1, 64, 48, 3)
    assert np.abs(out_yuv - out_rgb).mean() < 0.02
