"""YUV420 transfer-path tests (ops/image.py + loader/model wiring).

The submission sweep ships eval batches as planar YUV420 uint8 — half the
host->device bytes of uint8 RGB (reference submission.py:33-58 ships full
float tensors per pair) — and unpacks on device. These tests pin:
  * the host packer <-> on-device unpacker roundtrip error bound,
  * the native decoder's yuv420 output against the host oracle,
  * model forward equality between the RGB and YUV420 input formats,
  * the ConcatDataset fast path producing YUV batches that decode to the
    same images as the uint8-RGB fast path.
"""

import numpy as np
import pytest

from mapfree_tpu.ops.image import yuv420_pack_host, yuv420_to_rgb


def _smooth_rgb(n, h, w, seed=0):
    """Band-limited mid-range random images: no [0,1] clipping anywhere (the
    YCbCr->RGB inverse is exact only off the gamut boundary) and gradients
    gentle enough that 4:2:0 chroma subsampling loses almost nothing."""
    import cv2

    rng = np.random.default_rng(seed)
    x = 0.2 + 0.6 * rng.random((n, h, w, 3)).astype(np.float32)
    return np.stack([cv2.GaussianBlur(s, (0, 0), 4.0) for s in x])


class TestPackUnpackRoundtrip:
    def test_shapes_and_dtype(self):
        rgb = np.zeros((2, 48, 64, 3), np.float32)
        packed = yuv420_pack_host(rgb)
        assert packed.shape == (2, 72, 64) and packed.dtype == np.uint8
        out = np.asarray(yuv420_to_rgb(packed))
        assert out.shape == (2, 48, 64, 3)

    def test_roundtrip_smooth_images(self):
        pytest.importorskip("cv2")
        rgb = _smooth_rgb(3, 48, 64)
        out = np.asarray(yuv420_to_rgb(yuv420_pack_host(rgb)))
        # 8-bit quantisation + 4:2:0 box-down/linear-up on smooth content
        # (measured 0.006/0.0013 at sigma=4; bounds leave 2x headroom)
        assert np.abs(out - rgb).max() < 0.012
        assert np.abs(out - rgb).mean() < 0.003

    def test_roundtrip_noise_images_bounded(self):
        # mid-range white noise: chroma is lost but luma must survive, since
        # off the gamut boundary the JFIF inverse reproduces Y exactly up to
        # 8-bit quantisation (measured max 0.002)
        rng = np.random.default_rng(1)
        rgb = (0.2 + 0.6 * rng.random((2, 32, 32, 3))).astype(np.float32)
        out = np.asarray(yuv420_to_rgb(yuv420_pack_host(rgb)))
        y_in = rgb @ np.array([0.299, 0.587, 0.114], np.float32)
        y_out = out @ np.array([0.299, 0.587, 0.114], np.float32)
        assert np.abs(y_out - y_in).max() < 0.004

    def test_grayscale_exact_chroma(self):
        """Grayscale input has constant chroma (128): roundtrip is pure 8-bit
        luma quantisation, independent of the upsampler."""
        g = np.linspace(0, 1, 37 * 2, dtype=np.float32)
        rgb = np.tile(g[None, :, None, None], (1, 1, 64, 3))
        out = np.asarray(yuv420_to_rgb(yuv420_pack_host(rgb)))
        assert np.abs(out - rgb).max() < 2.5 / 255.0

    def test_batch_leading_dims(self):
        rgb = np.random.default_rng(2).random((2, 3, 16, 16, 3)).astype(np.float32)
        packed = yuv420_pack_host(rgb.reshape(6, 16, 16, 3)).reshape(2, 3, 24, 16)
        out = np.asarray(yuv420_to_rgb(packed))
        assert out.shape == (2, 3, 16, 16, 3)
        flat = np.asarray(yuv420_to_rgb(packed.reshape(6, 24, 16)))
        np.testing.assert_array_equal(out.reshape(6, 16, 16, 3), flat)


class TestNativeYuv420:
    @pytest.fixture
    def jpegs(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        paths = []
        for i, img in enumerate(_smooth_rgb(3, 96, 128, seed=7)):
            p = tmp_path / f"im{i}.jpg"
            cv2.imwrite(str(p), cv2.cvtColor(
                (img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
            paths.append(str(p))
        return paths

    def test_native_matches_host_oracle(self, jpegs):
        mapfree_native = pytest.importorskip("mapfree_native")
        packed = mapfree_native.decode_resize_batch(jpegs, 64, 48, yuv420=True)
        assert packed.shape == (3, 72, 64) and packed.dtype == np.uint8
        rgb = mapfree_native.decode_resize_batch(jpegs, 64, 48)
        oracle = yuv420_pack_host(rgb)
        # same resized pixels through two RGB<->YCbCr conversions + chroma
        # filters that differ only in rounding; the mean bound is the primary
        # fidelity check — the max bound is loose because it encodes the
        # installed libjpeg build's chroma upsampling/rounding (measured <= 4
        # on libjpeg-turbo in this image; a library upgrade may shift it)
        assert np.abs(packed.astype(np.int16) - oracle.astype(np.int16)).max() <= 8
        assert np.abs(packed.astype(np.float32) - oracle).mean() < 1.0

    def test_io_wrapper_yuv(self, jpegs):
        from mapfree_tpu.data.io import decode_resize_batch

        packed = decode_resize_batch(jpegs, 64, 48, yuv420=True)
        assert packed.shape == (3, 72, 64) and packed.dtype == np.uint8
        rgb = decode_resize_batch(jpegs, 64, 48)
        out = np.asarray(yuv420_to_rgb(packed))
        assert np.abs(out - rgb).max() < 0.1  # JPEG chroma was 4:2:0 on disk
        assert np.abs(out - rgb).mean() < 0.01


class TestModelYuvInput:
    def test_forward_matches_rgb_path(self):
        """RegressionNet(yuv420 batch) == RegressionNet(unpacked RGB batch):
        the rank-3 branch in models/regression.py:49-61 must be the only
        difference between the two input formats."""
        import jax
        import jax.numpy as jnp

        from mapfree_tpu.config import cfg as _cfg
        from mapfree_tpu.config import config_merge_from_file
        from mapfree_tpu.models.builder import build_regression_net

        cfg = _cfg.clone()
        config_merge_from_file(cfg, "configs/regression/mapfree/3d3d.yaml")
        cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH = 32, 32
        cfg.TPU.COMPUTE_DTYPE = "float32"
        net = build_regression_net(cfg)

        rng = np.random.default_rng(3)
        pk0 = yuv420_pack_host(rng.random((2, 32, 32, 3)).astype(np.float32))
        pk1 = yuv420_pack_host(rng.random((2, 32, 32, 3)).astype(np.float32))
        rgb0, rgb1 = yuv420_to_rgb(pk0), yuv420_to_rgb(pk1)

        variables = net.init(jax.random.PRNGKey(0), rgb0, rgb1, False)
        f = jax.jit(lambda v, a, b: net.apply(v, a, b, False))
        out_yuv = f(variables, jnp.asarray(pk0), jnp.asarray(pk1))
        out_rgb = f(variables, rgb0, rgb1)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5),
            out_yuv, out_rgb)


class TestDatasetYuvBatch:
    def test_getbatch_yuv_decodes_to_rgb_batch(self, tmp_path):
        pytest.importorskip("cv2")
        from tests.fixtures import make_scene
        from mapfree_tpu.config import cfg as _cfg
        from mapfree_tpu.config import config_merge_from_file
        from mapfree_tpu.data.mapfree import MapFreeDataset

        make_scene(tmp_path / "val" / "s00000", n_queries=25, seed=0)
        cfg = _cfg.clone()
        config_merge_from_file(cfg, "configs/mapfree.yaml")
        cfg.DATASET.DATA_ROOT = str(tmp_path)
        # small even dims (yuv420 only needs evenness): decoding the fixture
        # JPEGs at the production 540x720 costs seconds of suite wall-clock
        cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH = 72, 54
        ds = MapFreeDataset(cfg, "val")
        idx = [0, 1, 2, 3]

        ds.yuv420_transfer = False
        rgb = ds.getbatch(idx)
        ds.yuv420_transfer = True
        ds._decode_cache.clear()
        yuv = ds.getbatch(idx)
        assert yuv is not None and rgb is not None

        assert yuv["image1"].ndim == 3  # packed planar
        h = rgb["image1"].shape[1]
        assert yuv["image1"].shape[1] == h + h // 2

        # the fixture scenes are full-range noise JPEGs decoded at native
        # resolution — the worst case for 4:2:0 (no resize smoothing, every
        # 2x2 block has full-scale chroma variance; measured mean ~0.023).
        # Real photographs sit far below this; isolated saturated pixels
        # legitimately lose full-scale chroma, so assert on mean error and
        # the fraction of badly-off pixels instead of max
        for key in ("image1", "image0_unique"):
            un = np.asarray(yuv420_to_rgb(yuv[key]))
            ref = rgb[key].astype(np.float32) / 255.0
            err = np.abs(un - ref)
            assert err.mean() < 0.03
            assert (err.max(axis=-1) > 0.25).mean() < 0.01  # <1% of pixels
        np.testing.assert_array_equal(yuv["ref_idx"], rgb["ref_idx"])

    def test_cache_keys_keep_formats_apart(self, tmp_path):
        """Alternating formats on one dataset instance must never serve a
        cached ref frame in the wrong layout (the ('yuv', path) key)."""
        pytest.importorskip("cv2")
        from tests.fixtures import make_scene
        from mapfree_tpu.config import cfg as _cfg
        from mapfree_tpu.config import config_merge_from_file
        from mapfree_tpu.data.mapfree import MapFreeDataset

        make_scene(tmp_path / "val" / "s00000", n_queries=25, seed=1)
        cfg = _cfg.clone()
        config_merge_from_file(cfg, "configs/mapfree.yaml")
        cfg.DATASET.DATA_ROOT = str(tmp_path)
        cfg.DATASET.HEIGHT, cfg.DATASET.WIDTH = 72, 54  # see above
        ds = MapFreeDataset(cfg, "val")

        ds.yuv420_transfer = True
        first = ds.getbatch([0, 1])          # populates ('yuv', ref) cache
        ds.yuv420_transfer = False
        second = ds.getbatch([2, 3])         # must NOT reuse the yuv entry
        assert first["image0_unique"].ndim == 3
        assert second["image0_unique"].ndim == 4
