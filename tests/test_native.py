"""Native C++ batch decoder tests (skipped when the extension isn't built)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
mapfree_native = pytest.importorskip("mapfree_native")

from mapfree_tpu.data.io import decode_resize_batch  # noqa: E402


@pytest.fixture
def jpegs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = rng.integers(0, 255, size=(97, 131, 3), dtype=np.uint8)
        p = tmp_path / f"im{i}.jpg"
        cv2.imwrite(str(p), img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(str(p))
    return paths


def test_matches_cv2_pipeline(jpegs):
    out = mapfree_native.decode_resize_batch(jpegs, 64, 48)
    assert out.shape == (4, 48, 64, 3)
    assert out.dtype == np.float32
    ref = np.stack([
        cv2.resize(cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB), (64, 48))
        .astype(np.float32) / 255
        for p in jpegs
    ])
    assert np.abs(out - ref).max() < 0.01  # resize rounding differences only


def test_missing_file_zero_filled(jpegs):
    with pytest.warns(RuntimeWarning):
        out = mapfree_native.decode_resize_batch(
            jpegs[:1] + ["/nonexistent.jpg"], 32, 32)
    assert np.all(out[1] == 0)
    assert out[0].max() > 0


def test_io_wrapper(jpegs):
    out = decode_resize_batch(jpegs, 64, 48)
    assert out.shape == (4, 48, 64, 3)
