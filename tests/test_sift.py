"""TPU-native SIFT tests: detection on synthetic patterns, descriptor
matchability under translation, fixed-shape contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapfree_tpu.ops.matching import mutual_2nn_ratio_match
from mapfree_tpu.ops.sift import root_sift, sift_detect_describe

rng = np.random.default_rng(21)


def checkerboard_with_blobs(H=128, W=128, n_blobs=25, seed=0):
    """Textured image with strong blob features at known positions."""
    local = np.random.default_rng(seed)
    img = local.uniform(0.35, 0.65, size=(H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    centers = []
    for _ in range(n_blobs):
        cy, cx = local.uniform(16, H - 16), local.uniform(16, W - 16)
        r = local.uniform(2.0, 4.0)
        sign = 1.0 if local.uniform() > 0.5 else -1.0
        img += sign * 0.5 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))
        centers.append((cx, cy))
    return np.clip(img, 0, 1), np.array(centers)


class TestSIFT:
    def test_fixed_shape_contract(self):
        img, _ = checkerboard_with_blobs()
        out = sift_detect_describe(jnp.asarray(img[None]), num_features=256,
                                   num_octaves=3)
        assert out["keypoints"].shape == (1, 256, 2)
        assert out["descriptors"].shape == (1, 256, 128)
        assert out["mask"].shape == (1, 256)
        assert bool(out["mask"].any())
        # descriptors are L2-normalised where valid
        norms = np.linalg.norm(np.asarray(out["descriptors"][0]), axis=-1)
        valid = np.asarray(out["mask"][0])
        assert np.allclose(norms[valid], 1.0, atol=1e-3)

    def test_detects_blob_locations(self):
        img, centers = checkerboard_with_blobs(n_blobs=12, seed=3)
        out = sift_detect_describe(jnp.asarray(img[None]), num_features=128,
                                   num_octaves=3)
        kp = np.asarray(out["keypoints"][0])[np.asarray(out["mask"][0])]
        # most blob centers must have a detected keypoint within a few pixels
        found = 0
        for cx, cy in centers:
            d = np.linalg.norm(kp - np.array([cx, cy]), axis=1)
            if d.min() < 4.0:
                found += 1
        assert found >= len(centers) * 0.6, f"{found}/{len(centers)} blobs found"

    def test_translation_matching(self):
        """Keypoints from a translated copy must match back with the correct
        displacement for the majority of correspondences."""
        img, _ = checkerboard_with_blobs(n_blobs=20, seed=5)
        dy, dx = 6, 9
        img2 = np.roll(np.roll(img, dy, axis=0), dx, axis=1)

        batch = jnp.asarray(np.stack([img, img2]))
        out = sift_detect_describe(batch, num_features=256, num_octaves=3)
        d0 = root_sift(out["descriptors"][0:1])
        d1 = root_sift(out["descriptors"][1:2])
        idx1, ok = mutual_2nn_ratio_match(
            d0, d1, out["mask"][0:1], out["mask"][1:2], 0.8)
        idx1 = np.asarray(idx1[0])
        ok = np.asarray(ok[0])
        assert ok.sum() >= 10, f"only {ok.sum()} matches"

        kp0 = np.asarray(out["keypoints"][0])
        kp1 = np.asarray(out["keypoints"][1])
        disp = kp1[idx1[ok]] - kp0[ok]
        err = np.linalg.norm(disp - np.array([dx, dy]), axis=1)
        inlier_rate = (err < 3.0).mean()
        assert inlier_rate > 0.5, f"inlier rate {inlier_rate:.2f}"

    def test_empty_image_no_valid_keypoints(self):
        img = np.full((1, 96, 96), 0.5, np.float32)
        out = sift_detect_describe(jnp.asarray(img), num_features=64,
                                   num_octaves=2)
        assert int(out["mask"].sum()) == 0


def test_repeatability_floor():
    """Regression guard for docs/SIFT_ACCURACY.md: TPU SIFT repeatability on
    a 15-degree rotation of a textured image must stay at OpenCV level
    (measured 0.91 vs cv2's 0.65/0.58 native/equal-count on the full-size
    protocol; floor set with slack for this smaller test image)."""
    cv2 = pytest.importorskip("cv2")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.sift_benchmark import (
        detect_tpu,
        make_texture,
        repeatability,
        warp_homographies,
    )

    img = make_texture(seed=1, H=240, W=320)
    Hm = warp_homographies(*img.shape)["rot15"]
    warped = cv2.warpPerspective(img, Hm, img.shape[::-1])
    pA, _, _ = detect_tpu(img)
    pB, _, _ = detect_tpu(warped)
    rep, n = repeatability(pA, pB, Hm, *img.shape)
    assert n > 50, f"too few comparable keypoints ({n})"
    assert rep > 0.55, f"repeatability regressed: {rep:.3f}"
