"""In-graph monocular depth tests (SURVEY §6 north star; DEPTH_NET config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.models.depth import MonoDepthNet


def test_monodepth_forward_shapes():
    net = MonoDepthNet(num_blocks=(1, 1, 1), max_depth=10.0)
    x = jnp.zeros((2, 48, 64, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    d = net.apply(variables, x, train=False)
    assert d.shape == (2, 48, 64)
    d = np.asarray(d)
    assert np.isfinite(d).all()
    assert (d > 0).all() and (d <= 10.0).all()


def test_monodepth_uint8_parity():
    net = MonoDepthNet(num_blocks=(1, 1, 1))
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(f32))
    d1 = np.asarray(net.apply(variables, jnp.asarray(u8)))
    d2 = np.asarray(net.apply(variables, jnp.asarray(f32)))
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_matching_model_with_ingraph_depth():
    """Full matching pipeline with NO depth maps in the batch: the solver's
    depth comes from the (randomly initialised) depth net in-graph."""
    from mapfree_tpu.models.matching import FeatureMatchingModel

    cfg = default_cfg.clone()
    cfg.merge_from_file("configs/mapfree.yaml")
    cfg.merge_from_file("configs/matching/mapfree/sift_emat_ingraph.yaml")
    cfg.FEATURE_MATCHING = "SIFT"  # live SIFT: no precomputed npz needed
    cfg.SIFT.NUM_FEATURES = 256
    cfg.SIFT.RATIO_THRESHOLD = 0.9
    cfg.DATASET.HEIGHT = 64
    cfg.DATASET.WIDTH = 64
    cfg.DEPTH_NET.NUM_BLOCKS = "1-1-1"
    cfg.TPU.MAX_CORRESPONDENCES = 256
    cfg.TPU.RANSAC_ITERATIONS = 64

    pytest.importorskip("cv2")
    model = FeatureMatchingModel(cfg)
    assert model.depth_net is not None

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    batch = {
        "image0": img,
        "image1": img,
        "depth0": np.zeros((2, 0), np.float32),  # deliberately absent
        "depth1": np.zeros((2, 0), np.float32),
        "K_color0": np.tile(np.diag([100.0, 100.0, 1.0]), (2, 1, 1)),
        "K_color1": np.tile(np.diag([100.0, 100.0, 1.0]), (2, 1, 1)),
        "pair_id": [0, 1],
        "scene_id": ["a", "a"],
        "scene_root": ["", ""],
    }
    R, t, inl = model(batch)
    assert R.shape == (2, 3, 3) and t.shape == (2, 1, 3)
    # identical images: pose estimation itself may or may not succeed, but
    # the in-graph depth path must not raise and must produce arrays
    assert inl.shape == (2,)
