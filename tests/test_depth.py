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
    cfg.DEPTH_NET.ALLOW_RANDOM = True  # untrained weights: smoke only
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


def test_depth_net_without_checkpoint_fails_loudly():
    """DEPTH_NET.ENABLED with no CHECKPOINT must refuse to run (random
    depth corrupts metric scale while looking healthy — VERDICT r4 #6);
    ALLOW_RANDOM is the explicit test-only escape hatch."""
    from mapfree_tpu.models.depth import DepthPredictor

    cfg = default_cfg.clone()
    cfg.DEPTH_NET.ENABLED = True
    cfg.DEPTH_NET.NUM_BLOCKS = "1-1-1"
    cfg.DATASET.HEIGHT = 32
    cfg.DATASET.WIDTH = 32
    with pytest.raises(ValueError, match="ALLOW_RANDOM"):
        DepthPredictor(cfg)
    cfg.DEPTH_NET.ALLOW_RANDOM = True
    DepthPredictor(cfg)  # explicit opt-in works


def test_train_depth_recipe_end_to_end(tmp_path):
    """tools/train_depth.py: GT-supervised training on synthetic scenes ->
    orbax checkpoint -> DepthPredictor loads it -> finite positive depth,
    and the trained net fits the (constant-ish) GT depth better than the
    random init (VERDICT r4 missing #3: the recipe that makes *_ingraph
    configs a real capability; reference analog README.md:325-339)."""
    import jax.numpy as jnp
    from fixtures import make_scene
    from mapfree_tpu.models.depth import DepthPredictor, MonoDepthNet
    from mapfree_tpu.tools.train_depth import depth_loss, train

    for i in range(2):
        make_scene(tmp_path / "train" / f"s{i}", n_queries=6, img_hw=(32, 32),
                   train=True, seed=i, depth_suffix="gt")

    cfg = default_cfg.clone()
    cfg.DATASET.DATA_SOURCE = "MapFree"
    cfg.DATASET.HEIGHT = 32
    cfg.DATASET.WIDTH = 32
    cfg.DATASET.MIN_OVERLAP_SCORE = 0.0
    cfg.DATASET.MAX_OVERLAP_SCORE = 1.0
    cfg.DEPTH_NET.NUM_BLOCKS = "1-1-1"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TRAINING.NUM_WORKERS = 1

    out, final_loss = train(cfg, str(tmp_path), "gt", str(tmp_path / "ckpt"),
                            steps=12, batch=4, lr=1e-2, log_every=4)
    assert np.isfinite(final_loss)

    cfg.DEPTH_NET.ENABLED = True
    cfg.DEPTH_NET.CHECKPOINT = str(out)
    pred = DepthPredictor(cfg)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    d = np.asarray(pred(imgs))
    assert d.shape == (2, 32, 32)
    assert np.isfinite(d).all() and (d > 0).all()

    # trained weights fit the GT depth range better than random init
    from mapfree_tpu.data import MapFreeDataset

    cfg2 = cfg.clone()
    cfg2.DATASET.DATA_ROOT = str(tmp_path)
    cfg2.DATASET.ESTIMATED_DEPTH = "gt"
    ds = MapFreeDataset(cfg2, "train")
    s = ds[0]
    gt = jnp.asarray(s["depth0"][None])
    img = jnp.asarray(np.asarray(s["image0"])[None])
    net = MonoDepthNet(num_blocks=(1, 1, 1), max_depth=float(cfg.DEPTH_NET.MAX_DEPTH))
    rand_vars = net.init(jax.random.PRNGKey(0), img)
    loss_rand = float(depth_loss(net.apply(rand_vars, img), gt))
    loss_trained = float(depth_loss(pred._predict(img), gt))
    assert loss_trained < loss_rand
