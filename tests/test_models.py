"""Model tests: encoders, aggregators, heads, composed net, all config variants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.models.aggregators import (
    Concat,
    CorrelationVolumeWarping,
    CorrelationVolumeWarpingQKV,
    aggregator_out_channels,
)
from mapfree_tpu.models.encoders import ResNet, ResUNet, encoder_out_channels
from mapfree_tpu.models.heads import build_head
from mapfree_tpu.models.regression import build_regression_net

H, W = 48, 32  # tiny spatial dims for fast CPU tests (must be /16 divisible)


def make_cfg(**overrides):
    c = default_cfg.clone()
    c.MODEL = "Regression"
    c.ENCODER.TYPE = "ResUNet"
    c.ENCODER.BLOCK_TYPE = 1
    c.ENCODER.NUM_BLOCKS = "1-1-1"
    c.ENCODER.NOT_CONCAT = False
    c.ENCODER.NUM_OUT_LAYERS = 16
    c.AGGREGATOR.TYPE = "CorrelationVolumeWarping"
    c.AGGREGATOR.POSITION_ENCODER = True
    c.AGGREGATOR.POSITION_ENCODER_IM1 = False
    c.AGGREGATOR.MAX_SCORE_CHANNEL = True
    c.HEAD.TYPE = "ProcrustesDeepResBlock"
    c.HEAD.ADD_BASIS = True
    c.HEAD.AVG_POOL = True
    c.TRAINING.LAMBDA = 1.0
    c.TPU.COMPUTE_DTYPE = "float32"
    for k, v in overrides.items():
        node = c
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return c


def init_and_apply(net, *inputs, train=False):
    variables = net.init(jax.random.PRNGKey(0), *inputs, train=train)
    out = net.apply(variables, *inputs, train=False)
    return variables, out


class TestEncoders:
    def test_resunet_shape(self):
        net = ResUNet(block_type=1, num_blocks=[1, 1, 1], num_out_layers=16)
        x = jnp.zeros((2, H, W, 3))
        _, y = init_and_apply(net, x)
        assert y.shape == (2, H // 4, W // 4, 16)

    def test_resunet_not_concat(self):
        net = ResUNet(block_type=0, num_blocks=[1, 1, 1], num_out_layers=8,
                      not_concat=True)
        x = jnp.zeros((1, H, W, 3))
        _, y = init_and_apply(net, x)
        assert y.shape == (1, H // 4, W // 4, 8)

    def test_resnet_shape(self):
        net = ResNet(block_type=0, num_blocks=[1, 1, 1])
        x = jnp.zeros((1, 64, 64, 3))
        _, y = init_and_apply(net, x)
        # stem /2, three stages with avg-pools: total /32 with stride pattern
        assert y.shape[0] == 1 and y.shape[-1] == 256


class TestAggregators:
    def _vols(self, c=8):
        k0, k1 = jax.random.split(jax.random.PRNGKey(1))
        vol0 = jax.random.normal(k0, (2, 6, 4, c))
        vol1 = jax.random.normal(k1, (2, 6, 4, c))
        return vol0, vol1

    def test_warping_shapes_and_channels(self):
        vol0, vol1 = self._vols()
        agg = CorrelationVolumeWarping(position_encoder=True, max_score_channel=True)
        _, out = init_and_apply(agg, vol0, vol1)
        assert out.shape == (2, 6, 4, 2 * 8 + 2 + 1)

    def test_warping_identity_on_orthogonal_features(self):
        """With orthogonal (one-hot) features per position, the softmax match
        distribution is a near-delta on the true correspondence, so the soft
        warp of an identical volume reproduces it."""
        vol0 = (jnp.eye(16) * 40.0).reshape(1, 4, 4, 16)
        agg = CorrelationVolumeWarping()
        _, out = init_and_apply(agg, vol0, vol0)
        f0, warped = out[..., :16], out[..., 16:32]
        assert np.allclose(np.asarray(f0), np.asarray(warped), atol=1e-3)

    def test_dustbin(self):
        vol0, vol1 = self._vols()
        agg = CorrelationVolumeWarping(dustbin=True, max_score_channel=True,
                                       position_encoder=True)
        variables, out = init_and_apply(agg, vol0, vol1)
        assert "bin_score" in variables["params"]
        assert out.shape == (2, 6, 4, 2 * 8 + 2 + 1)

    def test_cv_outlayers_and_upsample(self):
        vol0, vol1 = self._vols()
        agg = CorrelationVolumeWarping(position_encoder=True, upsample_pos_enc=4,
                                       cv_outlayers=6)
        _, out = init_and_apply(agg, vol0, vol1)
        assert out.shape == (2, 6, 4, 16 + 2 + 4 + 6)

    def test_half_channels_and_normalise(self):
        vol0, vol1 = self._vols()
        agg = CorrelationVolumeWarping(cv_half_channels=True, normalise_dot=True)
        _, out = init_and_apply(agg, vol0, vol1)
        assert out.shape == (2, 6, 4, 16)

    def test_qkv(self):
        vol0, vol1 = self._vols()
        agg = CorrelationVolumeWarpingQKV(position_encoder=True,
                                          max_score_channel=True, residual_att=True)
        _, out = init_and_apply(agg, vol0, vol1)
        assert out.shape == (2, 6, 4, 16 + 2 + 1)

    def test_concat(self):
        vol0, vol1 = self._vols()
        agg = Concat()
        _, out = init_and_apply(agg, vol0, vol1)
        assert out.shape == (2, 6, 4, 16)

    def test_out_channels_helper(self):
        c = make_cfg()
        assert aggregator_out_channels(c.AGGREGATOR, 16) == 32 + 2 + 1


HEAD_TYPES = [
    "ProcrustesResBlockMLP",
    "ProcrustesDeepResBlock",
    "QuatDeepResBlock",
    "DirectResBlockMLP",
    "DirectDeepResBlockMLP",
    "AngularBinsDeepResBlockMLP",
]


class TestHeads:
    @pytest.mark.parametrize("head_type", HEAD_TYPES)
    def test_head_outputs_valid_pose(self, head_type):
        c = make_cfg(**{"HEAD.TYPE": head_type})
        head = build_head(c)
        fv = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 16))
        _, (R, t, aux) = init_and_apply(head, fv)
        assert R.shape == (2, 3, 3)
        assert t.shape == (2, 1, 3)
        R = np.asarray(R, np.float64)
        # R must be a valid rotation
        assert np.allclose(R @ np.swapaxes(R, 1, 2), np.eye(3), atol=1e-3)
        assert np.allclose(np.linalg.det(R), 1.0, atol=1e-3)

    def test_quat_head_aux(self):
        c = make_cfg(**{"HEAD.TYPE": "QuatDeepResBlock", "HEAD.SEPARATE_SCALE": True})
        head = build_head(c)
        fv = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 16))
        _, (R, t, aux) = init_and_apply(head, fv)
        assert set(aux) >= {"q", "t_direction", "scale"}
        # t = scale * unit direction
        assert np.allclose(
            np.asarray(t), np.asarray(aux["scale"] * aux["t_direction"]), atol=1e-6
        )

    def test_bins_head_aux(self):
        c = make_cfg(**{"HEAD.TYPE": "AngularBinsDeepResBlockMLP",
                        "HEAD.SEPARATE_SCALE": True})
        head = build_head(c)
        fv = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 16))
        _, (R, t, aux) = init_and_apply(head, fv)
        assert aux["R_bins"].shape == (2, 900)
        assert aux["t_sph_phi"].shape == (2, 360)
        assert aux["t_sph_theta"].shape == (2, 180)


class TestRegressionNet:
    def test_forward(self):
        c = make_cfg()
        net = build_regression_net(c)
        img0 = jnp.zeros((2, H, W, 3))
        img1 = jnp.zeros((2, H, W, 3))
        variables, (R, t, aux) = init_and_apply(net, img0, img1)
        assert R.shape == (2, 3, 3) and t.shape == (2, 1, 3)
        assert "batch_stats" in variables

    def test_multiframe_uses_last_frame(self):
        c = make_cfg(MODEL="RegressionMultiFrame")
        net = build_regression_net(c)
        img0 = jnp.zeros((1, H, W, 3))
        rng = jax.random.PRNGKey(0)
        frames = jax.random.normal(rng, (1, 3, H, W, 3))
        variables = net.init(jax.random.PRNGKey(0), img0, frames)
        R1, t1, _ = net.apply(variables, img0, frames)
        # changing non-final frames must not change the output
        frames2 = frames.at[:, 0].set(0.0)
        R2, t2, _ = net.apply(variables, img0, frames2)
        assert np.allclose(np.asarray(R1), np.asarray(R2))
        assert np.allclose(np.asarray(t1), np.asarray(t2))

    def test_kendall_weights_present(self):
        c = make_cfg(**{"TRAINING.LAMBDA": 0.0})
        net = build_regression_net(c)
        img = jnp.zeros((1, H, W, 3))
        variables = net.init(jax.random.PRNGKey(0), img, img)
        assert "s_r" in variables["params"] and "s_t" in variables["params"]

    def test_encoder_weight_sharing(self):
        """Swapping the two input images must transpose the learned mapping —
        i.e. both views go through the same encoder weights."""
        c = make_cfg()
        net = build_regression_net(c)
        k0, k1 = jax.random.split(jax.random.PRNGKey(7))
        img0 = jax.random.normal(k0, (1, H, W, 3))
        img1 = jax.random.normal(k1, (1, H, W, 3))
        variables = net.init(jax.random.PRNGKey(0), img0, img1)
        params = variables["params"]
        # single encoder parameter subtree (not one per view)
        encoder_keys = [k for k in params if "encoder" in k.lower()]
        assert len(encoder_keys) == 1
