"""Weight converter tests: name translation completeness + numeric parity of
the layout conventions against real torch layers."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.models import build_regression_net
from mapfree_tpu.tools.convert_weights import (
    convert_state_dict,
    flax_path_to_torch_key,
    transform_tensor,
)


def make_cfg(head="ProcrustesDeepResBlock", agg="CorrelationVolumeWarping",
             lam=1.0):
    c = default_cfg.clone()
    c.MODEL = "Regression"
    c.ENCODER.TYPE = "ResUNet"
    c.ENCODER.BLOCK_TYPE = 1
    c.ENCODER.NUM_BLOCKS = "1-1-1"
    c.ENCODER.NUM_OUT_LAYERS = 8
    c.AGGREGATOR.TYPE = agg
    c.AGGREGATOR.POSITION_ENCODER = True
    c.AGGREGATOR.MAX_SCORE_CHANNEL = True
    c.HEAD.TYPE = head
    c.HEAD.ADD_BASIS = True
    c.HEAD.AVG_POOL = True
    c.TRAINING.LAMBDA = lam
    c.TPU.COMPUTE_DTYPE = "float32"
    return c


def synthetic_torch_state(variables):
    """Build a torch-layout state_dict covering every flax leaf."""
    state = {}
    for collection, tree in variables.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for keypath, leaf in leaves:
            names = tuple(k.key for k in keypath)
            key = flax_path_to_torch_key(names)
            shape = list(leaf.shape)
            if names[-1] == "kernel":
                if len(shape) == 4:  # HWIO -> OIHW
                    shape = [shape[3], shape[2], shape[0], shape[1]]
                elif len(shape) == 2:
                    shape = [shape[1], shape[0]]
            rng = np.random.default_rng(abs(hash(key)) % 2**31)
            if key.endswith("running_var"):
                value = rng.uniform(0.5, 2.0, size=shape)  # must be positive
            else:
                value = rng.normal(size=shape) * 0.1
            state[key] = torch.from_numpy(value.astype(np.float32))
    return state


class TestNameTranslation:
    def test_representative_keys(self):
        cases = {
            ("encoder", "firstconv", "kernel"): "encoder.firstconv.weight",
            ("encoder", "firstbn", "scale"): "encoder.firstbn.weight",
            ("encoder", "firstbn", "mean"): "encoder.firstbn.running_mean",
            ("encoder", "encoder1", "block0", "bn1", "scale"):
                "encoder.encoder1.0.bn1.weight",
            ("encoder", "encoder2", "block1", "shortcut", "kernel"):
                "encoder.encoder2.1.shortcut.0.weight",
            ("encoder", "upconv4", "conv1", "conv", "kernel"):
                "encoder.upconv4.conv1.conv.weight",
            ("encoder", "upconv4", "conv1", "bn", "scale"):
                "encoder.upconv4.conv1.normalize.weight",
            ("encoder", "iconv4", "conv", "kernel"): "encoder.iconv4.conv.weight",
            ("encoder", "iconv4", "bn", "var"):
                "encoder.iconv4.normalize.running_var",
            ("head", "trunk", "resblock1", "conv1", "kernel"):
                "head.resblock1.conv1.weight",
            ("head", "mlp", "fc1", "kernel"): "head.mlp.0.weight",
            ("head", "mlp", "fc3", "bias"): "head.mlp.4.bias",
            ("aggregator", "Q_mlp", "kernel"): "aggregator.Q_mlp.weight",
            ("aggregator", "bin_score",): "bin_score",  # placeholder below
            ("s_r",): "s_r",
        }
        for path, expected in cases.items():
            if path == ("aggregator", "bin_score"):
                assert flax_path_to_torch_key(path) == "aggregator.bin_score"
            else:
                assert flax_path_to_torch_key(path) == expected, path

    @pytest.mark.parametrize("head,lam", [
        ("ProcrustesDeepResBlock", 1.0),
        ("ProcrustesResBlockMLP", 1.0),
        ("QuatDeepResBlock", 0.0),
        ("DirectDeepResBlockMLP", 1.0),
        ("AngularBinsDeepResBlockMLP", 1.0),
    ])
    def test_full_model_conversion(self, head, lam):
        cfg = make_cfg(head=head, lam=lam)
        net = build_regression_net(cfg)
        img = jnp.zeros((1, 32, 32, 3))
        variables = dict(net.init(jax.random.PRNGKey(0), img, img, train=False))

        state = synthetic_torch_state(variables)
        converted = convert_state_dict(
            {k: v.numpy() for k, v in state.items()}, variables)

        # every leaf filled with the right shape, and the forward runs
        orig_leaves = jax.tree.leaves(variables)
        new_leaves = jax.tree.leaves(converted)
        assert len(orig_leaves) == len(new_leaves)
        R, t, _ = net.apply(converted, img, img, train=False)
        assert np.all(np.isfinite(np.asarray(t)))

    def test_missing_tensor_raises(self):
        cfg = make_cfg()
        net = build_regression_net(cfg)
        img = jnp.zeros((1, 32, 32, 3))
        variables = dict(net.init(jax.random.PRNGKey(0), img, img, train=False))
        state = synthetic_torch_state(variables)
        state.pop("encoder.firstconv.weight")
        with pytest.raises(KeyError):
            convert_state_dict({k: v.numpy() for k, v in state.items()}, variables)


class TestNumericParity:
    """Converted torch layers must produce identical outputs in flax."""

    def test_conv_bn_relu_stride2(self):
        tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        tbn = torch.nn.BatchNorm2d(8)
        tbn.eval()
        with torch.no_grad():
            tbn.running_mean.normal_()
            tbn.running_var.uniform_(0.5, 2.0)
            tbn.weight.normal_()
            tbn.bias.normal_()

        x = np.random.default_rng(0).normal(size=(2, 10, 12, 3)).astype(np.float32)
        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
            ref = torch.relu(tbn(tconv(tx))).numpy().transpose(0, 2, 3, 1)

        class Mini(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Conv(8, (3, 3), strides=(2, 2), padding=1,
                            use_bias=False, name="conv")(x)
                x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, name="bn")(x)
                return nn.relu(x)

        net = Mini()
        variables = {
            "params": {
                "conv": {"kernel": transform_tensor(
                    tconv.weight.detach().numpy(), (3, 3, 3, 8), ("conv", "kernel"))},
                "bn": {"scale": tbn.weight.detach().numpy(),
                       "bias": tbn.bias.detach().numpy()},
            },
            "batch_stats": {
                "bn": {"mean": tbn.running_mean.numpy(),
                       "var": tbn.running_var.numpy()},
            },
        }
        out = np.asarray(net.apply(variables, jnp.asarray(x)))
        assert np.allclose(out, ref, atol=1e-5), np.abs(out - ref).max()

    def test_dense(self):
        tl = torch.nn.Linear(6, 4)
        x = np.random.default_rng(1).normal(size=(3, 6)).astype(np.float32)
        with torch.no_grad():
            ref = tl(torch.from_numpy(x)).numpy()
        kernel = transform_tensor(tl.weight.detach().numpy(), (6, 4), ("kernel",))
        out = x @ kernel + tl.bias.detach().numpy()
        assert np.allclose(out, ref, atol=1e-6)

    def test_maxpool_parity(self):
        """Stem maxpool: torch MaxPool2d(3, 2, padding=1) vs flax max_pool."""
        x = np.random.default_rng(2).normal(size=(1, 8, 8, 4)).astype(np.float32)
        with torch.no_grad():
            ref = torch.nn.functional.max_pool2d(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, padding=1
            ).numpy().transpose(0, 2, 3, 1)
        out = np.asarray(nn.max_pool(jnp.asarray(x), (3, 3), strides=(2, 2),
                                     padding=((1, 1), (1, 1))))
        assert np.allclose(out, ref, atol=1e-6)

    def test_bilinear_upsample_parity(self):
        """UpConv's align_corners=True bilinear vs torch F.interpolate."""
        from mapfree_tpu.models.blocks import _resize_bilinear_align_corners

        x = np.random.default_rng(3).normal(size=(1, 5, 7, 4)).astype(np.float32)
        with torch.no_grad():
            ref = torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
                mode="bilinear", align_corners=True,
            ).numpy().transpose(0, 2, 3, 1)
        out = np.asarray(_resize_bilinear_align_corners(jnp.asarray(x), (10, 14)))
        assert np.allclose(out, ref, atol=1e-5)
