"""Full-forward weight-conversion parity against the ACTUAL reference torch
modules (VERDICT r1 item 5).

Imports the reference implementation read-only from /root/reference (its
regression modules depend only on torch + kornia, the latter stubbed: it is
only called by quaternion heads, which are not under test here), builds the
3d3d architecture (reference config/regression/mapfree/3d3d.yaml) with random
torch weights, converts the state_dict with tools/convert_weights.py, and
asserts the flax forward reproduces the torch R, t to float32 tolerance.

This closes SURVEY build-plan step 5 on the real module graph (reference
lib/models/regression/model.py:64-73), not just per-layer layouts.
"""

import sys
import types
from pathlib import Path
from types import SimpleNamespace as NS

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = Path("/root/reference")
if not REFERENCE.exists():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)


def _install_kornia_stub():
    """The reference head module imports kornia at module level but only the
    quaternion heads call it; this image does not ship kornia."""
    if "kornia" in sys.modules:
        return
    conv = types.ModuleType("kornia.geometry.conversions")

    def quaternion_to_rotation_matrix(q):  # pragma: no cover
        raise NotImplementedError("kornia stub: quaternion heads not under test")

    conv.quaternion_to_rotation_matrix = quaternion_to_rotation_matrix
    geometry = types.ModuleType("kornia.geometry")
    geometry.conversions = conv
    kornia = types.ModuleType("kornia")
    kornia.geometry = geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.conversions"] = conv


def _install_transforms3d_stub():
    """lib/utils/rotationutils.py imports transforms3d at module level; this
    image does not ship it. The framework's own quaternion library implements
    the same wxyz-convention operations."""
    if "transforms3d" in sys.modules:
        return
    from mapfree_tpu.geom.quaternion import qinverse, qmult, rotate_vector

    quaternions = types.ModuleType("transforms3d.quaternions")
    quaternions.qmult = qmult
    quaternions.qinverse = qinverse
    quaternions.rotate_vector = rotate_vector
    transforms3d = types.ModuleType("transforms3d")
    transforms3d.quaternions = quaternions
    sys.modules["transforms3d"] = transforms3d
    sys.modules["transforms3d.quaternions"] = quaternions


_install_kornia_stub()
_install_transforms3d_stub()
if str(REFERENCE) not in sys.path:
    sys.path.insert(0, str(REFERENCE))

from lib.models.regression.aggregator import (  # noqa: E402
    CorrelationVolumeWarping as TorchCVW,
    CorrelationVolumeWarpingQKV as TorchQKV,
)
from lib.models.regression.encoder.resunet import ResUNet as TorchResUNet  # noqa: E402
from lib.models.regression.head import (  # noqa: E402
    ProcrustesDeepResBlock as TorchProcrustesHead,
)

from mapfree_tpu.config import cfg as default_cfg  # noqa: E402
from mapfree_tpu.models import build_regression_net  # noqa: E402
from mapfree_tpu.tools.convert_weights import convert_state_dict  # noqa: E402

H = W = 96  # smaller than train res; architecture identical to 3d3d


def flax_cfg(dustbin=False, qkv=False):
    c = default_cfg.clone()
    c.merge_from_file("configs/mapfree.yaml")
    c.merge_from_file("configs/regression/mapfree/3d3d.yaml")
    c.DATASET.HEIGHT = H
    c.DATASET.WIDTH = W
    c.TPU.COMPUTE_DTYPE = "float32"
    c.TPU.FUSED_CORRELATION = False
    if dustbin:
        c.AGGREGATOR.DUSTBIN = True
    if qkv:
        c.AGGREGATOR.TYPE = "CorrelationVolumeWarpingQKV"
    return c


def torch_model(cfg):
    """The reference RegressionModel's three submodules, wired exactly as its
    forward does (reference model.py:22-51, 64-73)."""
    enc_cfg = NS(
        BLOCK_TYPE=cfg.ENCODER.BLOCK_TYPE,
        NUM_BLOCKS=cfg.ENCODER.NUM_BLOCKS,
        NOT_CONCAT=bool(cfg.ENCODER.NOT_CONCAT),
        NUM_OUT_LAYERS=cfg.ENCODER.NUM_OUT_LAYERS,
    )
    agg_cfg = NS(
        POSITION_ENCODER=bool(cfg.AGGREGATOR.POSITION_ENCODER),
        POSITION_ENCODER_IM1=bool(cfg.AGGREGATOR.POSITION_ENCODER_IM1),
        MAX_SCORE_CHANNEL=bool(cfg.AGGREGATOR.MAX_SCORE_CHANNEL),
        CV_OUTLAYERS=int(cfg.AGGREGATOR.CV_OUTLAYERS),
        CV_HALF_CHANNELS=bool(cfg.AGGREGATOR.CV_HALF_CHANNELS),
        UPSAMPLE_POS_ENC=int(cfg.AGGREGATOR.UPSAMPLE_POS_ENC),
        DUSTBIN=bool(cfg.AGGREGATOR.DUSTBIN),
        NORMALISE_DOT=bool(cfg.AGGREGATOR.NORMALISE_DOT),
        RESIDUAL_ATT=bool(cfg.AGGREGATOR.RESIDUAL_ATT),
    )
    head_cfg = NS(
        DATASET=NS(HEIGHT=H, WIDTH=W),
        HEAD=NS(
            BATCH_NORM=bool(cfg.HEAD.BATCH_NORM),
            AVG_POOL=bool(cfg.HEAD.AVG_POOL),
            ADD_BASIS=bool(cfg.HEAD.ADD_BASIS),
            NUM_PTS=int(cfg.HEAD.NUM_PTS),
        ),
    )

    torch.manual_seed(0)
    encoder = TorchResUNet(enc_cfg)
    agg_cls = TorchQKV if cfg.AGGREGATOR.TYPE.endswith("QKV") else TorchCVW
    aggregator = agg_cls(agg_cfg, encoder.num_out_layers)
    head = TorchProcrustesHead(head_cfg, aggregator.num_out_layers)
    for m in (encoder, aggregator, head):
        m.eval()
    return encoder, aggregator, head


def run_torch(encoder, aggregator, head, im0, im1):
    with torch.no_grad():
        vol0 = encoder(torch.from_numpy(im0))
        vol1 = encoder(torch.from_numpy(im1))
        gv = aggregator(vol0, vol1)
        R, t = head(gv, data=None)
    return R.numpy(), t.numpy()


def combined_state_dict(encoder, aggregator, head):
    state = {}
    for prefix, module in (("encoder", encoder), ("aggregator", aggregator),
                           ("head", head)):
        for k, v in module.state_dict().items():
            state[f"{prefix}.{k}"] = v.numpy()
    return state


@pytest.mark.parametrize("variant", ["3d3d", "dustbin", "qkv"])
def test_full_forward_parity(variant):
    import jax

    cfg = flax_cfg(dustbin=variant == "dustbin", qkv=variant == "qkv")
    encoder, aggregator, head = torch_model(cfg)

    rng = np.random.default_rng(1)
    B = 2
    im_nchw0 = rng.normal(size=(B, 3, H, W)).astype(np.float32)
    im_nchw1 = rng.normal(size=(B, 3, H, W)).astype(np.float32)

    # materialise the head's LazyLinear before reading the state_dict
    R_torch, t_torch = run_torch(encoder, aggregator, head, im_nchw0, im_nchw1)

    net = build_regression_net(cfg)
    im0 = np.transpose(im_nchw0, (0, 2, 3, 1))
    im1 = np.transpose(im_nchw1, (0, 2, 3, 1))
    variables = net.init(jax.random.PRNGKey(0), im0, im1, train=False)
    converted = convert_state_dict(combined_state_dict(encoder, aggregator, head),
                                   variables)
    R_flax, t_flax, _ = net.apply(converted, im0, im1, train=False)
    R_flax = np.asarray(R_flax)
    t_flax = np.asarray(t_flax).reshape(t_torch.shape)

    # float32 forward through ~60 layers + SVD: agreement to ~1e-4
    np.testing.assert_allclose(R_flax, R_torch, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(t_flax, t_torch, atol=2e-4, rtol=1e-3)
