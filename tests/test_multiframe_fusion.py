"""Multi-frame fusion model tests (VERDICT r1 item 7).

The reference's MultiFrame model consumes only the LAST query frame
(reference lib/models/regression/model.py:240-241); the fusion model encodes
all F frames in one dispatch and chains per-frame estimates through the
device tracking. These tests pin:
- exact consistency: perfect per-frame predictions fuse to the exact GT;
- noise averaging: fusing F noisy estimates beats using only the last one;
- the full flax module trains (loss decreases) on synthetic multi-frame
  batches and runs through init/train/predict.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapfree_tpu.config import cfg as default_cfg
from mapfree_tpu.geom.quaternion import mat2quat, qinverse, quat2mat
from mapfree_tpu.models import build_regression_net
from mapfree_tpu.models.regression import fuse_frame_poses

rng = np.random.default_rng(5)


def random_quat(scale=1.0):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    th = rng.uniform(0.1, 0.7) * scale
    return np.concatenate([[np.cos(th / 2)], axis * np.sin(th / 2)])


def make_gt(B=3, F=5):
    """Random ref pose + F query poses (w2c); returns per-frame GT relative
    poses T_ref->f and the device (absolute query) poses."""
    R_ref = np.stack([quat2mat(random_quat()) for _ in range(B)])
    t_ref = rng.normal(size=(B, 3))
    q_dev = np.stack([[random_quat() for _ in range(F)] for _ in range(B)])
    t_dev = rng.normal(size=(B, F, 3))

    R_rel = np.zeros((B, F, 3, 3))
    t_rel = np.zeros((B, F, 3))
    for b in range(B):
        for f in range(F):
            R_f = quat2mat(q_dev[b, f])
            R_rel[b, f] = R_f @ R_ref[b].T
            t_rel[b, f] = t_dev[b, f] - R_rel[b, f] @ t_ref[b]
    return R_rel, t_rel, q_dev, t_dev


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def test_fusion_exact_consistency():
    """Perfect per-frame predictions + perfect tracking -> exact fused
    T_ref->last, independent of the frame weights."""
    B, F = 3, 5
    R_rel, t_rel, q_dev, t_dev = make_gt(B, F)
    w = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, F))), axis=-1)
    R, t, R_est, t_est = fuse_frame_poses(
        jnp.asarray(R_rel, jnp.float32), jnp.asarray(t_rel, jnp.float32),
        jnp.asarray(q_dev, jnp.float32), jnp.asarray(t_dev, jnp.float32), w)
    R, t = np.asarray(R), np.asarray(t)
    for b in range(B):
        assert rot_err_deg(R[b], R_rel[b, -1]) < 0.05
        np.testing.assert_allclose(t[b], t_rel[b, -1], atol=2e-5)
    # every chained per-frame estimate already agrees
    est = np.asarray(R_est)
    for b in range(B):
        for f in range(F):
            assert rot_err_deg(est[b, f], R_rel[b, -1]) < 0.05


def test_fusion_beats_last_frame_under_noise():
    """With iid noise on each per-frame prediction, fusing all frames gives a
    lower pose error than the last frame alone — the quantitative reason to
    use the 9-frame track at all."""
    B, F = 16, 9
    fused_rot, last_rot, fused_t, last_t = [], [], [], []
    for trial in range(4):
        R_rel, t_rel, q_dev, t_dev = make_gt(B, F)
        R_noisy = np.zeros_like(R_rel)
        for b in range(B):
            for f in range(F):
                dq = random_quat(scale=0.15)
                R_noisy[b, f] = quat2mat(dq) @ R_rel[b, f]
        t_noisy = t_rel + rng.normal(size=t_rel.shape) * 0.1
        w = jnp.full((B, F), 1.0 / F)
        R, t, _, _ = fuse_frame_poses(
            jnp.asarray(R_noisy, jnp.float32), jnp.asarray(t_noisy, jnp.float32),
            jnp.asarray(q_dev, jnp.float32), jnp.asarray(t_dev, jnp.float32), w)
        R, t = np.asarray(R), np.asarray(t)
        for b in range(B):
            fused_rot.append(rot_err_deg(R[b], R_rel[b, -1]))
            last_rot.append(rot_err_deg(R_noisy[b, -1], R_rel[b, -1]))
            fused_t.append(np.linalg.norm(t[b] - t_rel[b, -1]))
            last_t.append(np.linalg.norm(t_noisy[b, -1] - t_rel[b, -1]))
    assert np.median(fused_rot) < 0.6 * np.median(last_rot), (
        np.median(fused_rot), np.median(last_rot))
    assert np.median(fused_t) < 0.6 * np.median(last_t), (
        np.median(fused_t), np.median(last_t))


@pytest.fixture(scope="module")
def tiny_cfg():
    c = default_cfg.clone()
    c.merge_from_file("configs/mapfree.yaml")
    c.merge_from_file("configs/regression/mapfree/multiframe/3d3d_multi_fusion.yaml")
    c.ENCODER.NUM_BLOCKS = "1-1-1"
    c.ENCODER.NUM_OUT_LAYERS = 8
    c.DATASET.HEIGHT = 32
    c.DATASET.WIDTH = 32
    c.DATASET.QUERY_FRAME_COUNT = 3
    c.TPU.COMPUTE_DTYPE = "float32"
    c.TPU.FUSED_CORRELATION = False
    c.TRAINING.LR = 1e-3
    return c


def make_batch(B=2, F=3, H=32, W=32, seed=0):
    local = np.random.default_rng(seed)
    R_rel, t_rel, q_dev, t_dev = make_gt(B, F)
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, :3, :3] = R_rel[:, -1]
    T[:, :3, 3] = t_rel[:, -1]
    return {
        "image0": local.normal(size=(B, H, W, 3)).astype(np.float32),
        "image1": local.normal(size=(B, F, H, W, 3)).astype(np.float32),
        "T_0to1": T,
        "abs_q_1_w2c_device": q_dev.astype(np.float32),
        "abs_c_1_c2w_device": t_dev.astype(np.float32),
    }


def test_fusion_net_trains(tiny_cfg):
    from mapfree_tpu.train import init_state, make_train_step

    net = build_regression_net(tiny_cfg)
    assert net.needs_device_poses
    batch = make_batch()
    state = init_state(net, tiny_cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(net, tiny_cfg, donate=False)
    losses = []
    for i in range(8):
        state, logs = step(state, batch)
        losses.append(float(logs["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # memorises a fixed batch


def test_fusion_predictor(tiny_cfg, monkeypatch):
    """build_model path: batched inference incl. partial-batch padding."""
    from mapfree_tpu.models.builder import build_model

    cfg = tiny_cfg.clone()
    cfg.TPU.INFER_BATCH = 4
    model = build_model(cfg)
    batch = make_batch(B=3)  # partial batch -> padded to 4
    R, t, inliers = model.predict_batch(batch)
    assert R.shape == (3, 3, 3) and t.shape == (3, 1, 3)
    assert np.isfinite(R).all() and np.isfinite(t).all()
    # fused rotations are orthonormal
    for b in range(3):
        np.testing.assert_allclose(R[b] @ R[b].T, np.eye(3), atol=1e-4)
