"""Loss registry tests: zero at GT, positive away from GT, Kendall weighting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mapfree_tpu.geom import quat2mat
from mapfree_tpu.geom.rotation import matrix_to_euler_xyz
from mapfree_tpu.losses import LOSSES, combined_loss, get_loss

rng = np.random.default_rng(3)


def random_pose(B=4):
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = quat2mat(q)
    t = rng.normal(size=(B, 1, 3))
    return jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32), jnp.asarray(
        q * np.sign(q[:, :1]), jnp.float32
    )


def make_batch(R, t):
    B = R.shape[0]
    T = jnp.tile(jnp.eye(4), (B, 1, 1))
    T = T.at[:, :3, :3].set(R)
    T = T.at[:, :3, 3].set(t[:, 0])
    return {"T_0to1": T}


def perfect_preds(R, t, q):
    scale = jnp.linalg.norm(t, axis=-1, keepdims=True)
    direction = t / jnp.maximum(scale, 1e-12)
    angles = matrix_to_euler_xyz(R) + jnp.asarray([180.0, 90.0, 180.0])
    idx = jnp.round(angles).astype(jnp.int32)
    R_bins = jnp.zeros((R.shape[0], 900))
    R_bins = R_bins.at[jnp.arange(R.shape[0]), jnp.clip(idx[:, 0], 0, 359)].set(50.0)
    R_bins = R_bins.at[jnp.arange(R.shape[0]), 360 + jnp.clip(idx[:, 1], 0, 179)].set(50.0)
    R_bins = R_bins.at[jnp.arange(R.shape[0]), 540 + jnp.clip(idx[:, 2], 0, 359)].set(50.0)
    return {
        "R": R,
        "t": t,
        "q": q,
        "scale": scale,
        "t_direction": direction,
        "R_bins": R_bins,
        "t_sph_phi": jnp.zeros((R.shape[0], 360)),
        "t_sph_theta": jnp.zeros((R.shape[0], 180)),
    }


ZERO_AT_GT = [
    "rot_frobenius_loss",
    "rot_l1_loss",
    "trans_l2_loss",
    "trans_l1_loss",
    "quat_l1_loss",
    "robust_quat_l1_loss",
    "trans_scale_direction_loss",
    "trans_scale_l1_loss",
    "empty_loss",
]


@pytest.mark.parametrize("name", ZERO_AT_GT)
def test_zero_at_ground_truth(name):
    R, t, q = random_pose()
    batch = make_batch(R, t)
    loss = get_loss(name)(perfect_preds(R, t, q), batch)
    assert float(loss) == pytest.approx(0.0, abs=1e-4)


@pytest.mark.parametrize("name", ["rot_angle_loss", "trans_ang_loss"])
def test_angle_losses_near_zero_at_gt(name):
    R, t, q = random_pose()
    batch = make_batch(R, t)
    loss = get_loss(name)(perfect_preds(R, t, q), batch)
    # clipped arccos leaves a small floor (reference clips cosine at 0.99999)
    assert float(loss) < 5e-3


def test_losses_positive_away_from_gt():
    R, t, q = random_pose()
    R2, t2, q2 = random_pose()
    batch = make_batch(R, t)
    preds = perfect_preds(R2, t2, q2)
    for name in ["rot_frobenius_loss", "rot_l1_loss", "rot_angle_loss",
                 "trans_l2_loss", "trans_l1_loss", "quat_l1_loss"]:
        assert float(get_loss(name)(preds, batch)) > 1e-3, name


def test_rot_bin_loss_prefers_correct_bins():
    R, t, q = random_pose()
    batch = make_batch(R, t)
    good = get_loss("rot_bin_loss")(perfect_preds(R, t, q), batch)
    bad_preds = perfect_preds(R, t, q)
    bad_preds["R_bins"] = jnp.roll(bad_preds["R_bins"], 37, axis=1)
    bad = get_loss("rot_bin_loss")(bad_preds, batch)
    assert float(good) < float(bad)


def test_sphbin_loss_runs_and_finite():
    R, t, q = random_pose()
    batch = make_batch(R, t)
    loss = get_loss("trans_sphbin_loss")(perfect_preds(R, t, q), batch)
    assert np.isfinite(float(loss))


def test_combined_loss_fixed_lambda():
    R, t, q = random_pose()
    batch = make_batch(R, t)
    preds = perfect_preds(R, t, q)
    R_loss, t_loss, loss = combined_loss(preds, batch, "rot_frobenius_loss",
                                         "trans_l2_loss", lam=2.0)
    assert float(loss) == pytest.approx(float(R_loss) + 2.0 * float(t_loss))


def test_combined_loss_kendall():
    R, t, q = random_pose()
    batch = make_batch(R, t)
    preds = perfect_preds(R, t, q)
    s_r = jnp.asarray([0.5])
    s_t = jnp.asarray([-0.3])
    R_loss, t_loss, loss = combined_loss(preds, batch, "rot_frobenius_loss",
                                         "trans_l2_loss", lam=0.0, s_r=s_r, s_t=s_t)
    expected = (float(R_loss) * np.exp(-0.5) + float(t_loss) * np.exp(0.3)
                + 0.5 - 0.3)
    assert float(loss) == pytest.approx(expected, rel=1e-5)


def test_all_losses_differentiable():
    R, t, q = random_pose(B=2)
    batch = make_batch(R, t)

    def total(preds):
        s = 0.0
        for name, fn in LOSSES.items():
            s = s + fn(preds, batch)
        return s

    preds = perfect_preds(R, t, q)
    # perturb away from the exact GT: norm() has a non-differentiable point at
    # zero (NaN grad), same as the reference's torch.linalg.norm
    preds = jax.tree.map(lambda x: x + 0.01, preds)
    grads = jax.grad(total)(preds)
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k
