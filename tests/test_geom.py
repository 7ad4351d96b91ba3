"""Geometry core tests: quaternions, rotations, Kabsch, projection."""

import numpy as np
import pytest

from mapfree_tpu.geom import (
    axangle2quat,
    backproject_3d,
    correct_intrinsic_scale,
    euler2quat,
    inv_rodrigues,
    mat2quat,
    project,
    qinverse,
    qmult,
    quat2mat,
    relative_pose_wxyz,
    rodrigues,
    rotate_vector,
    rotation_matrix_from_ortho6d,
)
from mapfree_tpu.geom.procrustes import procrustes
from mapfree_tpu.geom.rotation import euler_xyz_to_matrix, matrix_to_euler_xyz

rng = np.random.default_rng(0)


def random_quat():
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def random_rotation():
    return quat2mat(random_quat())


class TestQuaternion:
    @pytest.mark.parametrize("run", range(20))
    def test_quat_mat_roundtrip(self, run):
        q = random_quat()
        R = quat2mat(q)
        # rotation matrix properties
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R), 1.0)
        q2 = mat2quat(R)
        # q and -q encode the same rotation; mat2quat returns w>=0 hemisphere
        qc = q * np.sign(q[0]) if q[0] != 0 else q
        assert np.allclose(q2, qc, atol=1e-10)

    @pytest.mark.parametrize("run", range(20))
    def test_qmult_matches_matrix_product(self, run):
        q1, q2 = random_quat(), random_quat()
        R = quat2mat(qmult(q1, q2))
        assert np.allclose(R, quat2mat(q1) @ quat2mat(q2), atol=1e-12)

    @pytest.mark.parametrize("run", range(20))
    def test_rotate_vector(self, run):
        q = random_quat()
        v = rng.normal(size=3)
        assert np.allclose(rotate_vector(v, q), quat2mat(q) @ v, atol=1e-12)

    def test_qinverse(self):
        q = random_quat()
        ident = qmult(q, qinverse(q))
        assert np.allclose(ident, [1, 0, 0, 0], atol=1e-12)

    def test_axangle2quat(self):
        axis = np.array([0.0, 0.0, 1.0])
        q = axangle2quat(axis, np.pi / 2)
        R = quat2mat(q)
        assert np.allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)

    def test_euler2quat_identity(self):
        assert np.allclose(euler2quat(0.0, 0.0, 0.0), [1, 0, 0, 0])

    def test_relative_pose_composition(self):
        """If X_c1 = R1 X_w + t1 and X_c2 = R2 X_w + t2 then
        X_c2 = R12 X_c1 + t12 with (R12, t12) from relative_pose_wxyz."""
        q1, q2 = random_quat(), random_quat()
        t1, t2 = rng.normal(size=3), rng.normal(size=3)
        q12, t12 = relative_pose_wxyz(q1, t1, q2, t2)
        Xw = rng.normal(size=3)
        Xc1 = quat2mat(q1) @ Xw + t1
        Xc2 = quat2mat(q2) @ Xw + t2
        assert np.allclose(quat2mat(q12) @ Xc1 + t12, Xc2, atol=1e-10)

    def test_batched_quat_ops(self):
        qs = np.stack([random_quat() for _ in range(5)])
        Rs = quat2mat(qs)
        assert Rs.shape == (5, 3, 3)
        qs2 = mat2quat(Rs)
        signs = np.sign(qs[:, :1])
        signs[signs == 0] = 1
        assert np.allclose(qs2, qs * signs, atol=1e-10)


class TestRotationReps:
    def test_ortho6d(self):
        import jax.numpy as jnp

        R_gt = np.stack([random_rotation() for _ in range(4)])
        # feed first two columns as the 6D representation -> must recover R
        sixd = np.concatenate([R_gt[:, :, 0], R_gt[:, :, 1]], axis=-1)
        R = np.asarray(rotation_matrix_from_ortho6d(jnp.asarray(sixd)))
        assert np.allclose(R, R_gt, atol=1e-5)

    def test_rodrigues_roundtrip(self):
        import jax.numpy as jnp

        rvec = np.array([[0.3, -0.2, 0.5], [0.0, 0.0, 0.0], [1e-9, 0, 0]])
        R = rodrigues(jnp.asarray(rvec))
        back = np.asarray(inv_rodrigues(R))
        assert np.allclose(back, rvec, atol=1e-4)  # f32 device precision
        assert np.allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)

    def test_euler_matches_scipy(self):
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation

        angles = rng.uniform(-179, 179, size=(8, 3))
        R_scipy = Rotation.from_euler("xyz", angles, degrees=True).as_matrix()
        R_ours = np.asarray(euler_xyz_to_matrix(jnp.asarray(angles)))
        assert np.allclose(R_ours, R_scipy, atol=1e-6)
        back = np.asarray(matrix_to_euler_xyz(jnp.asarray(R_scipy)))
        R_back = Rotation.from_euler("xyz", back, degrees=True).as_matrix()
        assert np.allclose(R_back, R_scipy, atol=1e-5)


class TestProcrustes:
    @pytest.mark.parametrize("run", range(5))
    def test_exact_recovery(self, run):
        import jax.numpy as jnp

        R_gt = random_rotation()
        t_gt = rng.normal(size=3)
        A = rng.normal(size=(1, 10, 3))
        B = A @ R_gt.T + t_gt
        R, t = procrustes(jnp.asarray(A, np.float32), jnp.asarray(B, np.float32))
        assert np.allclose(np.asarray(R[0]), R_gt, atol=1e-4)
        assert np.allclose(np.asarray(t[0, 0]), t_gt, atol=1e-4)

    def test_weighted_ignores_outliers(self):
        import jax.numpy as jnp

        R_gt = random_rotation()
        t_gt = rng.normal(size=3)
        A = rng.normal(size=(1, 12, 3))
        B = A @ R_gt.T + t_gt
        B_corrupt = np.array(B)
        B_corrupt[0, -2:] += 100.0  # gross outliers
        w = np.ones((1, 12), np.float32)
        w[0, -2:] = 0.0
        R, t = procrustes(
            jnp.asarray(A, np.float32), jnp.asarray(B_corrupt, np.float32), jnp.asarray(w)
        )
        assert np.allclose(np.asarray(R[0]), R_gt, atol=1e-4)
        assert np.allclose(np.asarray(t[0, 0]), t_gt, atol=1e-4)

    def test_reflection_guard(self):
        """Degenerate planar clouds must still return a proper rotation."""
        import jax.numpy as jnp

        A = rng.normal(size=(1, 8, 3)).astype(np.float32)
        A[..., 2] = 0.0
        B = -A  # reflection-like correspondence
        R, t = procrustes(jnp.asarray(A), jnp.asarray(B))
        assert np.isclose(np.linalg.det(np.asarray(R[0])), 1.0, atol=1e-4)


class TestProjection:
    def test_project_reference_values(self):
        xyz = np.array(
            ((10, 20, 30), (10, 30, 50), (-20, -15, 5), (-20, -50, 10)), dtype=np.float32
        )
        K = np.eye(3)
        uv = np.array(((1 / 3, 2 / 3), (1 / 5, 3 / 5), (-4, -3), (-2, -5)), np.float32)
        assert np.allclose(uv, project(xyz, K))
        uv_clamped = np.array(((1 / 3, 2 / 3), (1 / 5, 3 / 5), (0, 0), (0, 0)), np.float32)
        assert np.allclose(uv_clamped, project(xyz, K, img_size=(5, 5)))

    def test_backproject_roundtrip(self):
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
        uv = rng.uniform(0, 640, size=(20, 2))
        depth = rng.uniform(0.5, 5.0, size=20)
        xyz = backproject_3d(uv, depth, K)
        uv2 = project(xyz, K)
        assert np.allclose(uv, uv2, atol=1e-9)
        assert np.allclose(xyz[:, 2], depth)

    def test_intrinsic_scale(self):
        K = np.array([[500.0, 0, 320], [0, 400, 240], [0, 0, 1]])
        K2 = correct_intrinsic_scale(K, 0.5, 0.25)
        assert np.isclose(K2[0, 0], 250)
        assert np.isclose(K2[1, 1], 100)
        assert np.isclose(K2[0, 2], 0.5 * 320 + 0.5 / 2 - 0.5)
        assert np.isclose(K2[1, 2], 0.25 * 240 + 0.25 / 2 - 0.5)
