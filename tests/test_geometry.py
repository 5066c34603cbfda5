"""Unit tests for the geometry core against closed-form identities and scipy."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from mqslam_tpu.core import quat, so3, se3, camera

ATOL = 1e-5


def random_rvecs(rng, n=64, max_angle=np.pi - 0.1):
    axes = rng.randn(n, 3)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(-max_angle, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


class TestQuat:
    def test_mult_matches_scipy(self, rng):
        q1 = Rotation.random(32, random_state=rng).as_quat().astype(np.float32)
        q2 = Rotation.random(32, random_state=rng).as_quat().astype(np.float32)
        got = np.asarray(quat.mult(jnp.array(q1), jnp.array(q2)))
        want = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
        # quaternion double cover: compare up to sign
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=ATOL)

    def test_inv_mult_is_identity(self, rng):
        q = Rotation.random(16, random_state=rng).as_quat().astype(np.float32)
        r = np.asarray(quat.mult(jnp.array(q), quat.inv(jnp.array(q))))
        np.testing.assert_allclose(r[:, :3], 0, atol=ATOL)
        np.testing.assert_allclose(np.abs(r[:, 3]), 1, atol=ATOL)

    def test_apply_to_point_matches_matrix(self, rng):
        q = Rotation.random(16, random_state=rng).as_quat().astype(np.float32)
        p = rng.randn(16, 3).astype(np.float32)
        got = np.asarray(quat.apply_to_point(jnp.array(q), jnp.array(p)))
        want = Rotation.from_quat(q).apply(p)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_rvec_roundtrip(self, rng):
        rv = random_rvecs(rng)
        back = np.asarray(quat.to_rvec(quat.from_rvec(jnp.array(rv))))
        np.testing.assert_allclose(back, rv, atol=1e-4)

    def test_from_rvec_matches_scipy(self, rng):
        rv = random_rvecs(rng)
        got = np.asarray(quat.from_rvec(jnp.array(rv)))
        want = Rotation.from_rotvec(rv).as_quat()
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=ATOL)

    def test_matrix_roundtrip(self, rng):
        q = Rotation.random(64, random_state=rng).as_quat().astype(np.float32)
        R = quat.to_matrix(jnp.array(q))
        np.testing.assert_allclose(
            np.asarray(R), Rotation.from_quat(q).as_matrix(), atol=ATOL)
        q2 = np.asarray(quat.from_matrix(R))
        sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=ATOL)

    def test_from_matrix_near_pi(self):
        # 180-degree rotations hit the non-trace Shepperd branches.
        for axis in np.eye(3):
            R = Rotation.from_rotvec(np.pi * axis).as_matrix().astype(np.float32)
            q = np.asarray(quat.from_matrix(jnp.array(R)))
            want = Rotation.from_rotvec(np.pi * axis).as_quat()
            sign = np.sign(np.sum(q * want)) or 1.0
            np.testing.assert_allclose(q * sign, want, atol=ATOL)

    def test_zero_norm_normalize(self):
        q = quat.normalize(jnp.zeros(4))
        np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=ATOL)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        rv = random_rvecs(rng)
        got = np.asarray(so3.exp(jnp.array(rv)))
        np.testing.assert_allclose(got, Rotation.from_rotvec(rv).as_matrix(),
                                   atol=ATOL)

    def test_exp_log_roundtrip(self, rng):
        rv = random_rvecs(rng)
        back = np.asarray(so3.log(so3.exp(jnp.array(rv))))
        np.testing.assert_allclose(back, rv, atol=1e-4)

    def test_exp_zero(self):
        np.testing.assert_allclose(np.asarray(so3.exp(jnp.zeros(3))),
                                   np.eye(3), atol=ATOL)

    def test_delta_rvec(self, rng):
        rv = random_rvecs(rng, 8)
        r1, r2 = rv[:4], rv[4:]
        d = np.asarray(so3.delta_rvec(jnp.array(r1), jnp.array(r2)))
        R = Rotation.from_rotvec(d).as_matrix()
        want = (Rotation.from_rotvec(r2) * Rotation.from_rotvec(r1).inv()
                ).as_matrix()
        np.testing.assert_allclose(R, want, atol=1e-4)


class TestSE3:
    def test_inv(self, rng):
        rv = random_rvecs(rng, 8)
        t = rng.randn(8, 3).astype(np.float32)
        P = se3.from_rvec_tvec(jnp.array(rv), jnp.array(t))
        I = np.asarray(P @ se3.inv(P))
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), (8, 4, 4)),
                                   atol=1e-4)

    def test_delta(self, rng):
        rv = random_rvecs(rng, 2)
        t = rng.randn(2, 3).astype(np.float32)
        P = se3.from_rvec_tvec(jnp.array(rv), jnp.array(t))
        D = se3.delta(P[0], P[1])
        np.testing.assert_allclose(np.asarray(D @ P[0]), np.asarray(P[1]),
                                   atol=1e-4)

    def test_tum_roundtrip(self, rng):
        rv = random_rvecs(rng, 16)
        t = rng.randn(16, 3).astype(np.float32)
        P = se3.from_rvec_tvec(jnp.array(rv), jnp.array(t))
        q, c = se3.to_pose_tum(P)
        P2 = se3.from_pose_tum(q, c)
        np.testing.assert_allclose(np.asarray(P2), np.asarray(P), atol=1e-4)

    def test_apply(self, rng):
        rv = random_rvecs(rng, 4)
        t = rng.randn(4, 3).astype(np.float32)
        pts = rng.randn(4, 3).astype(np.float32)
        P = se3.from_rvec_tvec(jnp.array(rv), jnp.array(t))
        got = np.asarray(se3.apply(P, jnp.array(pts)))
        want = Rotation.from_rotvec(rv).apply(pts) + t
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestCamera:
    CAL = camera.Cal3DS2.from_array(jnp.array(
        [520.9, 521.0, 0.0, 325.1, 249.7, 0.05, -0.1, 1e-3, -2e-3],
        dtype=jnp.float32))

    def test_normalize_denormalize_roundtrip(self, rng):
        uv = rng.uniform(0, 640, size=(128, 2)).astype(np.float32)
        back = camera.denormalize_points(
            camera.normalize_points(jnp.array(uv), self.CAL), self.CAL)
        np.testing.assert_allclose(np.asarray(back), uv, atol=1e-2)

    def test_distort_undistort_roundtrip(self, rng):
        xn = rng.uniform(-0.5, 0.5, size=(256, 2)).astype(np.float32)
        xd = camera.distort_normalized(jnp.array(xn), self.CAL)
        back = camera.undistort_normalized(xd, self.CAL)
        np.testing.assert_allclose(np.asarray(back), xn, atol=1e-5)

    def test_distortion_matches_opencv_formula(self, rng):
        # Independent NumPy re-evaluation of the OpenCV 4-coeff model.
        xn = rng.uniform(-0.4, 0.4, size=(64, 2))
        x, y = xn[:, 0], xn[:, 1]
        k1, k2, p1, p2 = 0.05, -0.1, 1e-3, -2e-3
        r2 = x**2 + y**2
        rad = 1 + k1 * r2 + k2 * r2**2
        want = np.stack([x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x**2),
                         y * rad + p1 * (r2 + 2 * y**2) + 2 * p2 * x * y], -1)
        got = np.asarray(camera.distort_normalized(
            jnp.array(xn, dtype=jnp.float32), self.CAL))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_project_depth_sign(self):
        P = se3.identity()  # camera at origin looking down +z
        pts = jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -2.0]])
        uv, z = camera.project(pts, P, self.CAL)
        assert z[0] > 0 and z[1] < 0
        np.testing.assert_allclose(np.asarray(uv[0]), [325.1, 249.7], atol=1e-3)
        d = camera.projection_depth(pts, P)
        np.testing.assert_allclose(np.asarray(d), np.asarray(z), atol=1e-6)

    def test_negative_fy(self):
        # ICL-NUIM style intrinsics (fy < 0) must round-trip too.
        cal = camera.Cal3DS2.from_array(jnp.array(
            [481.2, -480.0, 0.0, 319.5, 239.5, 0, 0, 0, 0], dtype=jnp.float32))
        uv = jnp.array([[100.0, 400.0]])
        back = camera.denormalize_points(
            camera.undistort_points(uv, cal), cal)
        np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=1e-3)

    def test_project_matches_manual(self, rng):
        rv = random_rvecs(rng, 1)[0] * 0.1
        t = np.array([0.1, -0.2, 3.0], dtype=np.float32)
        P = se3.from_rvec_tvec(jnp.array(rv), jnp.array(t))
        pts = rng.uniform(-1, 1, size=(32, 3)).astype(np.float32)
        uv, z = camera.project(jnp.array(pts), P, self.CAL)
        # manual: rotate, translate, perspective divide, distort, K
        pc = Rotation.from_rotvec(rv).apply(pts) + t
        xn = pc[:, :2] / pc[:, 2:3]
        xd = np.asarray(camera.distort_normalized(
            jnp.array(xn, dtype=jnp.float32), self.CAL))
        want_uv = np.stack([520.9 * xd[:, 0] + 325.1,
                            521.0 * xd[:, 1] + 249.7], -1)
        np.testing.assert_allclose(np.asarray(uv), want_uv, atol=1e-2)
        np.testing.assert_allclose(np.asarray(z), pc[:, 2], atol=1e-4)
