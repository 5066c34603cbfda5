"""Triangulation kernels vs closed-form geometry and OpenCV cross-checks."""

import numpy as np
import jax.numpy as jnp
import cv2

from mqslam_tpu.core import so3, se3
from mqslam_tpu.ops import triangulation as tri


def two_view_scene(rng, n=200, noise=0.0, baseline=(1.0, 0.0, 0.0)):
    """Random points ~40 units in front of cam1 (identity), cam2 offset."""
    pts = np.stack([rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
                    rng.uniform(30, 50, n)], axis=1)
    P1 = np.eye(4)
    rvec2 = np.array([0.02, -0.03, 0.01])
    R2 = cv2.Rodrigues(rvec2)[0]
    t2 = -R2 @ np.asarray(baseline, dtype=float)
    P2 = np.eye(4)
    P2[:3, :3] = R2
    P2[:3, 3] = t2

    def proj(P):
        pc = pts @ P[:3, :3].T + P[:3, 3]
        return pc[:, :2] / pc[:, 2:3]

    u1 = proj(P1) + noise * rng.randn(n, 2)
    u2 = proj(P2) + noise * rng.randn(n, 2)
    return pts, u1, u2, P1, P2


def as32(*arrays):
    return [jnp.asarray(a, dtype=jnp.float32) for a in arrays]


class TestExactRecovery:
    """All four methods must recover noise-free geometry."""

    def _check(self, method, rng, atol):
        pts, u1, u2, P1, P2 = two_view_scene(rng)
        x, status = method(*as32(u1, P1, u2, P2))
        x = np.asarray(x)
        np.testing.assert_allclose(x, pts, atol=atol)
        assert np.all(np.asarray(status) >= 1)

    def test_linear_eigen(self, rng):
        self._check(tri.linear_eigen, rng, atol=5e-2)

    def test_linear_ls(self, rng):
        self._check(tri.linear_ls, rng, atol=5e-2)

    def test_iterative_ls(self, rng):
        self._check(tri.iterative_ls, rng, atol=5e-2)

    def test_optimal(self, rng):
        self._check(tri.optimal, rng, atol=5e-2)


class TestAgainstOpenCV:
    def test_linear_eigen_matches_cv2(self, rng):
        pts, u1, u2, P1, P2 = two_view_scene(rng, noise=1.5e-3)
        x, status = tri.linear_eigen(*as32(u1, P1, u2, P2))
        xh = cv2.triangulatePoints(P1[:3], P2[:3], u1.T, u2.T)
        want = (xh[:3] / xh[3:4]).T
        np.testing.assert_allclose(np.asarray(x), want, atol=2e-2)

    def test_optimal_correction_matches_cv2_correctmatches(self, rng):
        pts, u1, u2, P1, P2 = two_view_scene(rng, noise=1.5e-3)
        F = np.asarray(tri.fundamental_from_P(jnp.asarray(P1), jnp.asarray(P2)))
        c1, c2 = cv2.correctMatches(F, u1.reshape(1, -1, 2),
                                    u2.reshape(1, -1, 2))
        got1, got2 = tri._optimal_correct(
            jnp.asarray(u1), jnp.asarray(u2), jnp.asarray(F))
        # Lindstrom niter2 and the HZ polynomial minimize the same cost;
        # agreement should be far below the noise level (1.5e-3).
        np.testing.assert_allclose(np.asarray(got1), c1[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(got2), c2[0], atol=1e-6)

    def test_corrected_points_satisfy_epipolar(self, rng):
        pts, u1, u2, P1, P2 = two_view_scene(rng, noise=1.5e-3)
        F = tri.fundamental_from_P(jnp.asarray(P1), jnp.asarray(P2))
        got1, got2 = tri._optimal_correct(
            jnp.asarray(u1), jnp.asarray(u2), F)
        h = lambda u: np.concatenate([np.asarray(u), np.ones((len(u1), 1))], 1)
        resid = np.einsum("ni,ij,nj->n", h(got2), np.asarray(F), h(got1))
        assert np.abs(resid).max() < 1e-7


class TestIterativeLSStatus:
    def test_behind_camera_flags(self):
        # Point behind both cameras: rays that intersect at negative depth.
        P1 = np.eye(4)
        P2 = np.eye(4)
        P2[:3, 3] = [-1.0, 0.0, 0.0]  # camera at x=+1 looking same direction
        X = np.array([[0.5, 0.0, -5.0]])  # behind both
        u1 = X[:, :2] / X[:, 2:3]
        pc2 = X + np.array([[-1.0, 0.0, 0.0]])
        u2 = pc2[:, :2] / pc2[:, 2:3]
        _, status = tri.iterative_ls(*as32(u1, P1, u2, P2))
        assert int(status[0]) == -3

    def test_in_front_converged_is_one(self, rng):
        pts, u1, u2, P1, P2 = two_view_scene(rng, n=50, noise=1e-3)
        _, status = tri.iterative_ls(*as32(u1, P1, u2, P2))
        assert np.all(np.asarray(status) == 1)


class TestIterativeAgainstReferenceAlgorithm:
    def test_matches_reimplementation(self, rng):
        """Compare to an independent per-point NumPy float64 implementation of
        the same cumulative-reweighting scheme (Hartley–Sturm as specified in
        triangulation.py:148-187)."""
        pts, u1, u2, P1, P2 = two_view_scene(rng, n=64, noise=1e-3)

        def numpy_iterative(u1, P1, u2, P2, tol=3e-5):
            out = np.zeros((len(u1), 3))
            for i in range(len(u1)):
                rows, rhs = [], []
                for (u, P) in ((u1[i], P1), (u2[i], P2)):
                    rows.append(u[0] * P[2, :3] - P[0, :3])
                    rows.append(u[1] * P[2, :3] - P[1, :3])
                    rhs.append(-(u[0] * P[2, 3] - P[0, 3]))
                    rhs.append(-(u[1] * P[2, 3] - P[1, 3]))
                A = np.array(rows)
                b = np.array(rhs)
                d1 = d2 = 1.0
                for it in range(10):
                    x = np.linalg.lstsq(A, b, rcond=None)[0]
                    d1n = P1[2, :3] @ x + P1[2, 3]
                    d2n = P2[2, :3] @ x + P2[2, 3]
                    if abs(d1n - d1) <= tol and abs(d2n - d2) <= tol:
                        break
                    A[0:2] /= d1n
                    A[2:4] /= d2n
                    b[0:2] /= d1n
                    b[2:4] /= d2n
                    d1, d2 = d1n, d2n
                out[i] = x
            return out

        want = numpy_iterative(u1, P1, u2, P2)
        got, status = tri.iterative_ls(*as32(u1, P1, u2, P2))
        assert np.all(np.asarray(status) == 1)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-3)


class TestInfinity:
    def test_linear_eigen_flags_points_at_infinity(self):
        # Identical rays from a pure sideways baseline: intersection at inf.
        P1 = np.eye(4)
        P2 = np.eye(4)
        P2[:3, 3] = [-1.0, 0.0, 0.0]
        u = np.array([[0.1, 0.2]])
        x, status = tri.linear_eigen(*as32(u, P1, u, P2))
        assert not bool(status[0])
