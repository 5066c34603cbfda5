"""Calibration suite vs OpenCV ground truth."""

import numpy as np
import cv2
import jax
import jax.numpy as jnp

from mqslam_tpu.calib import zhang, epipolar, relative
from mqslam_tpu.core import camera as cam_mod


def render_board_views(rng, K_true, dist_true, n_views=8, board=(6, 9),
                       noise=0.2):
    objp = zhang.grid_objp(board, scale=0.03)
    uvs, rvecs, tvecs = [], [], []
    for _ in range(n_views):
        rvec = rng.uniform(-0.35, 0.35, 3)
        tvec = np.array([rng.uniform(-0.08, 0.08), rng.uniform(-0.06, 0.06),
                         rng.uniform(0.35, 0.6)])
        uv, _ = cv2.projectPoints(objp, rvec, tvec, K_true, dist_true)
        uv = uv.reshape(-1, 2) + noise * rng.randn(len(objp), 2)
        uvs.append(uv)
        rvecs.append(rvec)
        tvecs.append(tvec)
    return objp, np.stack(uvs), rvecs, tvecs


class TestZhang:
    def test_matches_opencv_calibration(self, rng):
        K_true = np.array([[700.0, 0, 310.0], [0, 695.0, 245.0], [0, 0, 1]])
        dist_true = np.array([0.08, -0.12, 1e-3, -5e-4])
        objp, uvs, _, _ = render_board_views(rng, K_true, dist_true)
        K, dist, rvecs, tvecs, rms = zhang.calibrate_camera(
            objp, uvs, (640, 480), refine_iters=40)
        # compare against cv2.calibrateCamera on the same data
        ret, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
            [objp.astype(np.float32)] * len(uvs),
            [u.astype(np.float32) for u in uvs], (640, 480), None, None,
            flags=cv2.CALIB_ZERO_TANGENT_DIST * 0)
        np.testing.assert_allclose(K[0, 0], K_cv[0, 0], rtol=0.02)
        np.testing.assert_allclose(K[1, 1], K_cv[1, 1], rtol=0.02)
        np.testing.assert_allclose(K[0, 2], K_cv[0, 2], atol=8.0)
        np.testing.assert_allclose(K[1, 2], K_cv[1, 2], atol=8.0)
        np.testing.assert_allclose(dist[0], dist_true[0], atol=0.05)
        assert rms < 2.0 * ret + 0.3

    def test_grid_objp_matches_reference_ordering(self):
        g = zhang.grid_objp((2, 3))
        # calibration_tools.py:7-20: i over boardSize[1], j over boardSize[0]
        want = [(0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, 0), (2, 0, 0),
                (2, 1, 0)]
        np.testing.assert_array_equal(g, np.asarray(want, dtype=float))


def two_view_pairs(rng, n=120, baseline=(0.3, 0.05, 0.02),
                   rvec=(0.03, -0.05, 0.01)):
    pts = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.0, 1.0, n),
                    rng.uniform(3.0, 7.0, n)], 1)
    R = cv2.Rodrigues(np.asarray(rvec))[0]
    t = -R @ np.asarray(baseline)
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    p2 = pc2[:, :2] / pc2[:, 2:3]
    return p1, p2, R, t / np.linalg.norm(t)


class TestEpipolar:
    def test_8point_satisfies_epipolar(self, rng):
        p1, p2, R, t = two_view_pairs(rng)
        F = epipolar.fundamental_8point(jnp.asarray(p1, jnp.float32),
                                        jnp.asarray(p2, jnp.float32))
        F = np.asarray(F, np.float64)
        h = lambda p: np.concatenate([p, np.ones((len(p), 1))], 1)
        resid = np.abs(np.einsum("ni,ij,nj->n", h(p2), F, h(p1)))
        assert resid.max() < 1e-4
        # rank 2
        s = np.linalg.svd(F, compute_uv=False)
        assert s[2] < 1e-5 * s[0]

    def test_ransac_rejects_outliers(self, rng):
        p1, p2, R, t = two_view_pairs(rng)
        p2_bad = p2.copy()
        p2_bad[:25] += rng.uniform(0.05, 0.2, (25, 2))
        F, inl, n_inl = epipolar.fundamental_ransac(
            jnp.asarray(p1, jnp.float32), jnp.asarray(p2_bad, jnp.float32),
            jax.random.PRNGKey(0), threshold=0.004)
        inl = np.asarray(inl)
        assert int(n_inl) > 80
        assert inl[:25].sum() <= 3

    def test_relative_pose_recovery(self, rng):
        p1, p2, R_true, t_true = two_view_pairs(rng)
        F = epipolar.fundamental_8point(jnp.asarray(p1, jnp.float32),
                                        jnp.asarray(p2, jnp.float32))
        R, t, n_front = epipolar.relative_pose_from_fundamental(
            F, jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32))
        assert int(n_front) >= len(p1) * 0.95
        np.testing.assert_allclose(np.asarray(R), R_true, atol=5e-3)
        t_got = np.asarray(t)
        if np.dot(t_got, t_true) < 0:
            t_got = -t_got
        np.testing.assert_allclose(t_got, t_true, atol=5e-3)


class TestRelativePoses:
    def test_two_camera_rig(self, rng):
        # two cameras with a known rig transform, each viewing its own board
        cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
            [600.0, 600.0, 0, 320, 240, 0, 0, 0, 0], jnp.float32))
        rig_R = cv2.Rodrigues(np.array([0.0, 0.3, 0.0]))[0]
        rig_t = np.array([0.25, 0.0, 0.05])
        P_rig = np.eye(4)
        P_rig[:3, :3] = rig_R
        P_rig[:3, 3] = rig_t

        board0 = zhang.grid_objp((5, 7), 0.04)
        board1 = zhang.grid_objp((5, 7), 0.04) + np.array([0.8, 0.0, 0.0])
        K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
        imgs0, imgs1 = [], []
        for i in range(5):
            rv = rng.uniform(-0.1, 0.1, 3)
            tv = np.array([0.0, 0.0, 0.6]) + rng.uniform(-0.05, 0.05, 3)
            P0 = np.eye(4)
            P0[:3, :3] = cv2.Rodrigues(rv)[0]
            P0[:3, 3] = tv
            P1 = P_rig @ P0
            uv0, _ = cv2.projectPoints(board0, cv2.Rodrigues(
                P0[:3, :3])[0], P0[:3, 3], K, np.zeros(4))
            uv1, _ = cv2.projectPoints(board1, cv2.Rodrigues(
                P1[:3, :3])[0], P1[:3, 3], K, np.zeros(4))
            imgs0.append(uv0.reshape(-1, 2) + 0.1 * rng.randn(len(board0), 2))
            imgs1.append(uv1.reshape(-1, 2) + 0.1 * rng.randn(len(board1), 2))
        rel, worst = relative.calibrate_relative_poses(
            [imgs0, imgs1], [board0, board1], [cal, cal])
        np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-5)
        np.testing.assert_allclose(rel[1][:3, :3], rig_R, atol=5e-3)
        np.testing.assert_allclose(rel[1][:3, 3], rig_t, atol=5e-3)
        assert worst < 1.0
