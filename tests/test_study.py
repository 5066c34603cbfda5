"""Triangulation-comparison study: parity vs an independent cv2/NumPy f64
implementation of the reference algorithm on identical noisy observations."""

import math

import numpy as np
import cv2
import pytest

from mqslam_tpu.studies import triangulation_comparison as tc


def reference_pose_eval(u1n, P1, u2n, P2, points_xyz):
    """Independent float64 implementation of the four methods via OpenCV +
    NumPy (per-point loops), returning err3D vectors per method."""
    outs = {}
    # linear eigen
    xh = cv2.triangulatePoints(P1[:3], P2[:3], u1n.T, u2n.T)
    x_le = (xh[:3] / xh[3:4]).T
    outs["linear_eigen"] = x_le - points_xyz

    # linear LS + iterative LS
    n = len(u1n)
    x_ls = np.zeros((n, 3))
    x_it = np.zeros((n, 3))
    for i in range(n):
        rows, rhs = [], []
        for (u, P) in ((u1n[i], P1), (u2n[i], P2)):
            rows.append(u[0] * P[2, :3] - P[0, :3])
            rows.append(u[1] * P[2, :3] - P[1, :3])
            rhs.append(-(u[0] * P[2, 3] - P[0, 3]))
            rhs.append(-(u[1] * P[2, 3] - P[1, 3]))
        A0 = np.array(rows)
        b0 = np.array(rhs)
        x_ls[i] = np.linalg.lstsq(A0, b0, rcond=None)[0]
        A, b = A0.copy(), b0.copy()
        d1 = d2 = 1.0
        for _ in range(10):
            x = np.linalg.lstsq(A, b, rcond=None)[0]
            d1n = P1[2, :3] @ x + P1[2, 3]
            d2n = P2[2, :3] @ x + P2[2, 3]
            if abs(d1n - d1) <= 3e-5 and abs(d2n - d2) <= 3e-5:
                break
            A[0:2] /= d1n
            A[2:4] /= d2n
            b[0:2] /= d1n
            b[2:4] /= d2n
            d1, d2 = d1n, d2n
        x_it[i] = x
    outs["linear_ls"] = x_ls - points_xyz
    outs["iterative_ls"] = x_it - points_xyz

    # polynomial: correctMatches + linear eigen
    P1f = np.eye(4)
    P1f[:3] = P1[:3]
    P2f = np.eye(4)
    P2f[:3] = P2[:3]
    Pc = P2f @ np.linalg.inv(P1f)
    F = np.cross(Pc[:3, 3], Pc[:3, :3], axisb=0).T
    c1, c2 = cv2.correctMatches(F, u1n.reshape(1, -1, 2),
                                u2n.reshape(1, -1, 2))
    xh = cv2.triangulatePoints(P1[:3], P2[:3], c1[0].T, c2[0].T)
    x_po = (xh[:3] / xh[3:4]).T
    outs["polynomial"] = x_po - points_xyz
    return outs


@pytest.mark.parametrize("pose_cfg", [
    (5.0, 0.0, 0.0),            # sideways baseline 5 (the default scenario)
    (12.0, 12.0, 0.0),          # traj 3 endpoint
    (12.0, 40.0 * (1 - math.cos(math.asin(12.0 / 40.0))),
     math.asin(12.0 / 40.0)),   # traj 4 endpoint (circle)
])
def test_error_stats_match_reference_impl(pose_cfg):
    params = tc.StudyParams()
    points_h = tc.finite_points(4)
    points_xyz = points_h[:, :3]
    cam1 = tc.StudyCamera(params.cam_resolution, params.cam_k1)
    cam2 = tc.StudyCamera(params.cam_resolution, params.cam_k1)
    P1 = tc.StudyCamera.pose(params.cam_pose_offset, *params.cam1_pose)
    P2 = tc.StudyCamera.pose(params.cam_pose_offset, *pose_cfg)

    u1_px, u2_px, inside = tc._observations_for_poses(
        cam1, cam2, P1, [P2], points_h, params.cam_noise_sigma,
        params.cam_noise_discretized)
    assert inside

    # device path (f32)
    import jax.numpy as jnp
    u1n = tc._normalize_obs(u1_px, cam1.f, cam1.c, cam1.k1,
                            jnp.dtype(jnp.float32))
    u2n = tc._normalize_obs(u2_px, cam2.f, cam2.c, cam2.k1,
                            jnp.dtype(jnp.float32))
    results = tc._eval_all_methods(
        u1n[0], jnp.asarray(P1, jnp.float32), u2n[0],
        jnp.asarray(P2, jnp.float32), jnp.asarray(points_xyz, jnp.float32),
        jnp.zeros(len(points_h), bool), cam1.f, tuple(cam1.c), cam1.k1)

    # reference path (f64, cv2.undistortPoints)
    K = np.array([[cam1.f, 0, cam1.c[0]], [0, cam1.f, cam1.c[1]], [0, 0, 1.0]])
    dist = np.array([params.cam_k1, 0.0, 0.0, 0.0])
    rms_got, rms_want = [], []
    for trial in range(tc.NUM_TRIALS):
        v1 = cv2.undistortPoints(u1_px[0, trial].reshape(-1, 1, 2), K,
                                 dist).reshape(-1, 2)
        v2 = cv2.undistortPoints(u2_px[0, trial].reshape(-1, 1, 2), K,
                                 dist).reshape(-1, 2)
        ref = reference_pose_eval(v1, P1, v2, P2, points_xyz)
        for mi, name in enumerate(
                ["linear_eigen", "linear_ls", "iterative_ls", "polynomial"]):
            got3d = np.asarray(results[mi][0][trial], dtype=np.float64)
            want3d = ref[name]
            rms_g = np.sqrt(np.mean(np.sum(got3d ** 2, axis=1)))
            rms_w = np.sqrt(np.mean(np.sum(want3d ** 2, axis=1)))
            rms_got.append(rms_g)
            rms_want.append(rms_w)
    rms_got = np.array(rms_got)
    rms_want = np.array(rms_want)
    # Error statistics must agree to well under a percent (f32 solver noise
    # atop noise-dominated errors of ~0.2-2 units).
    np.testing.assert_allclose(rms_got, rms_want, rtol=2e-2)
    # and the overall curves to tighter tolerance
    np.testing.assert_allclose(rms_got.mean(), rms_want.mean(), rtol=5e-3)


def test_noise_draws_match_reference_order():
    """The per-pose noise stream must reset the seed and draw cam1 then cam2
    per trial (triangulation_comparison.py:447-453)."""
    params = tc.StudyParams()
    points_h = tc.finite_points(2)
    cam1 = tc.StudyCamera(params.cam_resolution, 0.0)
    cam2 = tc.StudyCamera(params.cam_resolution, 0.0)
    P1 = tc.StudyCamera.pose(40.0)
    P2 = tc.StudyCamera.pose(40.0, 5.0)
    u1, u2, _ = tc._observations_for_poses(cam1, cam2, P1, [P2, P2],
                                           points_h, 0.8, True)
    # identical poses => identical noise (seed reset per pose)
    np.testing.assert_array_equal(u1[0], u1[1])
    np.testing.assert_array_equal(u2[0], u2[1])
    # manual replication of the draw order
    exact1 = cam1.project_exact(points_h, P1)
    exact2 = cam2.project_exact(points_h, P2)
    rng = np.random.RandomState(tc.RSEED)
    want_u1 = np.rint(exact1 + rng.normal(0, 0.8, exact1.shape))
    want_u2 = np.rint(exact2 + rng.normal(0, 0.8, exact2.shape))
    np.testing.assert_array_equal(u1[0, 0], want_u1)
    np.testing.assert_array_equal(u2[0, 0], want_u2)


def test_sigma_zero_draws_nothing():
    """sigma=0 must not advance the RNG (reference `if sigma:` guard)."""
    rng = np.random.RandomState(0)
    before = rng.get_state()[1][0]
    out = tc.apply_noise(np.zeros((5, 2)), 0.0, True, rng)
    after = rng.get_state()[1][0]
    assert before == after
    np.testing.assert_array_equal(out, 0)


def test_finite_points_count():
    # radius-4 integer sphere: 257 points (the reference's N for the study)
    assert len(tc.finite_points(4)) == 257
    # infinite disc: w == 0
    inf = tc.infinite_points(4, math.pi / 4)
    assert np.all(inf[:, 3] == 0)


def test_device_summary_path_matches_host_observation_path():
    """The on-device noise synthesis (exact + sigma*Z basis, jnp.round) must
    reproduce the host-drawn observation path (literal RandomState draws per
    pose) — validates the seed-reset/Z-basis equivalence the fast path
    relies on."""
    import jax.numpy as jnp

    params = tc.StudyParams()
    points_h = tc.finite_points(3)
    n = len(points_h)
    cam1 = tc.StudyCamera(params.cam_resolution, params.cam_k1)
    cam2 = tc.StudyCamera(params.cam_resolution, params.cam_k1)
    P1 = tc.StudyCamera.pose(40.0)
    P2s = [tc.StudyCamera.pose(40.0, 5.0), tc.StudyCamera.pose(40.0, 8.0)]

    u1_host, u2_host, _ = tc._observations_for_poses(
        cam1, cam2, P1, P2s, points_h, 0.8, True)

    Z1, Z2 = tc._noise_basis(n)
    exact1 = cam1.project_exact(points_h, P1)
    exact2 = np.stack([cam2.project_exact(points_h, P2) for P2 in P2s])
    u1_dev = np.rint(exact1[None, None] + 0.8 * Z1[None])
    u1_dev = np.broadcast_to(u1_dev, u1_host.shape)
    u2_dev = np.rint(exact2[:, None] + 0.8 * Z2[None])
    np.testing.assert_array_equal(u1_dev, u1_host)
    np.testing.assert_array_equal(u2_dev, u2_host)

    # and the full device pipeline produces the same RMS curves as running
    # _eval_all_methods on the host-drawn observations
    dt = jnp.float32
    res, inside = tc._eval_traj_summaries(
        jnp.asarray(exact1, dt), jnp.asarray(exact2, dt),
        jnp.asarray(Z1, dt), jnp.asarray(Z2, dt),
        jnp.full((2,), 0.8, dt), jnp.asarray(P1, dt),
        jnp.asarray(np.stack(P2s), dt)[:, None],
        jnp.asarray(points_h[:, :3], dt), cam1.f, tuple(cam1.c), cam1.k1,
        True)
    u1n = tc._normalize_obs(u1_host, cam1.f, cam1.c, cam1.k1, jnp.dtype(dt))
    u2n = tc._normalize_obs(u2_host, cam2.f, cam2.c, cam2.k1, jnp.dtype(dt))
    ref = tc._eval_all_methods(
        u1n, jnp.asarray(P1, dt), u2n,
        jnp.asarray(np.stack(P2s), dt)[:, None],
        jnp.asarray(points_h[:, :3], dt), jnp.zeros(n, bool),
        cam1.f, tuple(cam1.c), cam1.k1)
    for mi in range(4):
        err3d = np.asarray(ref[mi][0], np.float64)
        want = np.sqrt((err3d ** 2).sum(-1).reshape(2, -1).mean(1))
        got = np.asarray(res[mi]["err3D_mean"], np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-4)
