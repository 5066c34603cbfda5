"""IO layer: round-trips and wire-compatibility with reference artifacts."""

import os

import numpy as np
import pytest

from mqslam_tpu.io import tum, pcd, intrinsics, ba_info

REF = "/root/reference/Work/SLAM/datasets"
SVO_SEQ = os.path.join(REF, "SVO", "sin2_tex2_h1_v8_d")
needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference datasets not mounted")


class TestTUM:
    def test_roundtrip(self, tmp_path, rng):
        n = 17
        q = rng.randn(n, 4)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        traj = tum.CamTrajectory(np.arange(n) * 0.1, rng.randn(n, 3), q)
        f = tmp_path / "t.txt"
        tum.save_trajectory(f, traj)
        back = tum.load_trajectory(f)
        np.testing.assert_allclose(back.timestamps, traj.timestamps, atol=1e-12)
        np.testing.assert_allclose(back.locations, traj.locations, atol=1e-12)
        np.testing.assert_allclose(back.quaternions, traj.quaternions,
                                   atol=1e-9)

    @needs_ref
    def test_load_reference_groundtruth(self):
        traj = tum.load_trajectory(
            os.path.join(SVO_SEQ, "traj_groundtruth.txt"))
        assert len(traj) > 100
        # quaternions normalized
        np.testing.assert_allclose(
            np.linalg.norm(traj.quaternions, axis=1), 1.0, atol=1e-9)

    def test_extrinsic_roundtrip(self, rng):
        n = 5
        q = rng.randn(n, 4)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        traj = tum.CamTrajectory(np.arange(n) * 1.0,
                                 rng.randn(n, 3).astype(np.float64), q)
        P = tum.extrinsics_from_trajectory(traj)
        back = tum.trajectory_from_extrinsics(traj.timestamps, P)
        np.testing.assert_allclose(back.locations, traj.locations, atol=1e-5)
        sign = np.sign(np.sum(back.quaternions * traj.quaternions, axis=1,
                              keepdims=True))
        np.testing.assert_allclose(back.quaternions * sign, traj.quaternions,
                                   atol=1e-5)


class TestPCD:
    def test_roundtrip_with_alpha(self, tmp_path, rng):
        pts = rng.randn(50, 3).astype(np.float32)
        colors = rng.randint(0, 255, size=(50, 4)).astype(np.uint8)
        f = tmp_path / "m.pcd"
        pcd.save_pcd(f, pts, colors)
        back_pts, back_colors, found_alpha = pcd.load_pcd(f, use_alpha=True)
        np.testing.assert_allclose(back_pts, pts, rtol=1e-6)
        assert found_alpha
        # BGR exact; alpha LSBs forced to 0b01 (dataset_tools.py:254-258)
        np.testing.assert_array_equal(back_colors[:, :3], colors[:, :3])
        np.testing.assert_array_equal(back_colors[:, 3] & 0b11,
                                      np.ones(50, dtype=np.uint8))
        np.testing.assert_array_equal(back_colors[:, 3] & 0b11111100,
                                      colors[:, 3] & 0b11111100)

    def test_roundtrip_no_color(self, tmp_path, rng):
        pts = rng.randn(10, 3).astype(np.float32)
        f = tmp_path / "m.pcd"
        pcd.save_pcd(f, pts)
        back_pts, back_colors, found_alpha = pcd.load_pcd(f)
        np.testing.assert_allclose(back_pts, pts, rtol=1e-6)
        assert back_colors is None and not found_alpha

    @needs_ref
    def test_load_reference_map(self):
        pts, colors, found_alpha = pcd.load_pcd(
            os.path.join(SVO_SEQ, "map_out-slam2.pcd"), use_alpha=True)
        assert len(pts) > 100
        assert found_alpha
        # saved by the reference => alpha LSBs are 0b01
        assert np.all((colors[:, 3] & 0b11) == 1)


class TestIntrinsics:
    @needs_ref
    def test_load_icl_nuim(self):
        K, dist, size = intrinsics.load_camera_intrinsics(
            os.path.join(REF, "ICL_NUIM", "camera_intrinsics.txt"))
        np.testing.assert_allclose(K[0, 0], 481.20)
        np.testing.assert_allclose(K[1, 1], -480.00)  # negative fy!
        np.testing.assert_allclose(K[0, 2], 319.50)
        np.testing.assert_allclose(dist, 0.0)
        assert size == (640, 480)

    def test_roundtrip(self, tmp_path):
        K = np.array([[520.9, 0.0, 325.1], [0.0, 521.0, 249.7],
                      [0.0, 0.0, 1.0]])
        dist = np.array([0.05, -0.1, 1e-3, -2e-3, 0.0])
        f = tmp_path / "intr.txt"
        intrinsics.save_camera_intrinsics(f, K, dist, (640, 480))
        K2, dist2, size2 = intrinsics.load_camera_intrinsics(f)
        np.testing.assert_allclose(K2, K)
        np.testing.assert_allclose(dist2, dist)
        assert size2 == (640, 480)

    def test_rejects_code(self, tmp_path):
        f = tmp_path / "evil.txt"
        f.write_text("__import__('os').system('true'), 2, 3")
        with pytest.raises(ValueError):
            intrinsics.load_camera_intrinsics(f)


class TestBAInfo:
    @needs_ref
    def test_load_reference_dump(self):
        data = ba_info.load_ba_data(SVO_SEQ, "slam2", nr_cameras=1, fps=50)
        assert data.nr_cameras == 1
        # noise models as documented in BASELINE.md
        assert data.pose_noise[0].kind == "Diagonal"
        np.testing.assert_allclose(data.pose_noise[0].sigmas[:3], 0.002)
        assert data.point3D_noise.kind == "Isotropic"
        assert data.point2D_noise[0].kind == "Isotropic"
        # calibration: 9 params, fx ~ 329.11 (SVO dataset)
        assert len(data.calibrations[0]) == 9
        # structure: steps align across sections
        assert data.nr_steps > 100
        assert len(data.points2D[0]) >= 1
        assert len(data.point2D3D_assocs[0]) == data.nr_steps \
            or abs(len(data.point2D3D_assocs[0]) - data.nr_steps) <= 1
        assert len(data.poses[0]) == data.nr_steps
        # some frames have valid poses, map has points
        valid = [p for p in data.poses[0] if p is not None]
        assert len(valid) > 50
        assert len(data.points3D) > 100
        # all 2D-3D assocs reference valid landmark indices
        for step in data.point2D3D_assocs[0]:
            if len(step):
                assert step[:, 2].max() < len(data.points3D)

    @needs_ref
    def test_roundtrip_through_writer(self, tmp_path):
        data = ba_info.load_ba_data(SVO_SEQ, "slam2", nr_cameras=1, fps=50)
        ba_info.save_ba_data(str(tmp_path), "slam2", data)
        back = ba_info.load_ba_data(str(tmp_path), "slam2", nr_cameras=1,
                                    fps=50)
        assert back.nr_steps == data.nr_steps
        np.testing.assert_allclose(back.points3D, data.points3D, atol=1e-6)
        np.testing.assert_allclose(back.calibrations[0],
                                   data.calibrations[0])
        assert len(back.odometry) == len(data.odometry)
        for s1, s2 in zip(data.odometry, back.odometry):
            for P1, P2 in zip(s1, s2):
                np.testing.assert_allclose(P1, P2, atol=1e-6)
        for s1, s2 in zip(data.point2D3D_assocs[0],
                          back.point2D3D_assocs[0]):
            np.testing.assert_array_equal(s1, s2)
        # pose holes preserved
        holes1 = [i for i, p in enumerate(data.poses[0]) if p is None]
        holes2 = [i for i, p in enumerate(back.poses[0]) if p is None]
        assert holes1 == holes2
