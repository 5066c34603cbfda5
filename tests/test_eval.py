"""Evaluation tools: unit properties + exact reproduction of the
reference's published results files."""

import math
import os

import numpy as np
import pytest

from mqslam_tpu.eval import associate, ate, rpe, alignment
from mqslam_tpu.io import tum

SVO = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
needs_ref = pytest.mark.skipif(not os.path.isdir(SVO),
                               reason="reference not mounted")


class TestAssociate:
    def test_greedy_best_match(self):
        m = associate.associate_arrays([0.0, 1.0, 2.0], [0.015, 1.2, 1.99],
                                       max_difference=0.02)
        assert m == [(0, 0), (2, 2)]

    def test_each_used_once(self):
        m = associate.associate_arrays([0.0, 0.01], [0.005],
                                       max_difference=0.02)
        assert len(m) == 1


class TestAteUnit:
    def test_horn_recovers_rigid_transform(self, rng):
        pts = rng.randn(50, 3)
        from scipy.spatial.transform import Rotation
        R = Rotation.random(random_state=rng).as_matrix()
        t = rng.randn(3)
        moved = pts @ R.T + t
        R2, t2, err = ate.horn_align(pts, moved)
        np.testing.assert_allclose(R2, R, atol=1e-9)
        np.testing.assert_allclose(t2, t, atol=1e-9)
        assert err.max() < 1e-9


@needs_ref
class TestPublishedNumbers:
    """Exact reproduction of the reference's checked-in results files
    (BASELINE.md table)."""

    CASES_ATE = [
        ("traj_out.cam0-slam2.txt", 0.395356),
        ("traj_out.cam0-slam2-BA.txt", 0.021598),
        ("traj_out-SVO-trfm.txt", 0.022224),
    ]
    CASES_RPE = [
        ("traj_out.cam0-slam2.txt", 0.424314, 1.072250),
        ("traj_out.cam0-slam2-BA.txt", 0.022514, 0.145430),
        ("traj_out-SVO-trfm.txt", 0.025031, 0.060772),
    ]

    @pytest.mark.parametrize("fname,published", CASES_ATE)
    def test_ate(self, fname, published):
        gt = tum.load_trajectory(os.path.join(SVO, "traj_groundtruth.txt"))
        est = tum.load_trajectory(os.path.join(SVO, fname))
        r = ate.evaluate_ate(est, gt, max_difference=0.02)
        assert abs(r.rmse - published) < 5e-6, (fname, r.rmse)

    @pytest.mark.parametrize("fname,pub_trans,pub_rot", CASES_RPE)
    def test_rpe(self, fname, pub_trans, pub_rot):
        gt = tum.load_trajectory(os.path.join(SVO, "traj_groundtruth.txt"))
        est = tum.load_trajectory(os.path.join(SVO, fname))
        r = rpe.evaluate_rpe(est, gt, fixed_delta=True, delta=1.0,
                             delta_unit="s")
        assert abs(r.trans_rmse - pub_trans) < 5e-6, (fname, r.trans_rmse)
        assert abs(math.degrees(r.rot_rmse) - pub_rot) < 5e-6


@needs_ref
class TestCliOutputs:
    """The CLI's --plot/--save/--save_associations surfaces
    (evaluate_ate.py:125-197, evaluate_rpe.py:321-386)."""

    def test_ate_plot_save(self, tmp_path):
        from mqslam_tpu.cli import evaluate_ate as cli
        gt = os.path.join(SVO, "traj_groundtruth.txt")
        est = os.path.join(SVO, "traj_out.cam0-slam2-BA.txt")
        plot = tmp_path / "ate.pdf"
        save = tmp_path / "aligned.txt"
        assoc = tmp_path / "assoc.txt"
        assert cli.main([gt, est, "--plot", str(plot), "--save", str(save),
                         "--save_associations", str(assoc)]) == 0
        assert plot.stat().st_size > 1000
        aligned = np.loadtxt(save)
        assert aligned.shape[1] == 4
        pairs = np.loadtxt(assoc)
        assert pairs.shape[1] == 8
        # associations pair gt with the ALIGNED estimate: distances must
        # reproduce the ATE rmse
        d = np.linalg.norm(pairs[:, 1:4] - pairs[:, 5:8], axis=1)
        r = ate.evaluate_ate(tum.load_trajectory(est),
                             tum.load_trajectory(gt))
        # --save writes %f fixed-point (reference format): 6-decimal
        # truncation moves the recomputed rmse by O(1e-8)
        assert abs(np.sqrt(np.mean(d ** 2)) - r.rmse) < 1e-6

    def test_rpe_plot_save(self, tmp_path):
        from mqslam_tpu.cli import evaluate_rpe as cli
        gt = os.path.join(SVO, "traj_groundtruth.txt")
        est = os.path.join(SVO, "traj_out.cam0-slam2-BA.txt")
        plot = tmp_path / "rpe.pdf"
        save = tmp_path / "rpe.txt"
        assert cli.main([gt, est, "--fixed_delta", "--plot", str(plot),
                         "--save", str(save)]) == 0
        assert plot.stat().st_size > 1000
        rows = np.loadtxt(save)
        assert rows.shape[1] == 6
        r = rpe.evaluate_rpe(tum.load_trajectory(est),
                             tum.load_trajectory(gt), fixed_delta=True)
        assert abs(np.sqrt(np.mean(rows[:, 4] ** 2)) - r.trans_rmse) < 1e-6

    def test_rpe_plot_requires_fixed_delta(self, tmp_path):
        from mqslam_tpu.cli import evaluate_rpe as cli
        with pytest.raises(SystemExit):
            cli.main([os.path.join(SVO, "traj_groundtruth.txt"),
                      os.path.join(SVO, "traj_out.cam0-slam2-BA.txt"),
                      "--plot", str(tmp_path / "x.png")])


class TestAlignment:
    def test_anchored_transform_roundtrip(self, rng):
        from scipy.spatial.transform import Rotation
        n = 30
        q = Rotation.random(n, random_state=rng).as_quat()
        traj_to = tum.CamTrajectory(np.arange(n) * 0.1,
                                    rng.randn(n, 3).astype(np.float64), q)
        # build "from" = inverse-transformed version with known sim3
        dq = Rotation.from_rotvec([0.1, -0.2, 0.15]).as_quat()
        s = 1.7
        dl = np.array([0.3, -1.0, 0.5])
        Rm = Rotation.from_quat(dq).as_matrix()
        locs_from = (np.linalg.inv(Rm) @ ((traj_to.locations - dl) / s).T).T
        quats_from = Rotation.from_quat(
            [(Rotation.from_quat(dq).inv()
              * Rotation.from_quat(qq)).as_quat() for qq in q]).as_quat()
        traj_from = tum.CamTrajectory(traj_to.timestamps, locs_from,
                                      quats_from)
        trfm = alignment.transform_between_trajectories(
            traj_from, traj_to, at_frame=1, offset_frames=5)
        assert abs(trfm[1] - s) < 1e-5
        back = alignment.transform_trajectory(traj_from, trfm)
        np.testing.assert_allclose(back.locations, traj_to.locations,
                                   atol=1e-5)
