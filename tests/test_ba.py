"""Bundle adjustment vs the reference's checked-in GTSAM goldens."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mqslam_tpu.ba import problem as ba_problem, solver as ba_solver
from mqslam_tpu.io import ba_info, tum, pcd

EXAMPLE = "/root/reference/Work/SLAM/tools/bundle_adjustment/example"
needs_ref = pytest.mark.skipif(not os.path.isdir(EXAMPLE),
                               reason="reference example not mounted")


@pytest.fixture(scope="module")
def synthetic_problem():
    data = ba_info.load_ba_data(EXAMPLE, "synthetic", nr_cameras=2, fps=1)
    prob = ba_problem.problem_from_ba_data(data)
    return data, prob


@needs_ref
class TestSyntheticCubeExample:
    """The 2-camera cube-orbit scenario (GenerateData.hpp:79-306), solved by
    the reference with GTSAM full LM; goldens under example/."""

    def test_problem_structure(self, synthetic_problem):
        data, prob = synthetic_problem
        assert data.nr_cameras == 2
        assert data.nr_steps == 20
        assert int(prob.pose_valid.sum()) == 40
        assert int(prob.point_valid.sum()) == 8
        assert int(prob.obs_valid.sum()) > 300
        # cross-camera "stereo" odometry factors exist
        # (GenerateData.hpp:256-269)
        f = np.asarray(prob.odo_from)[np.asarray(prob.odo_valid)]
        t = np.asarray(prob.odo_to)[np.asarray(prob.odo_valid)]
        S = data.nr_steps
        cross = (f // S) != (t // S)
        assert cross.sum() == 20

    def test_lm_reduces_cost(self, synthetic_problem):
        _, prob = synthetic_problem
        v, history = ba_solver.lm_solve(prob, max_iters=15)
        assert history[-1] < history[0] * 0.1
        assert np.isfinite(history[-1])

    @pytest.mark.parametrize("seed", [1, 2])
    def test_dense_and_cg_agree_under_masking(self, synthetic_problem,
                                              seed):
        """Agreement must survive structural edge cases: randomly
        invalidated observations/odometry (leaving some poses obs-free and
        some landmarks single-observation) and a masked pose."""
        _, prob = synthetic_problem
        rng = np.random.RandomState(seed)
        obs_valid = np.asarray(prob.obs_valid) & (
            rng.rand(prob.obs_valid.shape[0]) > 0.4)
        odo_valid = np.asarray(prob.odo_valid) & (
            rng.rand(prob.odo_valid.shape[0]) > 0.5)
        pose_valid = np.asarray(prob.pose_valid).copy()
        pose_valid[rng.randint(1, prob.n_poses)] = False
        prob = prob._replace(obs_valid=jnp.asarray(obs_valid),
                             odo_valid=jnp.asarray(odo_valid),
                             pose_valid=jnp.asarray(pose_valid))
        lin = ba_solver.linearize(prob, prob.init)
        dcd, dpd = ba_solver.solve_delta_dense(prob, lin, jnp.float32(1e-3))
        dcc, dpc, _ = ba_solver.solve_delta(prob, lin, jnp.float32(1e-3),
                                            cg_iters=3000, cg_tol=1e-12)
        assert np.isfinite(np.asarray(dcd)).all()
        scale = max(float(jnp.abs(dcc).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(dcd), np.asarray(dcc),
                                   atol=5e-3 * scale)
        # the masked pose must not move
        assert float(jnp.abs(dcd[np.flatnonzero(~pose_valid)]).max()) == 0.0

    def test_dense_and_cg_solves_agree(self, synthetic_problem):
        """solve_delta_dense must produce the same Newton step as the
        matrix-free CG path (incl. the odometry cross blocks — the cube
        scenario has per-camera + cross-camera between factors)."""
        _, prob = synthetic_problem
        lin = ba_solver.linearize(prob, prob.init)
        dcd, dpd = ba_solver.solve_delta_dense(prob, lin, jnp.float32(1e-4))
        dcc, dpc, _ = ba_solver.solve_delta(prob, lin, jnp.float32(1e-4),
                                            cg_iters=3000, cg_tol=1e-12)
        scale = max(float(jnp.abs(dcc).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(dcd), np.asarray(dcc),
                                   atol=2e-3 * scale)
        np.testing.assert_allclose(np.asarray(dpd), np.asarray(dpc),
                                   atol=2e-3 * max(
                                       float(jnp.abs(dpc).max()), 1e-6))

    def test_matches_gtsam_golden(self, synthetic_problem):
        data, prob = synthetic_problem
        v, history = ba_solver.lm_solve(prob, max_iters=20)
        # compare optimized camera centers with the reference's -BA golden
        S = data.nr_steps
        for c in range(2):
            golden = tum.load_trajectory(
                os.path.join(EXAMPLE, f"traj_out.cam{c}-synthetic-BA.txt"))
            noisy = tum.load_trajectory(
                os.path.join(EXAMPLE, f"traj_out.cam{c}-synthetic.txt"))
            ours = np.asarray(v.pose_t[c * S:(c + 1) * S])
            err_ours = np.linalg.norm(ours - golden.locations, axis=1)
            err_in = np.linalg.norm(noisy.locations - golden.locations,
                                    axis=1)
            # our optimum must sit much closer to GTSAM's optimum than the
            # noisy input does
            assert err_ours.mean() < 0.25 * err_in.mean(), (
                c, err_ours.mean(), err_in.mean())

        # landmarks: golden BA map vs ours
        golden_map, _, _ = pcd.load_pcd(
            os.path.join(EXAMPLE, "map_out-synthetic-BA.pcd"),
            use_alpha=True)
        noisy_map, _, _ = pcd.load_pcd(
            os.path.join(EXAMPLE, "map_out-synthetic.pcd"), use_alpha=True)
        ours_pts = np.asarray(v.points[:8])
        err_ours = np.linalg.norm(ours_pts - golden_map[:8], axis=1)
        err_in = np.linalg.norm(noisy_map[:8] - golden_map[:8], axis=1)
        assert err_ours.mean() < 0.3 * max(err_in.mean(), 1e-3), (
            err_ours, err_in)

    def test_invalid_entries_not_touched(self, synthetic_problem):
        _, prob = synthetic_problem
        v, _ = ba_solver.lm_solve(prob, max_iters=3)
        inv = ~np.asarray(prob.point_valid)
        if inv.any():
            np.testing.assert_array_equal(
                np.asarray(v.points)[inv], np.asarray(prob.init.points)[inv])


class TestSolverOnFrontendOutput:
    """BA over our own front-end's dump (config #3 pipeline slice)."""

    def test_ba_improves_synthetic_vo(self):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_frontend import (make_sequence, init_from_frame0, CAL, CFG)
        from mqslam_tpu.frontend.runner import run_frontend
        from mqslam_tpu.eval import ate
        from mqslam_tpu.core import se3

        rng = np.random.RandomState(3)
        imgs, P_gt = make_sequence(rng, 12)
        uv0, objp0 = init_from_frame0(imgs[0], P_gt[0])
        res = run_frontend(imgs, CAL, CFG, uv0, objp0, fps=30.0)
        prob = ba_problem.problem_from_ba_data(res.ba_data)
        v, history = ba_solver.lm_solve(prob, max_iters=10)
        assert history[-1] <= history[0]
        # optimized trajectory still matches ground truth
        q_gt, c_gt = se3.to_pose_tum(jnp.asarray(P_gt))
        valid = np.asarray(prob.pose_valid)
        ts = np.flatnonzero(valid) / 30.0
        traj = tum.CamTrajectory(
            ts, np.asarray(v.pose_t)[valid],
            np.asarray(v.pose_r)[valid][:, [0, 1, 2]] * 0 + np.array(
                [0, 0, 0.0]))  # quats unused by ATE
        gt = tum.CamTrajectory(np.arange(len(P_gt)) / 30.0,
                               np.asarray(c_gt), np.asarray(q_gt))
        result = ate.evaluate_ate(
            tum.CamTrajectory(traj.timestamps, traj.locations,
                              np.tile([0, 0, 0, 1.0], (len(ts), 1))),
            gt, max_difference=1e-3)
        assert result.rmse < 0.03, result.rmse


@needs_ref
class TestRealDataSVO:
    """Config #3 headline: BA over the reference's real SVO slam2 dump must
    reach the published accuracy class (results_ate-slam2-BA.txt: 0.021598;
    front-end-only: 0.395356)."""

    def test_ba_reaches_reference_accuracy(self):
        import jax.numpy as jnp
        from mqslam_tpu.eval import ate as ate_mod
        from mqslam_tpu.core import so3, quat

        SVO = ("/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d")
        data = ba_info.load_ba_data(SVO, "slam2", nr_cameras=1, fps=50)
        prob = ba_problem.problem_from_ba_data(data)
        # the reference's documented BA invocation disables odometry factors
        # (bundle_adjust ... useOdometry=0, bundle_adjustment/ReadMe.txt)
        prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
        # default = the dense-Schur direct path (solve_delta_dense)
        v, hist = ba_solver.lm_solve(prob, max_iters=40)
        gt = tum.load_trajectory(os.path.join(SVO, "traj_groundtruth.txt"))
        valid = np.asarray(prob.pose_valid)
        ts = (np.flatnonzero(valid) + 1) / 50.0

        def traj_of(vv):
            R = so3.exp(jnp.asarray(np.asarray(vv.pose_r)[valid]))
            q = np.asarray(quat.from_matrix(R))
            return tum.CamTrajectory(ts, np.asarray(vv.pose_t)[valid], q)

        res = ate_mod.evaluate_ate(traj_of(v), gt, max_difference=0.011)
        # f32 LM alone lands in the GTSAM basin (published: 0.021598 BA /
        # 0.395356 front-end input; within the basin's flat valley the f32
        # stopping point wanders a few mm — the f64 polish below settles it).
        # Measured stopping ATE on this CPU suite: dense 0.0303, cg 0.0309
        # (the TPU backend wanders further, dense 0.053 / cg 0.027 — same
        # final cost to 4 digits; tests run on CPU via conftest). Gate at
        # measured + ~10% so genuine drift is caught.
        assert res.rmse < 0.033, res.rmse

        # the f64 finishing pass must BEAT the GTSAM golden: the valley
        # continues below the f32 cost-resolution floor (ba/polish64.py;
        # measured 0.02145 vs GTSAM's 0.021598)
        from mqslam_tpu.ba.polish64 import polish64
        v2, hist64 = polish64(prob, v, max_iters=12)
        assert hist64[-1] <= hist64[0]
        res2 = ate_mod.evaluate_ate(traj_of(v2), gt, max_difference=0.011)
        assert res2.rmse < 0.0216, res2.rmse
        assert res2.rmse <= res.rmse + 1e-6

    def test_incremental_completes_on_real_dump(self):
        """The reference's iSAM modes throw IndeterminantLinearSystem on
        its own slam2 dumps (bundle_adjustment/ReadMe.txt); our
        step-batched incremental mode must complete and keep cost finite
        (first 40 steps here; the full 186-step run reaches ATE 0.234 m
        vs the 0.395 m front-end input — ba/incremental.py docstring)."""
        import jax.numpy as jnp
        from mqslam_tpu.ba import incremental as binc

        SVO = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
        data = ba_info.load_ba_data(SVO, "slam2", nr_cameras=1, fps=50)
        prob = ba_problem.problem_from_ba_data(data)
        prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
        v, hist = binc.incremental_solve(data, prob, use_odometry=False,
                                         max_steps=40)
        assert len(hist) == 40
        assert np.isfinite(hist).all()
        assert np.isfinite(np.asarray(v.pose_t)).all()


@needs_ref
class TestDeviceLoop:
    """lm_solve_device (ba/solver.py): the whole LM outer loop as one
    lax.while_loop dispatch must follow the same accept/reject policy as
    the host-controlled lm_solve."""

    @pytest.mark.parametrize("method", ["dense", "cg"])
    def test_matches_host_loop(self, synthetic_problem, method):
        _, prob = synthetic_problem
        v_h, hist_h = ba_solver.lm_solve(prob, max_iters=12, method=method,
                                         cg_iters=200)
        v_d, hist_d, n = ba_solver.lm_solve_device(
            prob, max_iters=12, method=method, cg_iters=200)
        assert n == len(hist_d) - 1
        # same policy, same f32 math -> same accepted-cost trajectory up to
        # accumulation-order roundoff
        m = min(len(hist_h), len(hist_d))
        np.testing.assert_allclose(hist_h[:m], hist_d[:m], rtol=5e-3)
        assert hist_d[-1] < hist_d[0] * 0.1
        np.testing.assert_allclose(np.asarray(v_d.pose_t),
                                   np.asarray(v_h.pose_t), atol=5e-3)

    def test_respects_masking(self, synthetic_problem):
        _, prob = synthetic_problem
        pose_valid = np.asarray(prob.pose_valid).copy()
        pose_valid[3] = False
        prob = prob._replace(pose_valid=jnp.asarray(pose_valid))
        v, hist, _ = ba_solver.lm_solve_device(prob, max_iters=5)
        np.testing.assert_array_equal(np.asarray(v.pose_t)[3],
                                      np.asarray(prob.init.pose_t)[3])
        assert hist[-1] <= hist[0]


class TestCorridorScale:
    """Production-scale synthetic corridor scenario
    (ba/synthetic.py::generate_corridor_problem): the CG path must solve a
    problem far beyond the reference scenario's 8 landmarks."""

    def test_cg_recovers_geometry(self):
        from mqslam_tpu.ba import synthetic as bsyn

        prob, v_true = bsyn.generate_corridor_problem(nr_frames=64,
                                                      points_per_frame=8)
        assert int(prob.obs_valid.sum()) > 3000
        v, hist = ba_solver.lm_solve(prob, max_iters=20, method="cg",
                                     cg_iters=300)
        c_true = float(ba_solver.compute_cost(prob, v_true))
        assert hist[-1] < 2.0 * c_true, (hist[-1], c_true)
        err = np.linalg.norm(np.asarray(v.pose_t)
                             - np.asarray(v_true.pose_t), axis=1)
        err0 = np.linalg.norm(np.asarray(prob.init.pose_t)
                              - np.asarray(v_true.pose_t), axis=1)
        # BA must cut the injected pose noise by at least 3x
        assert err.mean() < err0.mean() / 3.0, (err.mean(), err0.mean())

    def test_device_loop_cg_matches(self):
        from mqslam_tpu.ba import synthetic as bsyn

        prob, v_true = bsyn.generate_corridor_problem(nr_frames=64,
                                                      points_per_frame=8)
        v_h, hist_h = ba_solver.lm_solve(prob, max_iters=8, method="cg",
                                         cg_iters=200)
        v_d, hist_d, n = ba_solver.lm_solve_device(prob, max_iters=8,
                                                   method="cg",
                                                   cg_iters=200)
        m = min(len(hist_h), len(hist_d))
        np.testing.assert_allclose(hist_h[:m], hist_d[:m], rtol=1e-2)
