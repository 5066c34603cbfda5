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

    def test_incremental_device_loop_on_real_dump(self):
        """incremental_solve_device: the whole step schedule as one
        dispatch must land in the same basin as the host-driven loop
        (per-step trajectories may flip at marginal accepts — costs equal
        to ~7 digits — and re-converge; final accuracy is the contract).
        First 40 steps here for CI speed; the full 186-step device run
        reaches ATE 0.025 (host loop: 0.027, full batch: 0.021)."""
        import jax.numpy as jnp
        from mqslam_tpu.ba import incremental as binc

        SVO = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
        data = ba_info.load_ba_data(SVO, "slam2", nr_cameras=1, fps=50)
        prob = ba_problem.problem_from_ba_data(data)
        prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
        v_h, hist_h = binc.incremental_solve(data, prob, use_odometry=False,
                                             max_steps=40)
        v_d, hist_d = binc.incremental_solve_device(
            data, prob, use_odometry=False, max_steps=40)
        assert len(hist_d) == 40
        assert np.isfinite(hist_d).all()
        # same final basin as the host loop
        assert abs(hist_d[-1] - hist_h[-1]) < 0.05 * max(abs(hist_h[-1]),
                                                         1e-6), (
            hist_d[-1], hist_h[-1])
        # ATE gate on the 40-step prefix: the device loop's trajectory
        # itself (not just its cost) must match ground truth over the
        # frames active by step 40 (the full 186-step run reaches 0.025;
        # the 40-step prefix sits well under this 0.012 gate)
        from mqslam_tpu.eval import ate as ate_mod
        from mqslam_tpu.core import so3, quat
        gt = tum.load_trajectory(os.path.join(SVO, "traj_groundtruth.txt"))
        _, _, pose_step, _ = binc.activation_steps(data, prob)
        valid = np.asarray(prob.pose_valid) & (np.asarray(pose_step) <= 39)
        ts = (np.flatnonzero(valid) + 1) / 50.0
        R = so3.exp(jnp.asarray(np.asarray(v_d.pose_r)[valid]))
        q = np.asarray(quat.from_matrix(R))
        traj = tum.CamTrajectory(ts, np.asarray(v_d.pose_t)[valid], q)
        res = ate_mod.evaluate_ate(traj, gt, max_difference=0.011)
        assert res.rmse < 0.012, res.rmse

    def test_incremental_completes_on_real_dump(self):
        """The reference's iSAM modes throw IndeterminantLinearSystem on
        its own slam2 dumps (bundle_adjustment/ReadMe.txt); our
        step-batched incremental mode must complete and keep cost finite
        (first 40 steps here; the full 186-step run with exact dense
        per-step solves reaches ATE 0.027 m vs the 0.395 m front-end
        input — ba/incremental.py docstring)."""
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


class TestPackedLayout:
    """Direct packed-vs-COO agreement for the large-scale CG path
    (ba/packed.py + solver._packed_ops): the packed matvecs,
    cross-permutations, and preconditioner blocks must reproduce the COO
    gather/scatter form exactly (same math, different data layout)."""

    @staticmethod
    def _corridor(n=24, ppf=6):
        from mqslam_tpu.ba import synthetic as bsyn
        prob, _ = bsyn.generate_corridor_problem(nr_frames=n,
                                                 points_per_frame=ppf)
        return prob

    @staticmethod
    def _layout(prob):
        from mqslam_tpu.ba.packed import build_packed_layout
        return build_packed_layout(prob.obs_pose, prob.obs_point,
                                   prob.obs_valid, prob.n_poses,
                                   prob.n_points)

    def test_matvecs_match_coo(self):
        """Each packed apply (Hcc-obs, W^T, W, preconditioner blocks)
        against its COO counterpart on the same linearization."""
        import jax.numpy as jnp
        from mqslam_tpu.ops import linalg

        prob = self._corridor()
        layout = self._layout(prob)
        assert layout is not None
        lin = ba_solver.linearize(prob, prob.init)
        hcc_obs, wt_v, w_ap, pre_obs = ba_solver._packed_ops(
            prob, lin, layout)

        rng = np.random.RandomState(0)
        v6 = jnp.asarray(rng.randn(prob.n_poses, 6), jnp.float32)
        u3 = jnp.asarray(rng.randn(prob.n_points, 3), jnp.float32)

        # Hcc observation part
        from jax.ops import segment_sum
        y = ba_solver._Jv(lin.J_obs_pose, v6[prob.obs_pose])
        hcc_coo = segment_sum(ba_solver._JTr(lin.J_obs_pose, y),
                              prob.obs_pose, num_segments=prob.n_poses)
        np.testing.assert_allclose(np.asarray(hcc_obs(v6)),
                                   np.asarray(hcc_coo), rtol=1e-4,
                                   atol=1e-3 * float(
                                       jnp.abs(hcc_coo).max()))
        # W^T v (pose -> point) via the dual-layout Jacobians
        wt_coo = ba_solver._w_t_apply(prob, lin, v6)
        np.testing.assert_allclose(np.asarray(wt_v(v6)), np.asarray(wt_coo),
                                   rtol=1e-4,
                                   atol=1e-3 * float(jnp.abs(wt_coo).max()))
        # W u (point -> pose)
        w_coo = ba_solver._w_apply(prob, lin, u3)
        np.testing.assert_allclose(np.asarray(w_ap(u3)), np.asarray(w_coo),
                                   rtol=1e-4,
                                   atol=1e-3 * float(jnp.abs(w_coo).max()))
        # preconditioner obs blocks vs the COO AHA^T construction
        lam = jnp.float32(1e-3)
        dp = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
        Hpp_d = lin.Hpp + (lam * jnp.maximum(dp, 1e-12))[..., None] \
            * jnp.eye(3, dtype=jnp.float32)[None]
        point_mask = lin.point_free[:, None].astype(jnp.float32)
        Hpp_inv = linalg.inv3x3(Hpp_d) * point_mask[..., None]
        A = jnp.sum(lin.J_obs_pose[:, :, :, None]
                    * lin.J_obs_point[:, :, None, :], axis=1)
        Hj = Hpp_inv[prob.obs_point]
        AH = jnp.sum(A[:, :, :, None] * Hj[:, None, :, :], axis=2)
        AHA = jnp.sum(AH[:, :, None, :] * A[:, None, :, :], axis=3)
        blk_coo = segment_sum(ba_solver._JTJ(lin.J_obs_pose) - AHA,
                              prob.obs_pose, num_segments=prob.n_poses)
        blk_packed = pre_obs(Hpp_inv)
        np.testing.assert_allclose(np.asarray(blk_packed),
                                   np.asarray(blk_coo), rtol=1e-4,
                                   atol=1e-3 * float(
                                       jnp.abs(blk_coo).max()))

    @needs_ref
    @pytest.mark.parametrize("seed", [1, 2])
    def test_solve_delta_matches_coo_under_masking(self, synthetic_problem,
                                                   seed):
        """Packed solve_delta vs COO solve_delta on the cube problem with
        randomly invalidated observations/odometry and a masked pose — the
        same edge cases the dense-vs-CG agreement test uses."""
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
        layout = self._layout(prob)
        assert layout is not None
        lin = ba_solver.linearize(prob, prob.init)
        dcc, dpc, itc = ba_solver.solve_delta(prob, lin, jnp.float32(1e-3),
                                              cg_iters=3000, cg_tol=1e-12)
        dcp, dpp, itp = ba_solver.solve_delta(prob, lin, jnp.float32(1e-3),
                                              cg_iters=3000, cg_tol=1e-12,
                                              layout=layout)
        scale = max(float(jnp.abs(dcc).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(dcp), np.asarray(dcc),
                                   atol=1e-3 * scale)
        np.testing.assert_allclose(
            np.asarray(dpp), np.asarray(dpc),
            atol=1e-3 * max(float(jnp.abs(dpc).max()), 1e-6))
        # the masked pose must not move under the packed path either
        assert float(jnp.abs(dcp[np.flatnonzero(~pose_valid)]).max()) == 0.0
        # same preconditioner => comparable CG iteration counts
        assert abs(int(itp) - int(itc)) <= max(int(itc) // 2, 10)

    def test_lm_packed_matches_coo_full_solve(self):
        """Full lm_solve trajectories with layout packed vs explicitly
        disabled must land in the same basin."""
        prob = self._corridor()
        layout = self._layout(prob)
        assert layout is not None
        v_p, hist_p = ba_solver.lm_solve(prob, max_iters=8, method="cg",
                                         cg_iters=300, layout=layout)
        v_c, hist_c = ba_solver.lm_solve(prob, max_iters=8, method="cg",
                                         cg_iters=300, layout=None)
        # truncated-CG solves amplify layout-order roundoff through the
        # accept/reject branching: trajectories track within ~1e-3 early
        # and drift <= ~1% by convergence (measured 0.8% at iter 8)
        m = min(len(hist_p), len(hist_c))
        np.testing.assert_allclose(hist_p[:m], hist_c[:m], rtol=2e-2)
        assert hist_p[-1] < hist_p[0] * 1e-3

    def test_degenerate_one_pose_bails_out(self):
        """One pose holding nearly all observations makes [F, Kf]
        quadratic: build_packed_layout must return None (ratio guard)."""
        from mqslam_tpu.ba.packed import build_packed_layout
        O, F, P = 512, 64, 64
        obs_pose = np.zeros(O, np.int32)  # all on pose 0
        obs_point = np.arange(O, dtype=np.int32) % P
        layout = build_packed_layout(obs_pose, obs_point,
                                     np.ones(O, bool), F, P)
        assert layout is None

    def test_empty_valid_obs_returns_none(self):
        """Zero valid observations must return None, not crash (the
        pid_f build would index an empty array)."""
        from mqslam_tpu.ba.packed import build_packed_layout
        layout = build_packed_layout(np.zeros(8, np.int32),
                                     np.zeros(8, np.int32),
                                     np.zeros(8, bool), 4, 4)
        assert layout is None

    def test_padding_slots_inert(self):
        """Invalidating observations AFTER building the layout from the
        valid mask: packed tables only reference valid slots, so solves on
        a problem whose invalid slots carry garbage Jacobian inputs must
        still match."""
        prob = self._corridor()
        ov = np.asarray(prob.obs_valid)
        rng = np.random.RandomState(7)
        ov_new = ov & (rng.rand(len(ov)) > 0.3)
        # poison the uv of now-invalid observations; valid mask drives
        # inv_sig=0 so COO ignores them; packed must too (layout built
        # from the new mask never addresses those slots)
        uv = np.asarray(prob.obs_uv).copy()
        uv[~ov_new] = 1e6
        prob = prob._replace(obs_valid=jnp.asarray(ov_new),
                             obs_uv=jnp.asarray(uv))
        layout = self._layout(prob)
        assert layout is not None
        # structural: the packed tables must never reference invalid slots
        O = len(ov)
        fs = np.asarray(layout.fslot).ravel()
        ps = np.asarray(layout.pslot).ravel()
        assert ov_new[fs[fs < O]].all()
        assert ov_new[ps[ps < O]].all()
        # every valid observation appears exactly once in each table
        assert sorted(fs[fs < O]) == sorted(np.flatnonzero(ov_new))
        assert sorted(ps[ps < O]) == sorted(np.flatnonzero(ov_new))
        # operator-level: packed matvecs reproduce COO on the poisoned
        # problem to f32 roundoff (a full CG solve comparison would only
        # measure the sparsified system's conditioning, not the layout)
        lin = ba_solver.linearize(prob, prob.init)
        hcc_obs, wt_v, w_ap, _ = ba_solver._packed_ops(
            prob, lin, layout)
        from jax.ops import segment_sum
        v6 = jnp.asarray(rng.randn(prob.n_poses, 6), jnp.float32)
        y = ba_solver._Jv(lin.J_obs_pose, v6[prob.obs_pose])
        hcc_coo = segment_sum(ba_solver._JTr(lin.J_obs_pose, y),
                              prob.obs_pose, num_segments=prob.n_poses)
        np.testing.assert_allclose(
            np.asarray(hcc_obs(v6)), np.asarray(hcc_coo), rtol=1e-5,
            atol=1e-5 * float(jnp.abs(hcc_coo).max()))
        wt_coo = ba_solver._w_t_apply(prob, lin, v6)
        np.testing.assert_allclose(
            np.asarray(wt_v(v6)), np.asarray(wt_coo), rtol=1e-5,
            atol=1e-5 * float(jnp.abs(wt_coo).max()))


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
