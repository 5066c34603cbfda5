"""Sharded BA over a virtual 8-device mesh vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mqslam_tpu.ba import problem as bp, solver as bs, synthetic as basyn
from mqslam_tpu.parallel import build_layout_for_mesh, sharded_lm_solve, \
    sharded_lm_solve_device, shard_problem_for_mesh, \
    make_sharded_lm_iteration

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def cube_problem():
    data = basyn.generate_cube_scenario(nr_cameras=2, nr_frames=20, seed=0)
    return bp.problem_from_ba_data(data)


@needs_devices
class TestShardedBA:
    def test_matches_single_device(self, cube_problem):
        prob = cube_problem
        v1, h1 = bs.lm_solve(prob, max_iters=8, cg_iters=300)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        v8, h8 = sharded_lm_solve(prob, mesh, max_iters=8, cg_iters=300)
        assert abs(h8[-1] - h1[-1]) < 1e-2 * max(h1[-1], 1.0)
        np.testing.assert_allclose(np.asarray(v8.pose_t),
                                   np.asarray(v1.pose_t), atol=1e-3)
        np.testing.assert_allclose(np.asarray(v8.points),
                                   np.asarray(v1.points), atol=1e-3)

    def test_single_iteration_agrees(self, cube_problem):
        prob = cube_problem
        lin = bs.linearize(prob, prob.init)
        dc1, dp1, _ = bs.solve_delta(prob, lin, jnp.float32(1e-4),
                                     cg_iters=400)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        prob_s = shard_problem_for_mesh(prob, mesh)
        lm_iter = make_sharded_lm_iteration(mesh, cg_iters=400)
        dc8, dp8, cost8 = lm_iter(prob_s, prob_s.init, jnp.float32(1e-4))
        # truncated CG is sensitive to f32 summation order across shards;
        # compare at the level the deltas are meaningful
        np.testing.assert_allclose(np.asarray(dc8), np.asarray(dc1),
                                   atol=2e-3)
        np.testing.assert_allclose(float(cost8), float(lin.cost), rtol=1e-5)

    def test_uneven_obs_padding(self, cube_problem):
        # obs count not divisible by mesh size: padding must stay inert
        prob = cube_problem
        mesh = Mesh(np.array(jax.devices()[:3]).reshape(3), ("data",))
        v3, h3 = sharded_lm_solve(prob, mesh, max_iters=4, cg_iters=200)
        v1, h1 = bs.lm_solve(prob, max_iters=4, cg_iters=200)
        assert abs(h3[-1] - h1[-1]) < 1e-2 * max(h1[-1], 1.0)


@needs_devices
class TestShardedPackedBA:
    """The row-mapped per-device packed layout (ba.packed.
    ShardedPackedLayout + solver._packed_ops_rows): the multi-chip CG
    path's dense form must reproduce both the sharded COO form and the
    single-device solve at corridor scale."""

    @pytest.fixture(scope="class")
    def corridor(self):
        prob, v_true = basyn.generate_corridor_problem(nr_frames=64,
                                                       points_per_frame=8)
        return prob

    def test_layout_builds_and_structure(self, corridor):
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        pp = shard_problem_for_mesh(corridor, mesh)
        lay = build_layout_for_mesh(pp, mesh)
        assert lay is not None
        D = 8
        O = pp.obs_valid.shape[0]
        per = O // D
        ov = np.asarray(pp.obs_valid)
        for d in range(D):
            fs = np.asarray(lay.fslot[d]).ravel()
            live = fs[fs < per]
            # every slot local to the shard and valid
            assert ov[d * per + live].all()
            # each shard's valid obs appear exactly once
            n_valid = int(ov[d * per:(d + 1) * per].sum())
            assert len(live) == n_valid
            # row maps reference real poses/landmarks (or the sentinel)
            rf = np.asarray(lay.rows_f[d])
            assert ((rf <= pp.n_poses)).all()
            rp = np.asarray(lay.rows_p[d])
            assert ((rp <= pp.n_points)).all()

    def test_matches_coo_and_single_device(self, corridor):
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        v_p, h_p = sharded_lm_solve(corridor, mesh, max_iters=8,
                                    cg_iters=200)          # layout=auto
        v_c, h_c = sharded_lm_solve(corridor, mesh, max_iters=8,
                                    cg_iters=200, layout=None)
        v_1, h_1 = bs.lm_solve(corridor, max_iters=8, method="cg",
                               cg_iters=200)
        # all three land on the same cost trajectory (truncated-CG f32
        # layout roundoff only)
        m = min(len(h_p), len(h_c), len(h_1))
        np.testing.assert_allclose(h_p[:m], h_1[:m], rtol=2e-2)
        np.testing.assert_allclose(h_p[:m], h_c[:m], rtol=2e-2)
        np.testing.assert_allclose(np.asarray(v_p.pose_t),
                                   np.asarray(v_1.pose_t), atol=5e-3)

    def test_single_sharded_iteration_packed_vs_coo(self, corridor):
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        pp = shard_problem_for_mesh(corridor, mesh)
        lay = build_layout_for_mesh(pp, mesh)
        it_p = make_sharded_lm_iteration(mesh, cg_iters=800,
                                         with_layout=True)
        it_c = make_sharded_lm_iteration(mesh, cg_iters=800)
        # strong damping: CG actually converges (cg_tol) so the deltas are
        # the SOLUTION, not a truncation-order-sensitive CG iterate
        dcp, dpp, cp = it_p(pp, pp.init, jnp.float32(1.0), lay)
        dcc, dpc, cc = it_c(pp, pp.init, jnp.float32(1.0))
        np.testing.assert_allclose(float(cp), float(cc), rtol=1e-6)
        scale = max(float(jnp.abs(dcc).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(dcp), np.asarray(dcc),
                                   atol=2e-3 * scale)
        np.testing.assert_allclose(
            np.asarray(dpp), np.asarray(dpc),
            atol=2e-3 * max(float(jnp.abs(dpc).max()), 1e-6))

    def test_device_loop_matches_host_loop(self, corridor):
        """sharded_lm_solve_device: the whole sharded LM loop as one
        shard_map dispatch must land in the host-driven loop's basin
        (accept decisions are driven by the same psum'ed global cost)."""
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        v_h, h_h = sharded_lm_solve(corridor, mesh, max_iters=8,
                                    cg_iters=200)
        v_d, h_d, n = sharded_lm_solve_device(corridor, mesh, max_iters=8,
                                              cg_iters=200)
        assert n == len(h_d) - 1
        assert abs(h_d[-1] - h_h[-1]) < 2e-2 * max(abs(h_h[-1]), 1e-6)
        np.testing.assert_allclose(np.asarray(v_d.pose_t),
                                   np.asarray(v_h.pose_t), atol=5e-3)

    def test_degenerate_distribution_falls_back(self):
        """A problem whose observations concentrate on one pose trips the
        ratio guard per shard -> build returns None and sharded_lm_solve
        silently uses COO."""
        from mqslam_tpu.ba.packed import build_sharded_packed_layout
        O, F, Pn = 512, 256, 64
        lay = build_sharded_packed_layout(
            np.zeros(O, np.int32), np.arange(O, dtype=np.int32) % Pn,
            np.ones(O, bool), F, Pn, 8)
        # each shard: 1 pose row with 64 obs -> Kf=64, Fd=1; tables tiny,
        # guard passes — concentrate landmarks too
        lay2 = build_sharded_packed_layout(
            np.repeat(np.arange(8, dtype=np.int32), O // 8),
            np.zeros(O, np.int32), np.ones(O, bool), F, Pn, 8)
        # both are legal builds or None — the invariant is no crash and
        # solver correctness via the other tests; assert the empty case:
        assert build_sharded_packed_layout(
            np.zeros(O, np.int32), np.zeros(O, np.int32),
            np.zeros(O, bool), F, Pn, 8) is None
        assert build_sharded_packed_layout(
            np.zeros(O - 1, np.int32), np.zeros(O - 1, np.int32),
            np.ones(O - 1, bool), F, Pn, 8) is None  # not divisible


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.block_until_ready(fn(*args))
        assert int(out[1].accepted) in (0, 1, 2)

    @needs_devices
    def test_dryrun_multichip(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", "__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)


class TestMultihostAPI:
    def test_single_process_path(self):
        """multihost.solve over the virtual 8-device 'global' mesh matches
        the single-device solve (process topology degenerate here; the
        mesh/shard_map path is identical to real multi-host)."""
        import jax
        import jax.numpy as jnp
        from mqslam_tpu.ba import problem as bp, solver as bs
        from mqslam_tpu.ba import synthetic as bsyn
        from mqslam_tpu.parallel import multihost

        assert multihost.initialize() is False  # no-op without coordinator
        mesh = multihost.global_mesh()
        assert mesh.shape["data"] == len(jax.devices())
        data = bsyn.generate_cube_scenario(nr_cameras=2, nr_frames=8,
                                           seed=0)
        prob = bp.problem_from_ba_data(data,
                                       pad_multiple=len(jax.devices()))
        v_m, h_m = multihost.solve(prob, mesh, max_iters=10, cg_iters=150)
        v_1, h_1 = bs.lm_solve(prob, max_iters=10, cg_iters=150)
        assert abs(h_m[-1] - h_1[-1]) / max(abs(h_1[-1]), 1e-12) < 5e-3
