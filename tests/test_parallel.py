"""Sharded BA over a virtual 8-device mesh vs single-device reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from mqslam_tpu.ba import problem as bp, solver as bs, synthetic as basyn
from mqslam_tpu.parallel import sharded_lm_solve, shard_problem_for_mesh, \
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
