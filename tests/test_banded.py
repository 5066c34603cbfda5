"""Banded (run-major) CG layout: build invariants, op-level equality vs
the COO reference applies, and solve-level agreement.

Reference role: GTSAM elimination was the reference's large-BA mechanism
(Work/SLAM/tools/bundle_adjustment/bundle_adjust.cpp:320-348); ba/banded.py
is the TPU-native gather-free replacement for the Schur-CG hot loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqslam_tpu.ba import solver as bs
from mqslam_tpu.ba import synthetic as bsyn
from mqslam_tpu.ba.banded import (BandedLayout, build_banded_layout,
                                  banded_hooks)
from mqslam_tpu.ops import linalg


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-30))


@pytest.fixture(scope="module")
def corridor():
    prob, _ = bsyn.generate_corridor_problem(nr_frames=64,
                                             points_per_frame=12)
    bl = build_banded_layout(prob.obs_pose, prob.obs_point,
                             prob.obs_valid, prob.n_poses, prob.n_points)
    lin = jax.jit(bs.linearize)(prob, prob.init)
    return prob, bl, lin


def test_build_partition_covers_every_observation(corridor):
    prob, bl, _ = corridor
    op = np.asarray(prob.obs_pose)
    opt = np.asarray(prob.obs_point)
    ov = np.asarray(prob.obs_valid)
    O = len(op)
    F, P, J, Ks = bl.F, bl.P, bl.J, bl.Ks
    so = np.asarray(bl.slot_obs).reshape(-1)
    banded = so[so < O]
    assert len(banded) == len(np.unique(banded)) == bl.n_banded
    # slot coordinates encode (pose, point) exactly
    idx = np.flatnonzero(so < O)
    b, j, k = idx // (J * Ks), (idx % (J * Ks)) // Ks, idx % Ks
    sp = np.asarray(bl.slot_point)
    assert (op[so[idx]] == b + k).all()
    assert (opt[so[idx]] == sp[b, j]).all()
    # leftover covers exactly the rest of the valid observations
    lcol = np.asarray(bl.left_obs_col)
    left = np.flatnonzero(lcol < bl.L)
    assert bl.n_banded + len(left) == int(ov.sum())
    assert not np.intersect1d(banded, left).size
    # partition is exclusive by LANDMARK (Hpp block-diagonality argument)
    assert not np.intersect1d(opt[banded], opt[left]).size


def test_ops_match_coo_reference(corridor):
    prob, bl, lin = corridor
    lam = jnp.float32(1e-3)
    F, P = prob.n_poses, prob.n_points
    point_mask = lin.point_free[:, None].astype(jnp.float32)
    dp_ = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
    Hpp_d = lin.Hpp + (lam * jnp.maximum(dp_, 1e-12))[..., None] \
        * jnp.eye(3, dtype=jnp.float32)[None]
    Hpp_inv = linalg.inv3x3(Hpp_d) * point_mask[..., None]
    hooks = banded_hooks(prob, lin, bl, None, Hpp_inv)
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(F, 6).astype(np.float32))
    t = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    wt_ref = bs._w_t_apply(prob, lin, v)
    assert _rel(hooks.wt_full(v), wt_ref) < 1e-5
    assert _rel(hooks.w_full(t), bs._w_apply(prob, lin, t)) < 1e-5
    hcc_ref = bs._hcc_apply(prob, lin, v) - bs._hcc_rest(prob, lin, v)
    assert _rel(hooks.hcc(v), hcc_ref) < 1e-5
    corr_ref = bs._w_apply(
        prob, lin, jnp.sum(Hpp_inv * wt_ref[:, None, :], axis=-1))
    assert _rel(hooks.corr(v), corr_ref) < 1e-4
    # preconditioner blocks vs the COO-built exact blocks
    A = jnp.sum(lin.J_obs_pose[:, :, :, None]
                * lin.J_obs_point[:, :, None, :], axis=1)
    Hj = Hpp_inv[prob.obs_point]
    AH = jnp.sum(A[:, :, :, None] * Hj[:, None, :, :], axis=2)
    AHA = jnp.sum(AH[:, :, None, :] * A[:, None, :, :], axis=3)
    blk_ref = jax.ops.segment_sum(
        bs._JTJ(lin.J_obs_pose) - AHA, prob.obs_pose, num_segments=F)
    assert _rel(hooks.pre(), blk_ref) < 1e-4


def test_solve_delta_matches_coo(corridor):
    prob, bl, lin = corridor
    lam = jnp.float32(1e-3)
    dc0, dp0, _ = bs.solve_delta(prob, lin, lam, cg_iters=80, cg_tol=0.0)
    dc2, dp2, _ = bs.solve_delta(prob, lin, lam, cg_iters=80, cg_tol=0.0,
                                 layout=bl)
    assert _rel(dc2, dc0) < 5e-3
    assert _rel(dp2, dp0) < 5e-3


def test_auto_layout_prefers_banded(corridor):
    prob, _, _ = corridor
    lay = bs._auto_layout(prob)
    assert isinstance(lay, BandedLayout)


def test_lm_solve_banded_reaches_coo_basin(corridor):
    prob, bl, _ = corridor
    _, hist_coo = bs.lm_solve(prob, method="cg", layout=None, max_iters=8,
                              cg_iters=60)
    _, hist_b = bs.lm_solve(prob, method="cg", layout=bl, max_iters=8,
                            cg_iters=60)
    assert hist_b[-1] < 1.02 * hist_coo[-1] + 1e-6


def test_short_sequence_layout_fallback():
    # a short sequence with long-lived landmarks: whatever the builder
    # decides (grid or refusal), lm_solve(layout="auto") must work
    prob, _ = bsyn.generate_corridor_problem(nr_frames=16,
                                             points_per_frame=8)
    _, hist = bs.lm_solve(prob, method="cg", layout="auto", max_iters=6,
                          cg_iters=50)
    assert hist[-1] < hist[0]


def test_sharded_banded_matches_single_device():
    """The pose-block sharded grid (ShardedBandedLayout) must reproduce
    the single-device banded solve on the virtual 8-device mesh: same
    delta to f32-CG tolerance, via solve_delta under shard_map."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mqslam_tpu.ba.banded import (build_sharded_banded_layout,
                                      permute_obs)
    from mqslam_tpu.parallel import sharded_ba as sba

    prob, _ = bsyn.generate_corridor_problem(nr_frames=256,
                                             points_per_frame=12)
    out = build_sharded_banded_layout(prob.obs_pose, prob.obs_point,
                                      prob.obs_valid, prob.n_poses,
                                      prob.n_points, 8)
    assert out is not None
    sbl, perm, valid = out
    pp = permute_obs(prob, perm, valid)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    pps = sba.shard_problem_for_mesh(pp, mesh)
    sh = NamedSharding(mesh, P("data"))
    sbl_p = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), sbl)
    specs = sba._obs_spec("data")
    var_spec = bs.BAVariables(P(), P(), P())
    lay_spec = jax.tree_util.tree_map(lambda _: P("data"), sbl)
    lam = jnp.float32(1e-3)

    def _iter(problem, v, layout):
        layout = jax.tree_util.tree_map(lambda a: a[0], layout)
        lin = bs.linearize(problem, v, axis_name="data")
        dc, dp, _ = bs.solve_delta(problem, lin, lam, cg_iters=80,
                                   cg_tol=0.0, axis_name="data",
                                   layout=layout)
        return dc, dp

    f = jax.jit(jax.shard_map(_iter, mesh=mesh,
                              in_specs=(specs, var_spec, lay_spec),
                              out_specs=(P(), P()), check_vma=False))
    dc_s, dp_s = f(pps, pp.init, sbl_p)

    bl = build_banded_layout(pp.obs_pose, pp.obs_point, pp.obs_valid,
                             pp.n_poses, pp.n_points)
    lin1 = jax.jit(bs.linearize)(pp, pp.init)
    dc1, dp1, _ = bs.solve_delta(pp, lin1, lam, cg_iters=80, cg_tol=0.0,
                                 layout=bl)
    assert _rel(dc_s, dc1) < 1e-3
    assert _rel(dp_s, dp1) < 1e-3


def test_sharded_lm_solve_auto_uses_banded():
    """sharded_lm_solve(layout='auto') prefers the banded grid and lands
    in the same basin as the single-device CG solve."""
    import jax
    from jax.sharding import Mesh
    from mqslam_tpu.parallel import sharded_ba as sba

    prob, _ = bsyn.generate_corridor_problem(nr_frames=128,
                                             points_per_frame=8)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    v_s, hist_s = sba.sharded_lm_solve(prob, mesh, max_iters=6,
                                       cg_iters=80)
    _, hist_1 = bs.lm_solve(prob, method="cg", max_iters=6, cg_iters=80)
    assert hist_s[-1] < 1.05 * hist_1[-1] + 1e-6
