"""True per-iteration cost of solve_delta_dense: perturb lin so XLA cannot
hoist the Schur assembly out of the measurement scan."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.ba import problem as bp, solver as bs
from mqslam_tpu.io import ba_info
from mqslam_tpu.ops import linalg
from mqslam_tpu.ba.solver import _JTJ, segment_sum, _HP

svo = "/root/reference/Work/SLAM/datasets/SVO/sin2_tex2_h1_v8_d"
data = ba_info.load_ba_data(svo, "slam2", nr_cameras=1, fps=50)
prob = bp.problem_from_ba_data(data)
prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))
F, P = prob.n_poses, prob.n_points
print("backend:", jax.default_backend(), " F", F, " P", P,
      " obs", int(prob.obs_valid.sum()), " O_cap", prob.obs_pose.shape[0])

v0 = prob.init
lin0 = bs.linearize(prob, v0)
lam = jnp.float32(1e-4)
N1, N2 = 4, 16


def bench(name, fn, *args):
    ts = {}
    for N in (N1, N2):
        @jax.jit
        def scanned(*a):
            def body(c, _):
                # perturb the FIRST arg's float leaves by c -> loop-carried
                a0 = jax.tree_util.tree_map(
                    lambda x: x + c * 1e-12 if jnp.issubdtype(
                        jnp.asarray(x).dtype, jnp.floating) else x, a[0])
                out = fn(a0, *a[1:])
                leaves = [jnp.asarray(l) for l in
                          jax.tree_util.tree_leaves(out)]
                s = sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0.0)) * 1e-30
                        for l in leaves
                        if jnp.issubdtype(l.dtype, jnp.floating))
                return c + s * 1e-7, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        jax.block_until_ready(scanned(*args))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(scanned(*args))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    ms = (ts[N2] - ts[N1]) / (N2 - N1) * 1e3
    print(f"{name:30s} {ms:8.3f} ms/iter")
    return ms


# full dense solve, lin perturbed
bench("solve_delta_dense(full)", lambda l: bs.solve_delta_dense(prob, l, lam),
      lin0)

# sub-stage: W scatter + WH + S2
def assemble_S2(lin):
    Hpp_d = lin.Hpp + (lam * jnp.maximum(jnp.diagonal(
        lin.Hpp, axis1=-2, axis2=-1), 1e-12))[..., None] * jnp.eye(3)[None]
    Hpp_inv = linalg.inv3x3(Hpp_d)
    A = jnp.sum(lin.J_obs_pose[:, :, :, None]
                * lin.J_obs_point[:, :, None, :], axis=1)
    W = jnp.zeros((F * P, 6, 3), jnp.float32).at[
        prob.obs_pose * P + prob.obs_point].add(A).reshape(F, P, 6, 3)
    WH = jnp.einsum("fpab,pbc->fpac", W, Hpp_inv, precision=_HP)
    S2 = jnp.einsum("fpac,gpbc->fagb", WH, W, precision=_HP)
    return S2

bench("  W scatter+WH+S2", assemble_S2, lin0)

# sub-stage: A only
def a_only(lin):
    return jnp.sum(lin.J_obs_pose[:, :, :, None]
                   * lin.J_obs_point[:, :, None, :], axis=1)
bench("  A blocks", a_only, lin0)

# sub-stage: W scatter only
A0 = a_only(lin0)
def w_scatter(A):
    return jnp.zeros((F * P, 6, 3), jnp.float32).at[
        prob.obs_pose * P + prob.obs_point].add(A)
bench("  W scatter only", w_scatter, A0)

W0 = w_scatter(A0).reshape(F, P, 6, 3)
Hpp_inv0 = linalg.inv3x3(lin0.Hpp + 1e-3 * jnp.eye(3)[None])
def wh_s2(W):
    WH = jnp.einsum("fpab,pbc->fpac", W, Hpp_inv0, precision=_HP)
    return jnp.einsum("fpac,gpbc->fagb", WH, W, precision=_HP)
bench("  WH+S2 einsums", wh_s2, W0)

# sub-stage: Hcc assembly
def hcc(lin):
    Hd = segment_sum(_JTJ(lin.J_obs_pose), prob.obs_pose, num_segments=F)
    Hd = Hd + segment_sum(_JTJ(lin.J_odo_from), prob.odo_from,
                          num_segments=F)
    Hd = Hd + segment_sum(_JTJ(lin.J_odo_to), prob.odo_to, num_segments=F)
    Hd = Hd + segment_sum(_JTJ(lin.J_pp), prob.prior_pose_idx,
                          num_segments=F)
    cross = jnp.sum(lin.J_odo_from[:, :, :, None]
                    * lin.J_odo_to[:, :, None, :], axis=1)
    Hcc = jnp.zeros((F * F, 6, 6), jnp.float32)
    Hcc = Hcc.at[jnp.arange(F) * (F + 1)].add(Hd)
    Hcc = Hcc.at[prob.odo_from * F + prob.odo_to].add(cross)
    Hcc = Hcc.at[prob.odo_to * F + prob.odo_from].add(
        jnp.swapaxes(cross, -1, -2))
    return Hcc.reshape(F, F, 6, 6).transpose(0, 2, 1, 3)
bench("  Hcc assembly", hcc, lin0)

# sub-stage: cholesky + solves on a fixed SPD system
n = F * 6
rng = np.random.RandomState(0)
M = jnp.asarray(rng.randn(n, n).astype(np.float32))
S0 = jnp.matmul(M, M.T, precision=_HP) + n * jnp.eye(n)
b0 = jnp.asarray(rng.randn(n).astype(np.float32))
def chol_solve(S):
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-30))
    Ssc = S / (d[:, None] * d[None, :])
    L = jnp.linalg.cholesky(Ssc)
    def cho_solve(rhs):
        y = jax.scipy.linalg.solve_triangular(L, rhs / d, lower=True)
        return jax.scipy.linalg.solve_triangular(L, y, lower=True,
                                                 trans=1) / d
    x = cho_solve(b0)
    for _ in range(2):
        r = b0 - jnp.matmul(S, x, precision=_HP)
        x = x + cho_solve(r)
    return x
bench("  cholesky+3x cho_solve", chol_solve, S0)

# linearize for reference
bench("linearize", lambda v: bs.linearize(prob, v), v0)
