"""Per-stage device timing of the vmapped A-agent RANSAC PnP (scan-slope).

Breaks ops/pnp.py::pnp_ransac into its pieces at the multi-agent runner's
shapes to find what bounds the track phase (prof_multi.py showed
pnp_ransac ~2.2 ms of the ~6.8 ms vmapped post_flow at A=8).
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from mqslam_tpu.core import camera as cam_mod, se3, so3
from mqslam_tpu.ops import pnp, linalg

A = int(sys.argv[1]) if len(sys.argv) > 1 else 8
K = 384
NH = 128
S = 6
print("backend:", jax.default_backend(), " A =", A, flush=True)

cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
    [500.0, 500.0, 0.0, 320.0, 240.0, 0, 0, 0, 0], jnp.float32))

rng = np.random.RandomState(0)
objp = jnp.asarray(rng.uniform(-2, 2, (A, K, 3)) + [0, 0, 5], jnp.float32)
uv = jnp.asarray(rng.uniform(50, 600, (A, K, 2)), jnp.float32)
valid = jnp.asarray(rng.rand(A, K) > 0.3)
keys = jax.random.split(jax.random.PRNGKey(0), A)

N1, N2 = 8, 40


def scan_slope(name, fn, *args):
    def make(N):
        @jax.jit
        def scanned(*a):
            def body(c, _):
                out = fn(*jax.tree_util.tree_map(
                    lambda x: x * (1 + c * 1e-30)
                    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                    else x, a))
                s = sum(jnp.sum(l) * 1e-30
                        for l in jax.tree_util.tree_leaves(out)
                        if jnp.issubdtype(l.dtype, jnp.floating))
                return c + s, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c
        return scanned
    ts = {}
    for N in (N1, N2):
        f = make(N)
        np.asarray(f(*args))
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[N] = best
    per = (ts[N2] - ts[N1]) / (N2 - N1)
    print(f"{name:38s} {per*1e3:8.3f} ms/iter ({per*1e3/A:6.3f} /agent)",
          flush=True)
    return per


# full call
scan_slope("vmapped pnp_ransac (full)",
           lambda o, u, v, k: jax.vmap(
               lambda oo, uu, vv, kk: pnp.pnp_ransac(oo, uu, cal, vv, kk,
                                                     n_hyp=NH))(o, u, v, k),
           objp, uv, valid, keys)

# --- pieces ---
def sample_sets(o, u, v, k):
    scores = jax.random.uniform(k, (NH, K))
    scores = scores + (1.0 - v.astype(jnp.float32))[None, :] * 10.0
    sel = jnp.argsort(scores, axis=1)[:, :S]
    return o[sel], u[sel]

scan_slope("  sample sets (argsort K=384 x128)",
           lambda o, u, v, k: jax.vmap(
               lambda oo, uu, vv, kk: sample_sets(oo, uu, vv, kk))(
                   o, u, v, k), objp, uv, valid, keys)

objp_sets, uv_sets = jax.vmap(sample_sets)(objp, uv, valid, keys)
uvn_sets = cam_mod.undistort_points(uv_sets, cal)

scan_slope("  pnp_solve (DLT+eig, 128 hyp)",
           lambda o, un: jax.vmap(lambda oo, uu: pnp.pnp_solve(oo, uu))(
               o, un), objp_sets, uvn_sets)

R, t = jax.vmap(lambda oo, uu: pnp.pnp_solve(oo, uu))(objp_sets, uvn_sets)

def score(o, u, v, R_, t_):
    P = se3.from_R_t(R_, t_)
    proj, depth = cam_mod.project(o[None, :, :], P[:, None], cal)
    err2 = jnp.sum((proj - u[None]) ** 2, axis=-1)
    inl = (err2 < 4.0) & v[None, :] & (depth > 0)
    return jnp.sum(inl, axis=1)

scan_slope("  score hypotheses (proj 128x384)",
           lambda o, u, v, R_, t_: jax.vmap(score)(o, u, v, R_, t_),
           objp, uv, valid, R, t)

scan_slope("  pnp_refine(5) on winner",
           lambda o, u, v: jax.vmap(
               lambda oo, uu, vv: pnp.pnp_refine(oo, uu, cal,
                                                 jnp.zeros(3),
                                                 jnp.asarray([0, 0, 1.0]),
                                                 valid=vv, iters=5))(
                   o, u, v), objp, uv, valid)

# DLT internals: gram + eigh
Amat = jnp.asarray(rng.randn(A, NH, 12, 12).astype(np.float32))
Amat = jnp.einsum("ahij,ahkj->ahik", Amat, Amat)
scan_slope("  eigh 12x12 (A*128 batch)",
           lambda M: linalg.eigh_jacobi(M)
           if hasattr(linalg, "eigh_jacobi") else jnp.linalg.eigh(M),
           Amat)
