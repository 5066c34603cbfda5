"""Leg timing through the ACTUAL solver ops (post extension-row gathers)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.packed import build_packed_layout
from mqslam_tpu.ops import linalg


def slope_ms(fn, x0, n_lo=25, n_hi=100, repeats=3):
    def scanned(x, n):
        @jax.jit
        def go(x):
            def body(c, _):
                return c + fn(c) * 1e-30, None
            c, _ = jax.lax.scan(body, x, None, length=n)
            return c
        jax.block_until_ready(go(x))
        best = np.inf
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(go(x))
            best = min(best, time.perf_counter() - t0)
        return best
    return (scanned(x0, n_hi) - scanned(x0, n_lo)) / (n_hi - n_lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    prob, _ = bsyn.generate_corridor_problem(nr_frames=2048,
                                             points_per_frame=24)
    layout = build_packed_layout(prob.obs_pose, prob.obs_point,
                                 prob.obs_valid, prob.n_poses,
                                 prob.n_points)
    lin = jax.jit(bs.linearize)(prob, prob.init)
    jax.block_until_ready(lin.cost)
    F, P = prob.n_poses, prob.n_points
    rng = np.random.RandomState(0)
    v0 = jnp.asarray(rng.randn(F, 6).astype(np.float32))
    u0 = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    hcc, wt, w_ap, pre = bs._packed_ops(prob, lin, layout, pJ)

    dp = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
    Hpp_d = lin.Hpp + (1e-3 * jnp.maximum(dp, 1e-12))[..., None] * jnp.eye(
        3, dtype=jnp.float32)[None]

    def full_B(v):
        hv = hcc(v) + bs._hcc_rest(prob, lin, v)
        corr = w_ap(linalg.solve3x3_sym(Hpp_d, wt(v)))
        return jnp.sum(hv - corr)

    for name, fn, x in (
            ("hcc           ", lambda v: jnp.sum(hcc(v)), v0),
            ("wt            ", lambda v: jnp.sum(wt(v)), v0),
            ("w_apply       ", lambda u: jnp.sum(w_ap(u)), u0),
            ("hcc_rest      ", lambda v: jnp.sum(
                bs._hcc_rest(prob, lin, v)), v0),
            ("full B_apply  ", full_B, v0)):
        print(f"{name}: {slope_ms(fn, x):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
