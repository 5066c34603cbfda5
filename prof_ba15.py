"""Banded leg micro-breakdown at corridor scale: wt72 / w72 / vpack /
shift-add / hcc measured separately by scan-slope."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.banded import build_banded_layout, pack_banded
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
    bl = build_banded_layout(prob.obs_pose, prob.obs_point,
                             prob.obs_valid, prob.n_poses, prob.n_points)
    lin = jax.jit(bs.linearize)(prob, prob.init)
    jax.block_until_ready(lin.cost)
    F, P, J, Ks = bl.F, bl.P, bl.J, bl.Ks
    Awt, Aw2, G_banded, leftJ = jax.jit(pack_banded)(lin, bl)
    jax.block_until_ready(Awt)
    print("Awt", Awt.shape, "Aw2", Aw2.shape, flush=True)
    rng = np.random.RandomState(0)
    v0 = jnp.asarray(rng.randn(F, 6).astype(np.float32))
    r0 = jnp.asarray(rng.randn(F, 3 * J).astype(np.float32))
    q0 = jnp.asarray(rng.randn(F, Ks * 6).astype(np.float32))

    def vpack(v):
        vp = jnp.concatenate([v, jnp.zeros((Ks, 6), v.dtype)])
        return jnp.concatenate(
            [jax.lax.dynamic_slice_in_dim(vp, k, F) for k in range(Ks)],
            axis=1)

    def wt72(v):
        return jnp.sum(jnp.sum(Awt * vpack(v)[:, None, :], axis=2))

    def w72(r):
        return jnp.sum(jnp.sum(Aw2 * r[:, None, :], axis=2))

    def shift_add(q):
        qk = q.reshape(F, Ks, 6)
        buf = jnp.zeros((F + Ks, 6), q.dtype)
        for k in range(Ks):
            buf = buf.at[k:k + F].add(qk[:, k])
        return jnp.sum(buf[:F])

    def hcc(v):
        return jnp.sum(jnp.sum(G_banded * v[:, None, :], axis=-1))

    print(f"wt72 leg : {slope_ms(wt72, v0):7.3f} ms", flush=True)
    print(f"w72  leg : {slope_ms(w72, r0):7.3f} ms", flush=True)
    print(f"vpack    : {slope_ms(lambda v: jnp.sum(vpack(v)), v0):7.3f} ms",
          flush=True)
    print(f"shift_add: {slope_ms(shift_add, q0):7.3f} ms", flush=True)
    print(f"hcc      : {slope_ms(hcc, v0):7.3f} ms", flush=True)

    # dot_general forms of the two legs, for comparison
    def wt_dot(v):
        return jnp.sum(jax.lax.dot_general(
            Awt, vpack(v), (((2,), (1,)), ((0,), (0,)))))

    def w_dot(r):
        return jnp.sum(jax.lax.dot_general(
            Aw2, r, (((2,), (1,)), ((0,), (0,)))))

    print(f"wt dot_general: {slope_ms(wt_dot, v0):7.3f} ms", flush=True)
    print(f"w  dot_general: {slope_ms(w_dot, r0):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
