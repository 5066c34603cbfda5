"""w-leg chunk-width sweep: can ChunkedGather pay on the ragged pose-major
pid_f table at G < 8?  Host analysis (corridor F=2048): G=2 has 5.0%
broken chunks / 214k total gathered rows, G=4 12.7% / 148k, G=8 22.4% /
137k, vs the plain gather's 387k rows — and the gather engine is
row-COUNT bound (~0.4M rows/ms).  prof_ba10's G=8 net-loss measurement
predates the prebuilt-extension-row form; re-measure all widths."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.packed import (build_packed_layout, build_chunked_gather,
                                  apply_chunked)


def slope_ms(fn, x0, n_lo=25, n_hi=100, repeats=3):
    def scanned(x, n):
        @jax.jit
        def go(x):
            def body(c, _):
                return c + fn(c) * 1e-30, None
            c, _ = jax.lax.scan(go_body := body, x, None, length=n)
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
    u0 = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    Jp_f, Jt_f, Jt_p, Jp_p, G5 = pJ

    def leg_plain(u):
        uf = bs._pad0(u)[layout.pid_f]
        w_f = jnp.sum(Jt_f * uf[:, :, None, :], axis=-1)
        return jnp.sum(jnp.sum(Jp_f * w_f[..., None], axis=(1, 2)))

    ms = slope_ms(leg_plain, u0)
    print(f"w leg plain gather       : {ms:7.3f} ms", flush=True)

    pid = np.asarray(layout.pid_f)
    for G in (2, 4, 8):
        cg = build_chunked_gather(pid, P, G=G, max_broken_frac=1.0)
        nb = cg.ext_ids.shape[0]
        nch = cg.chunk_src.size

        def leg_ch(u, cg=cg):
            uf = apply_chunked(cg, u)
            w_f = jnp.sum(Jt_f * uf[:, :, None, :], axis=-1)
            return jnp.sum(jnp.sum(Jp_f * w_f[..., None], axis=(1, 2)))

        ms = slope_ms(leg_ch, u0)
        print(f"w leg chunked G={G} (nb={nb:6d}/{nch}): {ms:7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
