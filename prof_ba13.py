"""w-leg chunked gather, B-build variants.  prof_ba12 showed the stock
apply_chunked LOSES on the w leg (1.9-2.3 ms vs plain 1.14): its pack
table build stacks G slices of the [P, 3] source into [P, G, 3] — on TPU
that intermediate is lane-padded 3->128 (P x G x 128 f32 ~ 200 MB of
relayout traffic at P=49k) before the reshape to [P, G*3].  Here: build
B = [P+1, G*d] directly by concatenating the G shifted [P, d] slices on
the LANE axis (no 3D intermediate), plus a variant gathering from a
transposed flat layout."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.packed import build_packed_layout, build_chunked_gather


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
    u0 = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    Jp_f, Jt_f, Jt_p, Jp_p, G5 = pJ
    d = 3

    def einsum_tail(uf):
        w_f = jnp.sum(Jt_f * uf[:, :, None, :], axis=-1)
        return jnp.sum(jnp.sum(Jp_f * w_f[..., None], axis=(1, 2)))

    def leg_plain(u):
        return einsum_tail(bs._pad0(u)[layout.pid_f])

    ms = slope_ms(leg_plain, u0)
    print(f"w leg plain gather            : {ms:7.3f} ms", flush=True)

    pid = np.asarray(layout.pid_f)
    for G in (2, 4, 8):
        cg = build_chunked_gather(pid, P, G=G, max_broken_frac=1.0)

        def apply_concat(u, cg=cg, G=G):
            vp = jnp.concatenate([u, jnp.zeros((2 * G, d), u.dtype)])
            # direct lane-axis concat: no [N, G, d] intermediate
            B = jnp.concatenate(
                [jax.lax.slice_in_dim(vp, g, g + cg.n_src + 1, 1, 0)
                 for g in range(G)], axis=1)          # [P+1, G*d]
            if cg.ext_ids.shape[0]:
                ext = vp[cg.ext_ids.reshape(-1)].reshape(-1, G * d)
                B = jnp.concatenate([B, ext])
            out = B[cg.chunk_src]                     # [R, Kpad/G, G*d]
            out = out.reshape(cg.chunk_src.shape + (G, d))
            mask = (jnp.arange(G)[None, None, :]
                    < cg.chunk_len[:, :, None]).astype(u.dtype)
            out = (out * mask[..., None]).reshape(cg.rows, -1, d)
            return out[:, :cg.K]

        def leg_ch(u, f=apply_concat):
            return einsum_tail(f(u))

        ms = slope_ms(leg_ch, u0)
        print(f"w leg concat-B chunked G={G}   : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
