"""Which part of apply_chunked breaks the fast gather in composition?
Variants of the wt leg: full / no-remainder-scatter / no-mask / neither.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.packed import build_packed_layout


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
    cg = layout.wg_fid
    print("fid rem", cg.rem_slot.shape[0], flush=True)
    lin = jax.jit(bs.linearize)(prob, prob.init)
    jax.block_until_ready(lin.cost)
    F, P = prob.n_poses, prob.n_points
    rng = np.random.RandomState(0)
    v0 = jnp.asarray(rng.randn(F, 6).astype(np.float32))
    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    Jp_f, Jt_f, Jt_p, Jp_p, G5 = pJ
    d, G = 6, cg.G

    def core(v, mask_on, rem_on):
        vp = jnp.concatenate([v, jnp.zeros((2 * G, d), v.dtype)])
        B = jnp.stack([jax.lax.slice_in_dim(vp, g, g + cg.n_src + 1, 1, 0)
                       for g in range(G)], axis=1)
        out = B.reshape(-1, G * d)[cg.chunk_src]
        out = out.reshape(cg.chunk_src.shape + (G, d))
        if mask_on:
            mask = (jnp.arange(G)[None, None, :]
                    < cg.chunk_len[:, :, None]).astype(v.dtype)
            out = out * mask[..., None]
        out = out.reshape(cg.rows, -1, d)
        if rem_on and cg.rem_slot.shape[0]:
            flat = out.reshape(-1, d).at[cg.rem_slot].set(vp[cg.rem_src])
            out = flat.reshape(cg.rows, -1, d)
        return out[:, :cg.K]

    def leg(v, mask_on, rem_on):
        vp = core(v, mask_on, rem_on)
        z_pm = jnp.sum(Jp_p * vp[:, :, None, :], axis=-1)
        return jnp.sum(jnp.sum(Jt_p * z_pm[..., None], axis=(1, 2)))

    for name, m, r in (("full (mask+rem)", True, True),
                       ("mask only      ", True, False),
                       ("rem only       ", False, True),
                       ("neither        ", False, False)):
        ms = slope_ms(lambda v, m=m, r=r: leg(v, m, r), v0)
        print(f"wt leg {name}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
