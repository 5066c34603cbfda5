"""Isolate the chunked-gather slowdown: B build / B[src] gather / mask /
scatter fixup, each slope-timed at corridor scale."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import synthetic as bsyn
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
    lay = build_packed_layout(prob.obs_pose, prob.obs_point,
                              prob.obs_valid, prob.n_poses, prob.n_points)
    cg = lay.wg_pid
    print("pid chunks", cg.chunk_src.shape, "rem", cg.rem_slot.shape,
          flush=True)
    rng = np.random.RandomState(0)
    u0 = jnp.asarray(rng.randn(prob.n_points, 3).astype(np.float32))
    G, d = cg.G, 3

    def mk_B(v):
        vp = jnp.concatenate([v, jnp.zeros((2 * G, d), v.dtype)])
        return jnp.stack(
            [jax.lax.slice_in_dim(vp, g, g + cg.n_src + 1, 1, 0)
             for g in range(G)], axis=1)

    def b_only(v):
        return jnp.sum(mk_B(v))

    def b_gather(v):
        return jnp.sum(mk_B(v)[cg.chunk_src])

    def b_gather_flatrow(v):
        # B as [n_src+1, G*d] 2D rows instead of 3D [G, d] slices
        B2 = mk_B(v).reshape(-1, G * d)
        return jnp.sum(B2[cg.chunk_src])

    def b_mask(v):
        out = mk_B(v)[cg.chunk_src]
        mask = (jnp.arange(G)[None, None, :]
                < cg.chunk_len[:, :, None]).astype(v.dtype)
        return jnp.sum(out * mask[..., None])

    def b_full(v):
        from mqslam_tpu.ba.packed import apply_chunked
        return jnp.sum(apply_chunked(cg, v))

    for name, fn in (("B build           ", b_only),
                     ("B[src] 3D         ", b_gather),
                     ("B[src] 2D flatrow ", b_gather_flatrow),
                     ("B[src]+mask       ", b_mask),
                     ("full apply_chunked", b_full)):
        print(f"{name}: {slope_ms(fn, u0):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
