"""Does an optimization_barrier keep the 2D flat-row pack gather on its
fast lowering when composed with the einsum consumer?

prof_ba8: B2[src] (2D rows) = 0.122 ms isolated; the same gather composed
into the wt leg measured slower than plain. Hypothesis: XLA fuses the
gather+reshape+consumer into a slow scalar gather loop; a barrier forces
the fast standalone gather + a materialized hand-off.
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
    lin = jax.jit(bs.linearize)(prob, prob.init)
    jax.block_until_ready(lin.cost)
    F, P = prob.n_poses, prob.n_points
    Kp = layout.Kp
    rng = np.random.RandomState(0)
    v0 = jnp.asarray(rng.randn(F, 6).astype(np.float32))
    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    Jp_f, Jt_f, Jt_p, Jp_p, G = pJ
    pad0 = bs._pad0

    # build a G=8 sliding pack for the ORIGINAL fid_p table via per-slot
    # fallback: chunk of Kp=8 slots per point row; ids within a row are
    # ascending but not always consecutive -> emulate with first-id rows
    # (timing only; numerics not validated here)
    fid0 = jnp.asarray(np.asarray(layout.fid_p)[:, 0], jnp.int32)

    def mkB(v, G=8):
        vp = jnp.concatenate([v, jnp.zeros((2 * G, v.shape[1]), v.dtype)])
        B = jnp.stack([jax.lax.slice_in_dim(vp, g, g + F + 1, 1, 0)
                       for g in range(G)], axis=1)
        return B.reshape(F + 1, -1)

    def wt_plain(v):
        vp = pad0(v)[layout.fid_p]
        z_pm = jnp.sum(Jp_p * vp[:, :, None, :], axis=-1)
        return jnp.sum(jnp.sum(Jt_p * z_pm[..., None], axis=(1, 2)))

    def wt_pack_nobar(v):
        vp = mkB(v)[fid0].reshape(P, 8, 6)[:, :Kp]
        z_pm = jnp.sum(Jp_p * vp[:, :, None, :], axis=-1)
        return jnp.sum(jnp.sum(Jt_p * z_pm[..., None], axis=(1, 2)))

    def wt_pack_bar(v):
        vp2 = mkB(v)[fid0]
        vp2 = jax.lax.optimization_barrier(vp2)
        vp = vp2.reshape(P, 8, 6)[:, :Kp]
        z_pm = jnp.sum(Jp_p * vp[:, :, None, :], axis=-1)
        return jnp.sum(jnp.sum(Jt_p * z_pm[..., None], axis=(1, 2)))

    def gather_only_bar(v):
        return jnp.sum(jax.lax.optimization_barrier(mkB(v)[fid0]))

    def gather_only_nobar(v):
        return jnp.sum(mkB(v)[fid0])

    for name, fn in (("wt plain gather      ", wt_plain),
                     ("wt packrow no barrier", wt_pack_nobar),
                     ("wt packrow BARRIER   ", wt_pack_bar),
                     ("packrow gather only  ", gather_only_nobar),
                     ("packrow gather+bar   ", gather_only_bar)):
        print(f"{name}: {slope_ms(fn, v0):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
