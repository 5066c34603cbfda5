"""Slope-based per-leg timing: plain gather vs windowed one-hot matmul.

prof_ba6's numbers carried the tunneled backend's ~25 ms RTT / n_scan as
a ~0.5 ms additive floor; this one takes the slope between two scan
lengths so per-iteration costs are clean.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.packed import build_packed_layout, apply_windowed


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
    print(f"F={F} P={P} Kf={layout.Kf} Kp={layout.Kp} "
          f"wg_fid rem={layout.wg_fid.rem_slot.shape[0]} "
          f"wg_pid rem={layout.wg_pid.rem_slot.shape[0]}", flush=True)
    rng = np.random.RandomState(0)
    v0 = jnp.asarray(rng.randn(F, 6).astype(np.float32))
    u0 = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    pad0 = bs._pad0

    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    Jp_f, Jt_f, Jt_p, Jp_p, G = pJ

    def wt_tables(v):
        z_pm = jnp.sum(Jp_p * v[0, 0] * 1e-3, axis=-1)  # reads Jp_p
        return jnp.sum(jnp.sum(Jt_p * z_pm[..., None], axis=(1, 2)))

    legs = {
        "gather fid plain  ": lambda v: jnp.sum(pad0(v)[layout.fid_p]),
        "gather fid windowed": lambda v: jnp.sum(
            apply_windowed(layout.wg_fid, v)),
        "hcc Gram           ": lambda v: jnp.sum(
            jnp.sum(G * v[:, None, :], axis=-1)),
        "wt tables only     ": wt_tables,
    }

    for u_leg, fn in (
            ("gather pid plain  ", lambda u: jnp.sum(
                pad0(u)[layout.pid_f])),
            ("gather pid windowed", lambda u: jnp.sum(
                apply_windowed(layout.wg_pid, u)))):
        ms = slope_ms(fn, u0)
        print(f"{u_leg}: {ms:7.3f} ms", flush=True)
    for name, fn in legs.items():
        ms = slope_ms(fn, v0)
        print(f"{name}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
