"""Per-leg accounting of the packed CG iteration at corridor scale.

VERDICT r4 #2: ba/packed.py claims a ~0.2 ms HBM bound at F=2048/O=370k
but measures 2.43 ms/CG-iter — this profiler breaks the iteration into
its legs (scan-slope each) so the header can carry a measured byte/time
accounting, then measures the candidate fixes:

  - bf16 packed Jacobian tables (read-only per linearization; XLA upcasts
    inline during the broadcast-multiply, f32 accumulation)
  - state-vector gathers with rows padded to 8 lanes (32 B) vs 6
"""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.packed import build_packed_layout


def scan_ms(fn, x0, n_scan=50, repeats=3):
    @jax.jit
    def scanned(x):
        def body(c, _):
            y = fn(c)
            return c + y * 1e-30, None
        c, _ = jax.lax.scan(body, x, None, length=n_scan)
        return c
    jax.block_until_ready(scanned(x0))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(scanned(x0))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / n_scan


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
    Kf, Kp = layout.Kf, layout.Kp
    print(f"F={F} P={P} Kf={Kf} Kp={Kp}", flush=True)

    pJ = bs._pack_jacobians_jit(lin, layout)
    jax.block_until_ready(pJ[0])
    pJ_bf = tuple(a.astype(jnp.bfloat16) for a in pJ[:4]) + (pJ[4],)
    jax.block_until_ready(pJ_bf[0])
    rng = np.random.RandomState(0)
    v0 = jnp.asarray(rng.randn(F, 6).astype(np.float32))
    u0 = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    pad0 = bs._pad0

    for tag, (Jp_f, Jt_f, Jt_p, Jp_p, G) in (("f32 ", pJ), ("bf16", pJ_bf)):
        def hcc(v, G=G):
            return jnp.sum(jnp.sum(G * v[:, None, :], axis=-1))

        def wt(v, Jp_p=Jp_p, Jt_p=Jt_p):
            vp = pad0(v)[layout.fid_p]
            z_pm = jnp.sum(Jp_p.astype(jnp.float32)
                           * vp[:, :, None, :], axis=-1)
            return jnp.sum(jnp.sum(Jt_p.astype(jnp.float32)
                                   * z_pm[..., None], axis=(1, 2)))

        def w_ap(v, Jt_f=Jt_f, Jp_f=Jp_f):
            uf = pad0(v[:, :3] * 1.0)[layout.pid_f]
            w_f = jnp.sum(Jt_f.astype(jnp.float32)
                          * uf[:, :, None, :], axis=-1)
            return jnp.sum(jnp.sum(Jp_f.astype(jnp.float32)
                                   * w_f[..., None], axis=(1, 2)))

        for name, fn, x in (("hcc_obs (2x Jp_f)", hcc, v0),
                            ("wt_from_v       ", wt, v0),
                            ("w_apply         ", w_ap, v0)):
            ms = scan_ms(fn, x)
            print(f"{tag} {name}: {ms:7.3f} ms", flush=True)

    # gathers alone
    def g_fid(v):
        return jnp.sum(pad0(v)[layout.fid_p])

    def g_pid(u):
        return jnp.sum(pad0(u)[layout.pid_f])

    v8 = jnp.concatenate([v0, jnp.zeros((F, 2))], axis=1)

    def g_fid8(v):
        return jnp.sum(pad0(v)[layout.fid_p])

    u8 = jnp.concatenate([u0, jnp.zeros((P, 5))], axis=1)

    def g_pid8(u):
        return jnp.sum(pad0(u)[layout.pid_f])

    print(f"gather fid_p [P,Kp,6] : {scan_ms(g_fid, v0):7.3f} ms",
          flush=True)
    print(f"gather fid_p [P,Kp,8] : {scan_ms(g_fid8, v8):7.3f} ms",
          flush=True)
    print(f"gather pid_f [F,Kf,3] : {scan_ms(g_pid, u0):7.3f} ms",
          flush=True)
    print(f"gather pid_f [F,Kf,8] : {scan_ms(g_pid8, u8):7.3f} ms",
          flush=True)

    # hpp solve
    dp = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
    Hpp_d = lin.Hpp + (1e-3 * jnp.maximum(dp, 1e-12))[..., None] * jnp.eye(
        3, dtype=jnp.float32)[None]
    from mqslam_tpu.ops import linalg

    def hpp(u):
        return jnp.sum(linalg.solve3x3_sym(Hpp_d, u))

    print(f"hpp_solve  [P,3]      : {scan_ms(hpp, u0):7.3f} ms", flush=True)

    # full B_apply, f32 vs bf16 tables
    lam = jnp.float32(1e-3)
    for tag, pj in (("f32 ", pJ),):
        def bapply(v, pj=pj):
            _hcc, _wt, _w, _pre = bs._packed_ops(prob, lin, layout, pj)
            hv = (_hcc(v) + bs._hcc_rest(prob, lin, v)
                  + (lam * jnp.maximum(lin.diag_pose, 1e-12)) * v)
            dp = jnp.diagonal(lin.Hpp, axis1=-2, axis2=-1)
            Hpp_d = lin.Hpp + (lam * jnp.maximum(dp, 1e-12))[..., None] \
                * jnp.eye(3, dtype=jnp.float32)[None]
            corr = _w(linalg.solve3x3_sym(Hpp_d, _wt(v)))
            return jnp.sum(hv - corr)

        print(f"{tag} FULL B_apply     : {scan_ms(bapply, v0):7.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
