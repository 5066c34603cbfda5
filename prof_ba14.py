"""Banded vs packed CG iteration at corridor scale (F=2048, O=370k).
The banded grid (ba/banded.py) removes ALL per-iteration gathers; predicted
~0.2 ms/iter vs the packed path's measured 1.27 (gather-floored)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.cache/jax")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")

from mqslam_tpu.ba import solver as bs, synthetic as bsyn
from mqslam_tpu.ba.packed import build_packed_layout
from mqslam_tpu.ba.banded import build_banded_layout


def main():
    print("backend:", jax.default_backend(), flush=True)
    prob, _ = bsyn.generate_corridor_problem(nr_frames=2048,
                                             points_per_frame=24)
    t0 = time.perf_counter()
    bl = build_banded_layout(prob.obs_pose, prob.obs_point,
                             prob.obs_valid, prob.n_poses, prob.n_points)
    print(f"banded build {time.perf_counter()-t0:.2f}s: J={bl.J} "
          f"Ks={bl.Ks} banded={bl.n_banded} left={bl.n_left} "
          f"grid={bl.F*bl.J*bl.Ks}", flush=True)
    pl = build_packed_layout(prob.obs_pose, prob.obs_point,
                             prob.obs_valid, prob.n_poses, prob.n_points)
    lin = jax.jit(bs.linearize)(prob, prob.init)
    jax.block_until_ready(lin.cost)
    lam = jnp.float32(1e-3)

    for name, lay in (("banded", bl), ("packed", pl)):
        pJ = bs.pack_for_layout(lin, lay)
        jax.block_until_ready(jax.tree_util.tree_leaves(pJ)[0])
        ts = {}
        for budget in (25, 100):
            fn = jax.jit(lambda l, lay=lay, pJ=pJ, budget=budget:
                         bs.solve_delta(prob, lin, l, cg_iters=budget,
                                        cg_tol=0.0, layout=lay,
                                        packedJ=pJ)[0])
            jax.block_until_ready(fn(lam))
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(lam))
                best = min(best, time.perf_counter() - t0)
            ts[budget] = best
        ms = (ts[100] - ts[25]) / 75 * 1e3
        print(f"{name}: {ms:7.3f} ms/CG-iter "
              f"({1e3/ms:.0f} iters/s)", flush=True)
        # sanity: same solution basin
        dc = bs.solve_delta(prob, lin, lam, cg_iters=50, cg_tol=0.0,
                            layout=lay, packedJ=pJ)[0]
        print(f"  |dc| = {float(jnp.linalg.norm(dc)):.6f}", flush=True)


if __name__ == "__main__":
    main()
