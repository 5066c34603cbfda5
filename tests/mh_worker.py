"""Worker process for the multi-host distributed BA test
(tests/test_multihost.py). Run as:

    python tests/mh_worker.py <process_id> <num_processes> <port>

Each process brings 4 virtual CPU devices; the global mesh spans
4*num_processes devices across processes (DCN path via Gloo).
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")

from mqslam_tpu.parallel import multihost

ok = multihost.initialize(coordinator_address=f"localhost:{port}",
                          num_processes=nproc, process_id=pid)
assert ok
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc

from mqslam_tpu.ba import problem as bp, solver as bs, synthetic as bsyn

data = bsyn.generate_cube_scenario(nr_cameras=2, nr_frames=12, seed=0)
prob = bp.problem_from_ba_data(data, pad_multiple=4 * nproc)

mesh = multihost.global_mesh()
v, hist = multihost.solve(prob, mesh, max_iters=12, cg_iters=150)

# reference: this process's own single-device CG solve of the same problem
v1, h1 = bs.lm_solve(prob, max_iters=12, method="cg", cg_iters=150)
rel = abs(hist[-1] - h1[-1]) / max(abs(h1[-1]), 1e-12)
print(f"[proc {pid}] global devices={len(jax.devices())} "
      f"cost {hist[0]:.4e}->{hist[-1]:.4e} single={h1[-1]:.4e} "
      f"rel={rel:.2e}", flush=True)
assert rel < 5e-3, rel
print(f"[proc {pid}] OK", flush=True)
