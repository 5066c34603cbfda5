"""Multi-host (multi-process) distributed BA over DCN + ICI.

The reference is single-process (SURVEY §2.11); this is the new-design
scaling layer: one JAX process per host, a global mesh over every chip,
and the same shard_map/psum BA iteration as the single-host path —
`sharded_lm_solve` is mesh-agnostic, so the only multi-host specifics are
process initialization and mesh construction.

Traffic shape: observation factors shard over the global ``data`` axis
(each host keeps its own agents' factors local by construction when
problems are merged host-major), while per-CG-iteration collectives carry
only the replicated O(poses + landmarks) reduced-system vectors — those
psums ride ICI within a host and cross DCN once per iteration, which is
the scaling-book recipe for a compute-bound inner loop with a small
replicated state.

Usage (one process per host):

    from mqslam_tpu.parallel import multihost
    multihost.initialize(coordinator, num_processes, process_id)
    mesh = multihost.global_mesh()
    v, hist = multihost.solve(problem, mesh)
"""

import numpy as np
import jax
from jax.sharding import Mesh

from mqslam_tpu.parallel.sharded_ba import sharded_lm_solve

__all__ = ["initialize", "global_mesh", "solve"]


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kwargs):
    """jax.distributed.initialize wrapper (no-op when single-process and
    no coordinator is given — lets the same driver script run anywhere)."""
    if coordinator_address is None and num_processes in (None, 1):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process, host-major (devices of
    one host are contiguous along the axis so factor shards stay local
    when problems are assembled host-major)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def solve(problem, mesh: Mesh = None, **kwargs):
    """Run the sharded LM solve over the global mesh.

    Every process must call this with the SAME (replicated) problem —
    shard_problem_for_mesh places the factor shards; the host outer loop's
    accept/reject decisions are identical on every process because the
    psum'ed costs are."""
    if mesh is None:
        mesh = global_mesh()
    return sharded_lm_solve(problem, mesh, **kwargs)
