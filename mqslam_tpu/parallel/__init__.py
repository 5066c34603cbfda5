"""Mesh sharding of the BA solve: factors over devices, psum assembly.

The distributed layer has no counterpart in the reference (a single-process
Python 2 pipeline, SURVEY.md §2.11); its semantics come from the
multi-camera factor-graph data model. Observations (projection factors) are
sharded across a jax Mesh axis; pose/landmark states are replicated; the
Schur-complement reduced camera system is assembled with psum collectives
over ICI — each CG iteration moves only O(poses + landmarks) per device,
never per-observation data.
"""

from mqslam_tpu.parallel.sharded_ba import (  # noqa: F401
    build_layout_for_mesh, make_sharded_lm_iteration,
    pad_problem_for_shards, shard_problem_for_mesh, sharded_lm_solve,
    sharded_lm_solve_device,
)
from mqslam_tpu.parallel import multihost  # noqa: F401
