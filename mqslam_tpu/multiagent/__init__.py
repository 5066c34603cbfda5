"""Multi-agent collaborative SLAM: map merging + joint factor graphs.

The reference's multi-agent capability lives in its BA data model (per-camera
pose chains, cross-camera BetweenFactors: reference: Work/SLAM/tools/
bundle_adjustment/DataStructures.hpp:55-88, GenerateData.hpp:256-269) — the
fusion itself happens offline through the shared factor graph. This package
makes that a first-class operation: merge per-agent front-end dumps into one
multi-camera problem (optionally unifying co-visible landmarks), add
cross-agent between factors, and solve jointly with the (shardable) BA
solver.
"""

from mqslam_tpu.multiagent.merge import merge_agents, CrossOdometry  # noqa: F401
from mqslam_tpu.multiagent.fleet_dump import ba_data_from_scan  # noqa: F401
