"""Host-side IO: TUM trajectories, ASCII PCD point clouds, camera intrinsics,
and the BA_info factor-graph wire format.

All of this is NumPy/CPU code — the file formats are byte-compatible with the
reference pipeline's (so its checked-in dumps and goldens can be consumed
directly for cross-validation), while the accelerator-side code never touches
files.
"""

from mqslam_tpu.io import tum, pcd, intrinsics, ba_info  # noqa: F401
