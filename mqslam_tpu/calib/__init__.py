"""Camera calibration math (the reference's interactive suite, as a library).

The reference wraps this in OpenCV-GUI menus (reference: Work/calibration/
application/calibrate.py); the math lives here as tested pure functions:
Zhang-style intrinsics calibration from chessboard views, multi-camera
relative-pose calibration with reprojection-error weighting, and the
two-view epipolar toolbox (normalized 8-point F, RANSAC, essential-matrix
decomposition with chirality disambiguation).
"""

from mqslam_tpu.calib import zhang, relative, epipolar  # noqa: F401
from mqslam_tpu.calib.zhang import calibrate_camera  # noqa: F401
from mqslam_tpu.calib.relative import calibrate_relative_poses  # noqa: F401
from mqslam_tpu.calib.epipolar import (  # noqa: F401
    fundamental_8point, fundamental_ransac, decompose_essential,
    relative_pose_from_fundamental,
)
