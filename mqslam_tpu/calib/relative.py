"""Multi-camera relative-pose calibration.

Library form of the reference's per-camera-chessboard workflow
(reference: Work/calibration/application/calibrate.py:602-657
calibrate_relative_poses_interactive): each camera observes its own board
(with known board-to-world transform), absolute poses come from PnP per
image, poses are averaged across images weighted by inverse reprojection
error, and everything is rebased to camera 0. The reference averages raw
4x4 matrices (calibrate.py:653-655); we keep that behavior byte-faithfully
and additionally provide an SO(3)-projected variant.
"""

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from mqslam_tpu.core import camera as cam_mod, se3, so3
from mqslam_tpu.ops import pnp

__all__ = ["calibrate_relative_poses"]


def _pose_matrix(rvec, tvec):
    return np.asarray(se3.from_rvec_tvec(jnp.asarray(rvec, jnp.float32),
                                         jnp.asarray(tvec, jnp.float32)))


def calibrate_relative_poses(image_points: Sequence[Sequence[np.ndarray]],
                             board_objps: Sequence[np.ndarray],
                             cals: Sequence[cam_mod.Cal3DS2],
                             project_to_se3: bool = False):
    """Relative extrinsics of N cameras from per-image board detections.

    image_points[cam][img]: [K, 2] detected corners of camera `cam`'s board
    in image `img`; board_objps[cam]: [K, 3] corresponding world points
    (already board-to-world transformed, calibrate.py:619-625);
    cals[cam]: intrinsics.

    Returns (relative_Ps, worst_reproj_error): relative_Ps[cam] maps
    cam0-frame to cam-frame (P_cam @ P_cam0^-1, identity for cam 0).
    """
    num_cams = len(image_points)
    num_images = len(image_points[0])
    Ps = np.zeros((num_images, num_cams, 4, 4))
    weights = np.zeros((num_images, 1, 1, 1))
    worst = 0.0

    for i in range(num_images):
        reproj = 0.0
        for c in range(num_cams):
            uv = np.asarray(image_points[c][i], dtype=np.float32)
            objp = np.asarray(board_objps[c], dtype=np.float32)
            uvn = cam_mod.undistort_points(jnp.asarray(uv), cals[c])
            R, t = pnp.pnp_solve(jnp.asarray(objp), uvn)
            rvec = so3.log(R)
            rvec, tvec = pnp.pnp_refine(jnp.asarray(objp), jnp.asarray(uv),
                                        cals[c], rvec, t, iters=10)
            rms, _ = pnp.reprojection_error(jnp.asarray(objp),
                                            jnp.asarray(uv), cals[c],
                                            rvec, tvec)
            reproj = max(float(rms), reproj)
            Ps[i, c] = _pose_matrix(rvec, tvec)
        worst = max(worst, reproj)
        weights[i] = 1.0 / max(reproj, 1e-12)

    # reference behavior: weighted average of raw 4x4 pose matrices
    # (calibrate.py:653-655), then rebase to camera 0
    Ps_avg = (Ps * (weights / weights.sum())).sum(axis=0)
    if project_to_se3:
        for c in range(num_cams):
            R = Ps_avg[c, :3, :3]
            U, _, Vt = np.linalg.svd(R)
            S = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
            Ps_avg[c, :3, :3] = U @ S @ Vt
            Ps_avg[c, 3] = [0, 0, 0, 1]
    # NOTE: the reference rebases with its rigid-inverse helper
    # (calibrate.py:656 trfm.P_inv) although the averaged matrix is not
    # rigid; we use the exact matrix inverse so rel[0] is identically I.
    P0_inv = np.linalg.inv(Ps_avg[0])
    rel = [Ps_avg[c] @ P0_inv for c in range(num_cams)]
    return rel, worst
