"""Frame-at-a-time chessboard pose estimation (the realtime-pose loop).

The reference's option-8 webcam loop (reference: Work/calibration/
application/calibrate.py:506-599 realtime_pose_estimation: per frame —
find chessboard -> solvePnP -> draw axis system -> optional keyframe
snapshot to .jpg + .txt) without the capture window: feed frames from any
source; get back the pose, an axis-overlay debug image, and snapshot
helpers writing the same artifacts.
"""

import os

import numpy as np
import jax.numpy as jnp

from mqslam_tpu.calib.zhang import grid_objp
from mqslam_tpu.core import camera as cam_mod, so3
from mqslam_tpu.ops import chessboard as cb, pnp
from mqslam_tpu.viz import draw as dw

__all__ = ["pose_from_chessboard_frame", "save_pose_snapshot"]


def pose_from_chessboard_frame(img, board_size, K, dist=None,
                               square_size: float = 1.0, overlay=True):
    """One iteration of the realtime loop.

    img [H, W] grayscale. Returns (ok, rvec, tvec, overlay_img) —
    overlay_img is the RGB frame with the world axis system drawn at the
    board origin (calibrate.py:549-556), or None when not requested or the
    board is not found.
    """
    found, corners = cb.find_chessboard_corners(img, board_size)
    if not found:
        return False, None, None, None
    objp = grid_objp(board_size, scale=square_size).astype(np.float32)
    cal = cam_mod.cal_from_K_dist(
        jnp.asarray(K, jnp.float32),
        None if dist is None else jnp.asarray(dist, jnp.float32))
    uvn = cam_mod.undistort_points(jnp.asarray(corners), cal)
    R, t = pnp.pnp_solve(jnp.asarray(objp), uvn)
    rvec0 = so3.log(R)
    rvec, tvec = pnp.pnp_refine(jnp.asarray(objp), jnp.asarray(corners),
                                cal, rvec0, t, iters=10)
    rvec = np.asarray(rvec)
    tvec = np.asarray(tvec)
    out = None
    if overlay:
        out = dw._ensure_rgb(img).copy()
        dw.draw_axis_system(out, np.asarray(K), dist, rvec, tvec,
                            scale=2.0 * square_size)
    return True, rvec, tvec, out


def save_pose_snapshot(out_dir, idx, img, rvec, tvec):
    """Keyframe snapshot: image + pose text, the SPACE-key behavior of the
    reference loop (calibrate.py:573-586 writes .jpg + .txt pairs)."""
    from mqslam_tpu.viz.painter import save_png

    os.makedirs(out_dir, exist_ok=True)
    img_path = os.path.join(out_dir, f"keyframe_{idx:04d}.png")
    txt_path = os.path.join(out_dir, f"keyframe_{idx:04d}.txt")
    save_png(img_path, dw._ensure_rgb(img))
    with open(txt_path, "w") as f:
        f.write("# rvec tvec (world->cam)\n")
        f.write(" ".join(f"{v:.9g}" for v in np.asarray(rvec).reshape(-1))
                + "\n")
        f.write(" ".join(f"{v:.9g}" for v in np.asarray(tvec).reshape(-1))
                + "\n")
    return img_path, txt_path
