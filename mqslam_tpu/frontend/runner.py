"""Host loop around the jitted tracker step: IO, trajectory, BA-info export.

The device does all per-frame compute (frontend.tracker.make_step); this loop
only feeds images and keeps the factor-graph bookkeeping the reference's
BundleAdjustmentInfoContainer did (reference: Work/SLAM/application/own/
slam2.py:743-865 writer, :1203-1253 main loop). Rejected frames are dropped
entirely — the next flow starts from the last accepted image and the
trajectory keeps a hole (slam2.py:1221-1225).
"""

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mqslam_tpu.core import camera as cam_mod, se3
from mqslam_tpu.frontend import tracker as trk
from mqslam_tpu.io import ba_info as ba_io, tum

__all__ = ["FrontendResult", "run_frontend"]


@dataclass
class FrontendResult:
    trajectory: "tum.CamTrajectory"        # accepted frames only
    poses: List[Optional[np.ndarray]]      # per frame 4x4 cam-to-world | None
    points3d: np.ndarray                   # [P, 3]
    point_colors: np.ndarray               # [P] intensity
    point_groups: np.ndarray               # [P]
    ba_data: Optional[ba_io.BAData]
    n_keyframes: int
    accepted: List[int]                    # per-frame 0/1/2


def _cam_to_world(rvec, tvec):
    P = np.asarray(se3.from_rvec_tvec(jnp.asarray(rvec), jnp.asarray(tvec)))
    return np.asarray(se3.inv(jnp.asarray(P)))


def run_frontend(images, cal: cam_mod.Cal3DS2, config: trk.TrackerConfig,
                 init_uv, init_objp, fps: float = 30.0, seed: int = 0,
                 collect_ba: bool = True, verbose: bool = False,
                 live_update_period: int = 0, traj_out_file: str = None,
                 map_out_file: str = None):
    """Run the front-end over a grayscale image sequence.

    images: iterable of [H, W] float arrays (0..255). init_uv/init_objp:
    frame-0 2D-3D correspondences (chessboard grid or predefined points,
    slam2.py:1121-1146). With ``live_update_period`` > 0 and output paths
    set, the trajectory + map are flushed every N frames — the reference's
    live Blender-viewer hook (slam2.py:1244-1248, blender_tools.py:501-596
    polls these files).
    """
    images = iter(images)
    first = np.asarray(next(images), dtype=np.float32)
    key = jax.random.PRNGKey(seed)
    state = trk.bootstrap(init_uv, init_objp, cal, first, config, key)
    step, refill_kf, _ = trk.make_step(cal, config)

    n_init = len(init_uv)
    poses = []
    accepted_flags = []
    P0 = _cam_to_world(state.rvec, state.tvec)
    poses.append(P0)
    accepted_flags.append(2)

    # --- BA bookkeeping ---
    data = ba_io.BAData(nr_cameras=1) if collect_ba else None
    # tracking history: frames since last keyframe (inclusive), as
    # (frame_idx, uv [K,2], alive [K], compact_index [K])
    history = []

    def frame_2d_list(uv, alive):
        """Compact per-frame 2D list + slot->list-index map."""
        idxs = np.flatnonzero(alive)
        comp = -np.ones(len(alive), dtype=np.int64)
        comp[idxs] = np.arange(len(idxs))
        return uv[idxs], comp

    if collect_ba:
        data.pose_noise = [ba_io.NoiseModel.diagonal([0.002] * 3 + [0.001] * 3)]
        data.odometry_noise = [[ba_io.NoiseModel.diagonal(
            [0.05] * 3 + [0.2] * 3)]]
        data.point3D_noise = ba_io.NoiseModel.isotropic(3, 0.2)
        data.point2D_noise = [ba_io.NoiseModel.isotropic(2, 1.0)]
        data.calibrations = [np.asarray(cal.as_array(), dtype=np.float64)]

        uv0 = np.asarray(state.cur_uv)
        alive0 = np.asarray(state.active)
        uv_list, comp = frame_2d_list(uv0, alive0)
        data.points2D = [[uv_list]]
        tri0 = np.asarray(state.triangulated) & alive0
        oidx0 = np.asarray(state.objp_idx)
        assoc0 = np.stack([np.zeros(tri0.sum(), np.int64),
                           comp[np.flatnonzero(tri0)],
                           oidx0[np.flatnonzero(tri0)]], axis=1)
        data.point2D3D_assocs = [[assoc0]]
        data.point3D_added_idxs = [list(range(n_init))]
        data.odometry = [[]]
        data.odometry_assocs = [[]]
        history.append((0, uv0, alive0, comp))
        last_kf_frame = 0

    frame_idx = 0
    prev_img = jnp.asarray(first)
    for img in images:
        frame_idx += 1
        new_img = jnp.asarray(np.asarray(img, dtype=np.float32))
        state, out = step(state, prev_img, new_img)
        acc = int(out.accepted)
        accepted_flags.append(acc)
        if collect_ba:
            data.points2D[0].append(np.zeros((0, 2)))
            data.point2D3D_assocs[0].append(np.zeros((0, 3), np.int64))
            data.point3D_added_idxs.append([])
            data.odometry.append([])
            data.odometry_assocs.append([])

        if acc == 0:
            poses.append(None)
            if verbose:
                print(f"frame {frame_idx}: REJECTED "
                      f"(lost_ratio={float(out.lost_ratio):.2f})")
            continue  # prev_img stays the last accepted image

        poses.append(_cam_to_world(out.rvec, out.tvec))
        if collect_ba:
            uv = np.asarray(out.cur_uv)
            alive = np.asarray(out.track_alive)
            uv_list, comp = frame_2d_list(uv, alive)
            data.points2D[0][frame_idx] = uv_list
            # tracked, already-triangulated associations (slam2.py:517-522)
            inl = np.asarray(out.pnp_inlier) & alive
            oidx = np.asarray(out.objp_idx)
            sl = np.flatnonzero(inl & (np.asarray(
                out.track_triangulated)) & ~np.asarray(out.new_landmarks))
            assoc = np.stack([np.full(len(sl), frame_idx, np.int64),
                              comp[sl], oidx[sl]], axis=1)
            data.point2D3D_assocs[0][frame_idx] = assoc
            history.append((frame_idx, uv, alive, comp))

        if acc == 2:  # keyframe
            if collect_ba:
                new_lm = np.asarray(out.new_landmarks)
                oidx = np.asarray(out.objp_idx)
                new_slots = np.flatnonzero(new_lm)
                data.point3D_added_idxs[frame_idx] = [
                    int(oidx[s]) for s in new_slots]
                # associations of the new landmarks for every frame since the
                # last keyframe (slam2.py:633-641)
                for (f_idx, uv_h, alive_h, comp_h) in history:
                    rows = []
                    for s in new_slots:
                        if alive_h[s] and comp_h[s] >= 0:
                            rows.append((f_idx, comp_h[s], oidx[s]))
                    if rows:
                        data.point2D3D_assocs[0][f_idx] = np.concatenate([
                            data.point2D3D_assocs[0][f_idx],
                            np.asarray(rows, np.int64)], axis=0)
                # odometry between previous and current keyframe
                # (slam2.py:680-687): measured = W_prev^-1 W_cur
                P_prev = poses[last_kf_frame]
                P_cur = poses[frame_idx]
                if P_prev is not None:
                    odo = np.linalg.inv(P_prev) @ P_cur
                    data.odometry[frame_idx] = [odo]
                    data.odometry_assocs[frame_idx] = [
                        (0, last_kf_frame, 0, frame_idx)]
                last_kf_frame = frame_idx
                uv = np.asarray(out.cur_uv)
                alive = np.asarray(out.track_alive)
                uv_list, comp = frame_2d_list(uv, alive)
                history = [(frame_idx, uv, alive, comp)]
            state = refill_kf(state, new_img)

        if verbose:
            print(f"frame {frame_idx}: acc={acc} "
                  f"tracks={int(out.n_tracks)} "
                  f"H-cond={float(out.homography_condition):.3f}")
        if (live_update_period and traj_out_file
                and frame_idx % live_update_period == 0):
            _write_live(state, poses, fps, traj_out_file, map_out_file)
        prev_img = new_img

    # --- outputs ---
    n_pts = int(state.n_objp)
    points3d = np.asarray(state.objp[:n_pts])
    colors = np.asarray(state.objp_color[:n_pts])
    groups = np.asarray(state.objp_group[:n_pts])
    ts, locs, quats = [], [], []
    from mqslam_tpu.core import quat as quat_mod
    for i, P in enumerate(poses):
        if P is None:
            continue
        q = np.asarray(quat_mod.from_matrix(jnp.asarray(P[:3, :3])))
        ts.append(i / fps)
        locs.append(P[:3, 3])
        quats.append(q)
    traj = tum.CamTrajectory(np.asarray(ts),
                             np.asarray(locs).reshape(-1, 3),
                             np.asarray(quats).reshape(-1, 4))
    if collect_ba:
        data.points3D = points3d.astype(np.float64)
        gray = np.clip(colors, 0, 255).astype(np.uint8)
        bgra = np.stack([gray, gray, gray,
                         np.full(n_pts, 0xFD, np.uint8)], axis=1)
        data.point_colors = np.ascontiguousarray(bgra).view(
            np.float32).reshape(-1)
        data.poses = [[(P, i / fps) if P is not None else None
                       for i, P in enumerate(poses)]]
    return FrontendResult(
        trajectory=traj, poses=poses, points3d=points3d,
        point_colors=colors, point_groups=groups, ba_data=data,
        n_keyframes=sum(1 for a in accepted_flags if a == 2),
        accepted=accepted_flags)


def _write_live(state, poses, fps, traj_out_file, map_out_file):
    """Periodic trajectory/map flush (write_output, slam2.py:698-740)."""
    from mqslam_tpu.io.nputil import matrix_to_quat_np

    ts, locs, quats = [], [], []
    for i, P in enumerate(poses):
        if P is None:
            continue
        ts.append(i / fps)
        locs.append(P[:3, 3])
        quats.append(matrix_to_quat_np(P[:3, :3]))
    tum.save_trajectory(traj_out_file, tum.CamTrajectory(
        np.asarray(ts), np.asarray(locs).reshape(-1, 3),
        np.asarray(quats).reshape(-1, 4)))
    if map_out_file:
        from mqslam_tpu.io import pcd as pcd_mod
        n = int(state.n_objp)
        pts = np.asarray(state.objp[:n])
        gray = np.clip(np.asarray(state.objp_color[:n]), 0,
                       255).astype(np.uint8)
        pcd_mod.save_pcd(map_out_file, pts,
                         np.stack([gray, gray, gray], axis=1))
