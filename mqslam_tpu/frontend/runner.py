"""Host loop around the jitted tracker step: IO, trajectory, BA-info export.

The device does all per-frame compute (frontend.tracker.make_step); this loop
only feeds images and keeps the factor-graph bookkeeping the reference's
BundleAdjustmentInfoContainer did (reference: Work/SLAM/application/own/
slam2.py:743-865 writer, :1203-1253 main loop). Rejected frames are dropped
entirely — the next flow starts from the last accepted image and the
trajectory keeps a hole (slam2.py:1221-1225).
"""

import os
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
    loop_edges: List[tuple] = field(default_factory=list)
    # (kf_i, kf_j, meas_r [3], meas_t [3]) accepted loop closures


def _cam_to_world(rvec, tvec):
    P = np.asarray(se3.from_rvec_tvec(jnp.asarray(rvec), jnp.asarray(tvec)))
    return np.asarray(se3.inv(jnp.asarray(P)))


def run_frontend(images, cal: cam_mod.Cal3DS2, config: trk.TrackerConfig,
                 init_uv, init_objp, fps: float = 30.0, seed: int = 0,
                 collect_ba: bool = True, verbose: bool = False,
                 live_update_period: int = 0, traj_out_file: str = None,
                 map_out_file: str = None, loop_closure: bool = False,
                 loop_min_gap: int = 5, loop_min_matches: int = 25,
                 max_keyframes: int = 256, t0: float = 0.0,
                 checkpoint_every: int = 0, checkpoint_path: str = None,
                 resume_from: str = None, debug_dir: str = None,
                 debug_every: int = 10):
    """Run the front-end over a grayscale image sequence.

    images: iterable of [H, W] float arrays (0..255). init_uv/init_objp:
    frame-0 2D-3D correspondences (chessboard grid or predefined points,
    slam2.py:1121-1146). With ``live_update_period`` > 0 and output paths
    set, the trajectory + map are flushed every N frames — the reference's
    live Blender-viewer hook (slam2.py:1244-1248, blender_tools.py:501-596
    polls these files).

    loop_closure=True maintains an ORB keyframe database; verified loop
    edges + keyframe odometry feed a pose-graph optimization that corrects
    every pose and landmark after the sequence (the capability the
    reference lacks — its drift correction is offline BA only).

    ``t0`` is the timestamp of frame 0; the reference convention is
    t0 = 1/fps (dataset_tools.py:275-294 convert_cam_poses_to_cam_trajectory
    "Timestamp of first pose starts at 1.0 / fps"), which the CLI uses so
    trajectories associate with the ICL-NUIM/SVO ground-truth files.

    With ``checkpoint_every`` > 0 and ``checkpoint_path`` set, the full
    resumable state (tracker pytree incl. PRNG key + host bookkeeping) is
    written every N accepted frames; ``resume_from`` restarts mid-sequence
    bit-identically to an uninterrupted run (frontend/checkpoint.py).

    ``debug_dir`` writes the Composite 2D/3D debug views (viz/painter.py —
    the headless equivalent of slam2's __debug__ windows, slam2.py:78-286,
    1227-1242) as PNGs every ``debug_every`` frames, plus every keyframe
    and every rejected frame (red border).
    """
    if resume_from and loop_closure:
        raise ValueError("resume_from with loop_closure is not supported")
    images = iter(images)
    first = np.asarray(next(images), dtype=np.float32)
    step, refill_kf, _ = trk.make_step(cal, config)

    # --- headless debug views (slam2's __debug__ composite windows,
    #     slam2.py:78-286, 1227-1242, rendered to PNGs every N frames) ---
    painter2d = painter3d = None
    if debug_dir:
        from mqslam_tpu.core.camera import K_from_cal
        from mqslam_tpu.viz.painter import (Composite2DPainter,
                                            Composite3DPainter)
        os.makedirs(debug_dir, exist_ok=True)
        h0, w0 = first.shape[:2]
        painter2d = Composite2DPainter((w0, h0))
        # bird's-eye-ish view pulled back along +z (navigable in the
        # interactive reference; fixed here — headless)
        P_view = np.eye(4)
        P_view[2, 3] = 12.0
        painter3d = Composite3DPainter(P_view[:3], (w0, h0))
        dbg_K = np.asarray(K_from_cal(cal), np.float64)
        dbg_dist = np.asarray([float(cal.k1), float(cal.k2),
                               float(cal.p1), float(cal.p2)])

    def debug_draw(frame_idx, img_np, status, rvec, tvec, uv, alive,
                   triangulated, objp_idx):
        if painter2d is None:
            return
        if status > 0 and not (status == 2
                               or frame_idx % max(debug_every, 1) == 0):
            return
        n = int(state.n_objp)
        painter2d.draw(img_np, rvec, tvec, status, dbg_K, dbg_dist,
                       uv, alive, triangulated, objp_idx,
                       np.asarray(state.objp),
                       np.asarray(state.objp_group),
                       int(state.group_id), depth_labels=False)
        painter2d.save(os.path.join(debug_dir,
                                    f"composite2d_{frame_idx:05d}.png"))
        painter3d.draw(rvec, tvec, status,
                       np.asarray(state.objp[:n]),
                       np.asarray(state.objp_color[:n]),
                       np.asarray(state.objp_group[:n]),
                       neg_fy=float(cal.fy) < 0)
        painter3d.save(os.path.join(debug_dir,
                                    f"composite3d_{frame_idx:05d}.png"))

    resume_state = None
    if resume_from:
        from mqslam_tpu.frontend.checkpoint import load_checkpoint
        (state, resume_frame, prev_np, poses, accepted_flags,
         bk) = load_checkpoint(resume_from)
        for _ in range(resume_frame):  # frame 0 already consumed
            next(images)
        resume_state = (resume_frame, prev_np, bk)
    else:
        key = jax.random.PRNGKey(seed)
        state = trk.bootstrap(init_uv, init_objp, cal, first, config, key)
        poses = []
        accepted_flags = []
        P0 = _cam_to_world(state.rvec, state.tvec)
        poses.append(P0)
        accepted_flags.append(2)

    n_init = len(init_uv)

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

    if resume_state is not None:
        data, history, last_kf_frame = resume_state[2]
    elif collect_ba:
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

    # --- loop-closure bookkeeping (keyframe DB + edges) ---
    loop_edges = []
    if loop_closure:
        from mqslam_tpu.frontend import loopclosure as lc
        from mqslam_tpu.ops import orb as orb_mod

        db = lc.empty_db(capacity=max_keyframes, k=config.max_tracks)
        lc_key = jax.random.PRNGKey(seed + 1)
        kf_frames = [0]
        desc0, _, okd0 = orb_mod.brief_describe(
            jnp.asarray(first), state.cur_uv, state.active)
        xyz0 = state.objp[state.objp_idx]
        db = lc.add_keyframe(
            db, desc0, okd0, state.cur_uv, xyz0,
            state.active & state.triangulated & okd0,
            jnp.asarray(_pose6_from_w2c(state.rvec, state.tvec)))
        lm_ranges = [(0, int(state.n_objp), 0)]
        last_n_objp = int(state.n_objp)

    if resume_state is not None:
        frame_idx = resume_state[0]
        prev_img = jnp.asarray(resume_state[1])
    else:
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
                why = {1: "lost-tracks", 2: "too-few-triangulated",
                       3: "pnp-outlier-ratio", 4: "reprojection-rms"}.get(
                           int(out.reject_code), "?")
                print(f"frame {frame_idx}: REJECTED ({why}, "
                      f"lost_ratio={float(out.lost_ratio):.2f})")
            debug_draw(frame_idx, np.asarray(new_img), 0, out.rvec,
                       out.tvec, out.cur_uv, out.track_alive,
                       out.track_triangulated, out.objp_idx)
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
                # last keyframe (slam2.py:633-641). They are introduced at
                # THIS step (assoc list index = current step) but each row's
                # frame field points at the historical frame — the
                # add_points2D_3Dassoc semantics (slam2.py:777-783), which
                # is also what keeps the incremental no-future-refs
                # invariant (DataStructures.hpp:139,156-158).
                rows = []
                for (f_idx, uv_h, alive_h, comp_h) in history:
                    for s in new_slots:
                        if alive_h[s] and comp_h[s] >= 0:
                            rows.append((f_idx, comp_h[s], oidx[s]))
                if rows:
                    data.point2D3D_assocs[0][frame_idx] = np.concatenate([
                        data.point2D3D_assocs[0][frame_idx],
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
            if loop_closure:
                kf_ord = len(kf_frames)
                if kf_ord == max_keyframes:
                    # DB saturated: later keyframes are not queryable as
                    # loop candidates (add_keyframe becomes a no-op)
                    print(f"WARNING: loop-closure keyframe DB full "
                          f"({max_keyframes}); frame {frame_idx} and later "
                          f"keyframes will not be stored", flush=True)
                alive_j = out.track_alive
                desc, _, okd = orb_mod.brief_describe(new_img, out.cur_uv,
                                                      alive_j)
                # query before inserting (recency gate in KF ordinals)
                scores, i1, good = lc.loop_scores(
                    db, desc, okd, cur_index=jnp.int32(kf_ord),
                    min_gap=loop_min_gap)
                cand, found = lc.best_candidate(
                    scores, min_matches=loop_min_matches)
                if bool(found):
                    lc_key, k2 = jax.random.split(lc_key)
                    rv, tv, n_inl, okv = lc.verify_loop(
                        db, cand, i1, good, out.cur_uv, okd, cal, k2)
                    if bool(okv):
                        mr, mt = lc.relative_edge(db.pose[cand], rv, tv)
                        loop_edges.append((int(cand), kf_ord,
                                           np.asarray(mr), np.asarray(mt)))
                        if verbose:
                            print(f"frame {frame_idx}: LOOP kf{int(cand)}"
                                  f"->kf{kf_ord} ({int(n_inl)} inliers)")
                xyz = state.objp[state.objp_idx]
                db = lc.add_keyframe(
                    db, desc, okd, out.cur_uv, xyz,
                    alive_j & out.track_triangulated & okd,
                    jnp.asarray(_pose6_from_w2c(out.rvec, out.tvec)))
                kf_frames.append(frame_idx)
                n_now = int(state.n_objp)
                lm_ranges.append((last_n_objp, n_now, kf_ord))
                last_n_objp = n_now
            state = refill_kf(state, new_img)

        if verbose:
            print(f"frame {frame_idx}: acc={acc} "
                  f"tracks={int(out.n_tracks)} "
                  f"H-cond={float(out.homography_condition):.3f}")
        debug_draw(frame_idx, np.asarray(new_img), acc, out.rvec, out.tvec,
                   out.cur_uv, out.track_alive, out.track_triangulated,
                   out.objp_idx)
        if (live_update_period and traj_out_file
                and frame_idx % live_update_period == 0):
            _write_live(state, poses, fps, traj_out_file, map_out_file,
                        t0=t0)
        prev_img = new_img
        if (checkpoint_every and checkpoint_path
                and frame_idx % checkpoint_every == 0):
            from mqslam_tpu.frontend.checkpoint import save_checkpoint
            bk = (data, history, last_kf_frame) if collect_ba else \
                (None, [], 0)
            save_checkpoint(checkpoint_path, state, frame_idx,
                            np.asarray(prev_img), poses, accepted_flags,
                            bookkeeping=bk)

    # --- pose-graph loop-closure correction ---
    n_pts = int(state.n_objp)
    points3d = np.array(state.objp[:n_pts])  # writable host copy
    if loop_closure and loop_edges:
        poses, T_kf = _pgo_correct(poses, kf_frames, loop_edges)
        # landmarks move with the keyframe that created them
        for (lo, hi, kf_ord) in lm_ranges:
            T = T_kf[kf_ord]
            pts = points3d[lo:min(hi, n_pts)]
            points3d[lo:min(hi, n_pts)] = pts @ T[:3, :3].T + T[:3, 3]
        state = state._replace(objp=state.objp.at[:n_pts].set(
            jnp.asarray(points3d)))

    # --- outputs ---
    colors = np.asarray(state.objp_color[:n_pts])
    groups = np.asarray(state.objp_group[:n_pts])
    ts, locs, quats = [], [], []
    from mqslam_tpu.core import quat as quat_mod
    for i, P in enumerate(poses):
        if P is None:
            continue
        q = np.asarray(quat_mod.from_matrix(jnp.asarray(P[:3, :3])))
        ts.append(t0 + i / fps)
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
        data.poses = [[(P, t0 + i / fps) if P is not None else None
                       for i, P in enumerate(poses)]]
    return FrontendResult(
        trajectory=traj, poses=poses, points3d=points3d,
        point_colors=colors, point_groups=groups, ba_data=data,
        n_keyframes=sum(1 for a in accepted_flags if a == 2),
        accepted=accepted_flags, loop_edges=loop_edges)


def _pose6_from_w2c(rvec, tvec):
    """(rvec, center) cam-to-world pose6 from a world->cam (rvec, tvec)."""
    from mqslam_tpu.core import so3

    rvec = np.asarray(rvec, np.float32)
    R = np.asarray(so3.exp(jnp.asarray(rvec)))
    c = -(R.T @ np.asarray(tvec, np.float32))
    return np.concatenate([-rvec, c]).astype(np.float32)


def _pgo_correct(poses, kf_frames, loop_edges):
    """Pose-graph optimization over the keyframes; every frame and landmark
    is corrected by its governing keyframe's world transform.

    Returns (new_poses list, T_kf [n_kf, 4, 4] world corrections)."""
    from mqslam_tpu.core import so3
    from mqslam_tpu.ba import posegraph as pg

    n = len(kf_frames)
    p6 = np.zeros((n, 6), np.float32)
    for k, f in enumerate(kf_frames):
        P = poses[f]
        p6[k, :3] = np.asarray(so3.log(jnp.asarray(
            P[:3, :3].astype(np.float32))))
        p6[k, 3:] = P[:3, 3]

    def between(i, j):
        Pi, Pj = poses[kf_frames[i]], poses[kf_frames[j]]
        D = np.linalg.inv(Pi) @ Pj
        mr = np.asarray(so3.log(jnp.asarray(D[:3, :3].astype(np.float32))))
        return mr, D[:3, 3].astype(np.float32)

    E = n - 1 + len(loop_edges)
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    mr = np.zeros((E, 3), np.float32)
    mt = np.zeros((E, 3), np.float32)
    sig = np.zeros((E, 6), np.float32)
    for k in range(n - 1):
        ei[k], ej[k] = k, k + 1
        mr[k], mt[k] = between(k, k + 1)
        sig[k] = [1 / 0.01] * 3 + [1 / 0.05] * 3   # odometry confidence
    for e, (i, j, r, t) in enumerate(loop_edges):
        k = n - 1 + e
        ei[k], ej[k] = i, j
        mr[k], mt[k] = r, t
        sig[k] = [1 / 0.005] * 3 + [1 / 0.02] * 3  # verified loops: tight
    prior_mask = np.zeros(n, bool)
    prior_mask[0] = True
    prior_r = np.zeros((n, 3), np.float32)
    prior_t = np.zeros((n, 3), np.float32)
    prior_r[0], prior_t[0] = p6[0, :3], p6[0, 3:]
    g = pg.PoseGraph(
        poses=jnp.asarray(p6), pose_valid=jnp.ones(n, bool),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        edge_meas_r=jnp.asarray(mr), edge_meas_t=jnp.asarray(mt),
        edge_inv_sigma=jnp.asarray(sig), edge_valid=jnp.ones(E, bool),
        prior_mask=jnp.asarray(prior_mask), prior_r=jnp.asarray(prior_r),
        prior_t=jnp.asarray(prior_t),
        prior_inv_sigma=jnp.tile(jnp.asarray([1e3] * 6, jnp.float32),
                                 (n, 1)))
    new_p6, _, _ = pg.pgo_solve(g, iters=25)
    new_p6 = np.asarray(new_p6)

    T_kf = np.zeros((n, 4, 4), np.float64)
    for k, f in enumerate(kf_frames):
        Pn = np.eye(4)
        Pn[:3, :3] = np.asarray(so3.exp(jnp.asarray(new_p6[k, :3])))
        Pn[:3, 3] = new_p6[k, 3:]
        T_kf[k] = Pn @ np.linalg.inv(poses[f])

    # governing keyframe of each frame = last keyframe at or before it
    new_poses = list(poses)
    kf_ptr = 0
    for f in range(len(poses)):
        while kf_ptr + 1 < n and kf_frames[kf_ptr + 1] <= f:
            kf_ptr += 1
        if poses[f] is not None:
            new_poses[f] = T_kf[kf_ptr] @ poses[f]
    return new_poses, T_kf


def _write_live(state, poses, fps, traj_out_file, map_out_file,
                t0: float = 0.0):
    """Periodic trajectory/map flush (write_output, slam2.py:698-740)."""
    from mqslam_tpu.io.nputil import matrix_to_quat_np

    ts, locs, quats = [], [], []
    for i, P in enumerate(poses):
        if P is None:
            continue
        ts.append(t0 + i / fps)
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
