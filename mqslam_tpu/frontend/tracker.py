"""The jitted front-end step: flow -> reject ladder -> PnP -> keyframe logic.

Faithful to the reference front-end's per-frame pipeline
(reference: Work/SLAM/application/own/slam2.py:360-695 handle_new_frame, with
the tuning block slam2.py:1072-1096):

  1. pyramidal LK flow, drop tracks with err >= max_OF_error (:381-383)
  2. reject frame when lost-track ratio > 0.5 (:385-431)
  3. reject when < 8 triangulated tracks survive (:434-439)
  4. RANSAC PnP (2 px, outlier ratio <= 0.33) else reject (:448-468)
  5. refine PnP on inliers w/ extrinsic guess; reject if RMS > 2 px (:482-497)
  6. homography-degeneracy keyframe test (sigma0/sigma2 > 1.04, :43-58)
  7. on keyframe: triangulate new landmarks vs the last keyframe
     (iterative-LS, keep status==1), refine pose on all points,
     re-triangulate (keep status>=0), store landmarks, refill features
     to the target count, promote frame to keyframe (:539-692)

TPU-first: the track table is fixed capacity (slots + masks, no index
rebasing); every stage is batched masked arithmetic; frame rejection is a
single where-select back to the previous state; the keyframe branch runs
under the same trace with masked effects (no data-dependent Python control
flow).
"""

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mqslam_tpu.core import camera as cam_mod, se3, so3
from mqslam_tpu.ops import features, homography, lk, pnp
from mqslam_tpu.ops import triangulation as tri

__all__ = ["TrackerConfig", "TrackerState", "StepOutput", "make_step",
           "bootstrap"]


@dataclass(frozen=True)
class TrackerConfig:
    """Static tuning parameters (slam2.py:1072-1096 defaults)."""
    max_tracks: int = 384
    max_landmarks: int = 8192
    target_keypoints: int = 300          # min(300, area/(pi r^2))
    max_of_error: float = 12.0
    max_lost_tracks_ratio: float = 0.5
    coverage_radius: int = 12            # keypoint_coverage_radius
    corner_quality_level: float = 0.01
    homography_threshold: float = 1.04
    max_pnp_reproj_error: float = 2.0
    max_pnp_outlier_ratio: float = 0.33
    min_triangulated: int = 8
    ransac_hypotheses: int = 128
    lk_win: int = 21
    lk_levels: int = 3
    max_new_landmark_reproj: float = 1.0  # px gate on fresh triangulations


class TrackerState(NamedTuple):
    """Fixed-capacity tracker state (a pytree of device arrays)."""
    base_uv: jnp.ndarray        # [K, 2] position at last keyframe
    cur_uv: jnp.ndarray         # [K, 2] position at current frame
    active: jnp.ndarray         # [K] bool
    triangulated: jnp.ndarray   # [K] bool
    objp_idx: jnp.ndarray       # [K] int32 into landmark store
    objp: jnp.ndarray           # [M, 3]
    objp_color: jnp.ndarray     # [M] f32 sampled base-image intensity
    objp_group: jnp.ndarray     # [M] int32
    n_objp: jnp.ndarray         # scalar int32
    rvec: jnp.ndarray           # [3] current pose (world -> cam)
    tvec: jnp.ndarray           # [3]
    rvec_keyfr: jnp.ndarray     # [3] last keyframe pose
    tvec_keyfr: jnp.ndarray     # [3]
    group_id: jnp.ndarray       # scalar int32
    key: jnp.ndarray            # PRNG key


class TrackInterm(NamedTuple):
    """Intermediates between the tracking phase and the keyframe phase
    (see make_step: track_phase / kf_phase / finalize)."""
    key: jnp.ndarray
    new_uv: jnp.ndarray
    lost_ratio: jnp.ndarray
    tri_alive: jnp.ndarray
    track_objp: jnp.ndarray
    inlier: jnp.ndarray
    keep: jnp.ndarray
    rejected: jnp.ndarray
    reject_code: jnp.ndarray
    rvec_f: jnp.ndarray
    tvec_f: jnp.ndarray
    base_n: jnp.ndarray
    new_n: jnp.ndarray
    cond: jnp.ndarray
    is_kf: jnp.ndarray


class StepOutput(NamedTuple):
    """Per-frame results for the host (trajectory + BA bookkeeping)."""
    accepted: jnp.ndarray       # int32: 0 rejected, 1 tracked, 2 keyframe
    rvec: jnp.ndarray
    tvec: jnp.ndarray
    cur_uv: jnp.ndarray         # [K, 2] (valid where track_alive)
    track_alive: jnp.ndarray    # [K] bool after this frame
    track_triangulated: jnp.ndarray  # [K] bool after this frame
    objp_idx: jnp.ndarray       # [K]
    pnp_inlier: jnp.ndarray     # [K] bool (triangulated tracks used as 2D3D)
    new_landmarks: jnp.ndarray  # [K] bool tracks triangulated THIS frame
    n_tracks: jnp.ndarray
    lost_ratio: jnp.ndarray
    homography_condition: jnp.ndarray
    reject_code: jnp.ndarray    # 0 ok, 1 lost-tracks, 2 too-few-triangulated,
    #                             3 pnp-outlier-ratio, 4 reprojection-rms


def bootstrap(uv, objp, cal, img, config: TrackerConfig, key,
              timestamp_group: int = 0):
    """Frame-0 initialization from known 2D-3D correspondences
    (slam2.py:1121-1181: chessboard or predefined init points + absolute
    solvePnP + feature refill).

    One jitted trace end-to-end — the eager op-by-op form paid a separate
    remote TPU compile per small op (~2 minutes of bootstrap latency on the
    tunneled backend; one fused executable compiles in seconds)."""
    return _bootstrap_jit(jnp.asarray(uv, jnp.float32),
                          jnp.asarray(objp, jnp.float32), cal,
                          jnp.asarray(img, jnp.float32), config, key)


@partial(jax.jit, static_argnames=("config",))
def _bootstrap_jit(uv, objp, cal, img, config: TrackerConfig, key):
    K = config.max_tracks
    M = config.max_landmarks
    n0 = uv.shape[0]
    assert n0 <= K, "more init points than track capacity"

    # absolute pose from the init correspondences (coplanar-safe)
    uvn = cam_mod.undistort_points(uv, cal)
    R, t = pnp.pnp_solve(objp, uvn)
    rvec0 = so3.log(R)
    rvec, tvec = pnp.pnp_refine(objp, uv, cal, rvec0, t, iters=20)

    base_uv = jnp.zeros((K, 2), jnp.float32).at[:n0].set(uv)
    active = jnp.zeros(K, bool).at[:n0].set(True)
    triangulated = jnp.zeros(K, bool).at[:n0].set(True)
    objp_idx = jnp.zeros(K, jnp.int32).at[:n0].set(jnp.arange(n0))
    objp_store = jnp.zeros((M, 3), jnp.float32).at[:n0].set(objp)
    color0 = lk.bilinear_sample(jnp.asarray(img, jnp.float32), uv)
    objp_color = jnp.zeros(M, jnp.float32).at[:n0].set(color0)
    objp_group = jnp.zeros(M, jnp.int32)

    state = TrackerState(
        base_uv=base_uv, cur_uv=base_uv, active=active,
        triangulated=triangulated, objp_idx=objp_idx, objp=objp_store,
        objp_color=objp_color, objp_group=objp_group,
        n_objp=jnp.int32(n0), rvec=rvec, tvec=tvec, rvec_keyfr=rvec,
        tvec_keyfr=tvec, group_id=jnp.int32(1), key=key)
    # refill detection around the init points
    state = _refill(state, jnp.asarray(img, jnp.float32), config,
                    bump_group=False)
    return state


def _refill(state: TrackerState, img, config: TrackerConfig,
            bump_group=True):
    """Detect new corners (masked by existing tracks) and place them into
    free slots up to target_keypoints (slam2.py:656-672)."""
    K = config.max_tracks
    det_uv, det_valid = features.detect_corners(
        img, max_corners=K, quality_level=config.corner_quality_level,
        cell=config.coverage_radius, existing=state.cur_uv,
        existing_valid=state.active)
    n_cur = jnp.sum(state.active)
    to_add = jnp.maximum(0, config.target_keypoints - n_cur)

    # free slots first (stable order), new detections ranked by response
    free_order = jnp.argsort(state.active.astype(jnp.int32))  # free first
    n_free = K - n_cur
    det_rank = jnp.arange(K)
    det_take = det_valid & (det_rank < jnp.minimum(to_add, n_free))
    slot_for_det = free_order[det_rank]

    # scatter: for each taken detection j -> slot free_order[j]
    new_active = state.active.at[slot_for_det].set(
        jnp.where(det_take, True, state.active[slot_for_det]))
    new_cur = state.cur_uv.at[slot_for_det].set(
        jnp.where(det_take[:, None], det_uv, state.cur_uv[slot_for_det]))
    new_base = state.base_uv.at[slot_for_det].set(
        jnp.where(det_take[:, None], det_uv, state.base_uv[slot_for_det]))
    new_tri = state.triangulated.at[slot_for_det].set(
        jnp.where(det_take, False, state.triangulated[slot_for_det]))
    added_any = jnp.sum(det_take) > 0
    group_id = state.group_id + (jnp.int32(1) if bump_group else 0) * (
        added_any.astype(jnp.int32))
    return state._replace(base_uv=new_base, cur_uv=new_cur,
                          active=new_active, triangulated=new_tri,
                          group_id=group_id)


def make_step(cal: cam_mod.Cal3DS2, config: TrackerConfig):
    """Build the jitted per-frame step closed over calibration + config.

    Returns (step, refill_kf). ``step(state, prev_img, new_img)`` builds
    both pyramids; sequential runners use the pyramid-reusing
    ``step.pyr(state, prev_pyr, new_pyr)`` (one pyramid build per frame).
    """

    pad = lk.lk_pad(config.lk_win)

    def track_phase(state: TrackerState, new_uv, st_of, err_of):
        """Per-frame tracking up to the keyframe DECISION: reject ladder,
        RANSAC PnP, pose refinement, homography keyframe test.  Returns the
        intermediate pytree the (rare, expensive) keyframe phase and the
        finalizer consume — split so runners can gate the keyframe phase
        on an actual keyframe firing (under vmap a lax.cond inside one
        function lowers to select and would run every frame)."""
        key, k_ransac = jax.random.split(state.key)
        alive = state.active & st_of & (err_of < config.max_of_error)
        n_active = jnp.maximum(jnp.sum(state.active), 1)
        lost_ratio = (jnp.sum(state.active) - jnp.sum(alive)) / n_active
        reject_lost = lost_ratio > config.max_lost_tracks_ratio

        # ---- 2. PnP on triangulated survivors ----
        tri_alive = alive & state.triangulated
        n_tri = jnp.sum(tri_alive)
        reject_few = n_tri < config.min_triangulated

        track_objp = state.objp[state.objp_idx]  # [K, 3]
        rvec_r, tvec_r, inlier, n_inl = pnp.pnp_ransac(
            track_objp, new_uv, cal, tri_alive, k_ransac,
            n_hyp=config.ransac_hypotheses,
            reproj_threshold=config.max_pnp_reproj_error)
        outlier_ratio = (n_tri - n_inl) / jnp.maximum(n_tri, 1)
        reject_outl = (outlier_ratio > config.max_pnp_outlier_ratio) | (
            n_inl < config.min_triangulated)

        # ---- 3. refinement on inliers + reprojection gate ----
        rvec_f, tvec_f = pnp.pnp_refine(track_objp, new_uv, cal, rvec_r,
                                        tvec_r, valid=inlier, iters=20)
        rms, _ = pnp.reprojection_error(track_objp, new_uv, cal, rvec_f,
                                        tvec_f, valid=inlier)
        reject_rms = rms > config.max_pnp_reproj_error

        rejected = reject_lost | reject_few | reject_outl | reject_rms

        # tracks kept after PnP: triangulated inliers + all non-triangulated
        keep = (inlier & tri_alive) | (alive & ~state.triangulated)

        # ---- 4. keyframe test ----
        base_n = cam_mod.undistort_points(state.base_uv, cal)
        new_n = cam_mod.undistort_points(new_uv, cal)
        H = homography.fit_homography(base_n, new_n, keep)
        cond = homography.homography_condition(H)
        is_kf = (~rejected) & (cond > config.homography_threshold)

        reject_code = jnp.where(
            reject_lost, 1, jnp.where(
                reject_few, 2, jnp.where(
                    reject_outl, 3, jnp.where(
                        reject_rms, 4, 0)))).astype(jnp.int32)
        return TrackInterm(
            key=key, new_uv=new_uv, lost_ratio=lost_ratio,
            tri_alive=tri_alive, track_objp=track_objp, inlier=inlier,
            keep=keep, rejected=rejected, reject_code=reject_code,
            rvec_f=rvec_f, tvec_f=tvec_f, base_n=base_n, new_n=new_n,
            cond=cond, is_kf=is_kf)

    def kf_phase(state: TrackerState, t: TrackInterm, new_img_padded):
        """Keyframe processing: triangulate new landmarks vs the last
        keyframe, refine the pose on all points, re-triangulate, append to
        the landmark store (slam2.py:539-692).  Expensive — runners call
        it only when a keyframe actually fires."""
        K = config.max_tracks
        M = config.max_landmarks
        P_keyfr = se3.from_rvec_tvec(state.rvec_keyfr, state.tvec_keyfr)
        P_cur = se3.from_rvec_tvec(t.rvec_f, t.tvec_f)
        nontri = t.keep & ~state.triangulated
        # optimal (Lindstrom epipolar correction + DLT) instead of the
        # reference's iterative-LS (slam2 via triangulation.py:148): same
        # accuracy class, but 8.4 vs 1.2 Mpts/s on TPU (bench rows) — the
        # two keyframe-phase triangulations were ~8 ms of the A=16
        # frame-group (prof_multi).  optimal's bool status has no
        # chirality term, so check both depths explicitly here.
        x_new, st_tri = tri.optimal(t.base_n, P_keyfr, t.new_n, P_cur)
        d_kf = jnp.sum(P_keyfr[2, :3][None] * x_new, axis=-1) + P_keyfr[2, 3]
        d_cu = jnp.sum(P_cur[2, :3][None] * x_new, axis=-1) + P_cur[2, 3]
        ok1 = nontri & st_tri & (d_kf > 0) & (d_cu > 0)

        # refine pose on inlier-triangulated + freshly triangulated pts
        objp_all = jnp.where(ok1[:, None], x_new, t.track_objp)
        use_pts = (t.inlier & t.tri_alive) | ok1
        rvec_kf, tvec_kf = pnp.pnp_refine(objp_all, t.new_uv, cal,
                                          t.rvec_f, t.tvec_f,
                                          valid=use_pts, iters=20)
        # re-triangulate with refined pose; the reprojection gate below
        # enforces chirality (z > 0 in both views) for this pass
        P_cur2 = se3.from_rvec_tvec(rvec_kf, tvec_kf)
        x_new2, st_tri2 = tri.optimal(t.base_n, P_keyfr, t.new_n, P_cur2)
        ok2 = ok1 & st_tri2

        # quality gate on the NEW landmarks: both-view reprojection must
        # close to within max_new_landmark_reproj px.  Short-baseline
        # keyframe pairs (rapid keyframing through low-texture stretches)
        # otherwise inject noisy depths that skew every later PnP —
        # measured on ICL traj3n frames 110-140, where landmark churn
        # drove the front-end from 0.005 m to ~0.1 m absolute error.
        def _reproj_ok2(x, P, uvn, thr2):
            Xc = jnp.sum(P[:3, :3][None] * x[:, None, :], axis=-1) \
                + P[:3, 3][None]
            z = Xc[:, 2]
            uv = Xc[:, :2] / jnp.maximum(z[:, None], 1e-6)
            return (z > 1e-6) & (jnp.sum((uv - uvn) ** 2, axis=1) < thr2)

        thr_n = config.max_new_landmark_reproj / jnp.abs(cal.fx)
        ok2 = (ok2 & _reproj_ok2(x_new2, P_keyfr, t.base_n, thr_n ** 2)
               & _reproj_ok2(x_new2, P_cur2, t.new_n, thr_n ** 2))


        # landmark store append (capped at M)
        new_rank = jnp.cumsum(ok2.astype(jnp.int32)) - 1
        dest = state.n_objp + new_rank
        can_store = ok2 & (dest < M)
        dest_safe = jnp.where(can_store, dest, M - 1)
        objp_store = state.objp.at[dest_safe].set(
            jnp.where(can_store[:, None], x_new2,
                      state.objp[dest_safe]))
        # NOTE: the reference samples landmark colors from the base
        # (keyframe) image (slam2.py:627, "they don't have OF drift");
        # this frame is becoming the new base image, so sampling it at
        # the tracked positions matches those semantics.
        color_new = lk.bilinear_sample(new_img_padded, t.new_uv + pad)
        objp_color = state.objp_color.at[dest_safe].set(
            jnp.where(can_store, color_new,
                      state.objp_color[dest_safe]))
        objp_group = state.objp_group.at[dest_safe].set(
            jnp.where(can_store, state.group_id,
                      state.objp_group[dest_safe]))
        n_objp_new = state.n_objp + jnp.sum(can_store)

        # at a keyframe: drop non-triangulated failed tracks (:615-617)
        keep_kf = (t.inlier & t.tri_alive) | can_store
        return (rvec_kf, tvec_kf, objp_store, objp_color, objp_group,
                n_objp_new, can_store, dest_safe, keep_kf)

    def no_kf_phase(state: TrackerState, t: TrackInterm):
        K = config.max_tracks
        M = config.max_landmarks
        return (t.rvec_f, t.tvec_f, state.objp, state.objp_color,
                state.objp_group, state.n_objp,
                jnp.zeros(K, bool), jnp.full(K, M - 1, jnp.int32),
                t.keep)

    def finalize(state: TrackerState, t: TrackInterm, kf_out):
        """Assemble the three outcomes (keyframe / accepted / rejected)."""
        (rvec_kf, tvec_kf, objp_store, objp_color, objp_group, n_objp_new,
         can_store, dest_safe, keep_kf) = kf_out
        is_kf, rejected = t.is_kf, t.rejected

        def sel(kf_val, acc_val, rej_val):
            return jnp.where(is_kf, kf_val,
                             jnp.where(rejected, rej_val, acc_val))

        active_out = sel(keep_kf, t.keep, state.active)
        objp_idx_out = jnp.where(is_kf & can_store,
                                 dest_safe.astype(jnp.int32),
                                 state.objp_idx)
        cur_uv_out = jnp.where(rejected, state.cur_uv, t.new_uv)
        base_uv_out = jnp.where(is_kf, t.new_uv, state.base_uv)

        new_state = TrackerState(
            base_uv=base_uv_out,
            cur_uv=cur_uv_out,
            active=active_out,
            triangulated=jnp.where(is_kf,
                                   state.triangulated | can_store,
                                   state.triangulated),
            objp_idx=objp_idx_out,
            objp=jnp.where(is_kf, objp_store, state.objp),
            objp_color=jnp.where(is_kf, objp_color, state.objp_color),
            objp_group=jnp.where(is_kf, objp_group, state.objp_group),
            n_objp=jnp.where(is_kf, n_objp_new, state.n_objp),
            rvec=sel(rvec_kf, t.rvec_f, state.rvec),
            tvec=sel(tvec_kf, t.tvec_f, state.tvec),
            rvec_keyfr=jnp.where(is_kf, rvec_kf, state.rvec_keyfr),
            tvec_keyfr=jnp.where(is_kf, tvec_kf, state.tvec_keyfr),
            group_id=state.group_id,
            key=t.key,
        )

        out = StepOutput(
            accepted=jnp.where(rejected, 0, jnp.where(is_kf, 2, 1)
                               ).astype(jnp.int32),
            rvec=new_state.rvec, tvec=new_state.tvec,
            cur_uv=new_state.cur_uv,
            track_alive=new_state.active,
            track_triangulated=new_state.triangulated,
            objp_idx=new_state.objp_idx,
            pnp_inlier=t.inlier & t.tri_alive,
            new_landmarks=is_kf & can_store,
            n_tracks=jnp.sum(new_state.active),
            lost_ratio=t.lost_ratio,
            homography_condition=t.cond,
            reject_code=t.reject_code,
        )
        return new_state, out

    def post_flow(state: TrackerState, new_img_padded, new_uv, st_of,
                  err_of):
        """Everything after optical flow: reject ladder, PnP, keyframe
        logic. Split out so the multi-agent runner can feed flow results
        from one shared atlas-LK call (see make_multi_agent_runner).

        The keyframe phase runs under lax.cond — skipped on non-keyframes,
        which is most frames (saves 2 triangulations + a 10-iter pose
        refine of per-frame latency).  Runners that vmap over agents must
        instead gate a vmapped kf_phase on any(is_kf) themselves: see
        make_multi_agent_runner."""
        t = track_phase(state, new_uv, st_of, err_of)
        kf_out = jax.lax.cond(
            t.is_kf,
            lambda args: kf_phase(*args),
            lambda args: no_kf_phase(args[0], args[1]),
            (state, t, new_img_padded))
        return finalize(state, t, kf_out)

    post_flow.track_phase = track_phase
    post_flow.kf_phase = kf_phase
    post_flow.no_kf_phase = no_kf_phase
    post_flow.finalize = finalize

    def step_pyr(state: TrackerState, prev_pyr, new_pyr):
        """Per-frame step over pyramids pre-padded by ``lk.lk_pad(win)``
        (build via lk.build_pyramid(img, levels, pad=...))."""
        new_uv, st_of, err_of = lk.lk_track_pyr(
            prev_pyr, new_pyr, state.cur_uv, state.active,
            win=config.lk_win, prepad=True)
        return post_flow(state, new_pyr[0], new_uv, st_of, err_of)

    step_pyr.post_flow = post_flow

    def step_images(state: TrackerState, prev_img, new_img):
        pyr = lambda im: tuple(lk.build_pyramid(
            jnp.asarray(im, jnp.float32), config.lk_levels, pad=pad))
        return step_pyr(state, pyr(prev_img), pyr(new_img))

    step = jax.jit(step_images)

    @jax.jit
    def refill_kf(state: TrackerState, new_img):
        """Feature refill — run after a keyframe step (host calls this when
        out.accepted == 2, mirroring slam2.py:656-672)."""
        return _refill(state, new_img, config, bump_group=True)

    return step, refill_kf, step_pyr


def make_scan_runner(cal: cam_mod.Cal3DS2, config: TrackerConfig):
    """Whole-sequence jitted runner: lax.scan of step (+ conditional keyframe
    refill) over a device-resident image stack — the pure-device throughput
    path used by bench.py (no per-frame host round-trips).

    The scan carry holds the previous frame's image pyramid, so each frame
    pays exactly one ``build_pyramid``.

    Returns jitted fn: (state, imgs [T+1, H, W]) -> (final_state,
    per-frame (accepted, rvec, tvec)).
    """
    _, _, step_pyr = make_step(cal, config)
    pad = lk.lk_pad(config.lk_win)

    @jax.jit
    def run(state: TrackerState, imgs):
        def body(carry, idx):
            state, prev_pyr = carry
            new_img = imgs[idx + 1]
            new_pyr = tuple(lk.build_pyramid(new_img, config.lk_levels,
                                             pad=pad))
            state, out = step_pyr(state, prev_pyr, new_pyr)
            state = jax.lax.cond(out.accepted == 2,
                                 lambda s: _refill(s, new_img, config),
                                 lambda s: s, state)
            return (state, new_pyr), (out.accepted, out.rvec, out.tvec)

        n = imgs.shape[0] - 1
        pyr0 = tuple(lk.build_pyramid(imgs[0], config.lk_levels, pad=pad))
        (state, _), outs = jax.lax.scan(body, (state, pyr0), jnp.arange(n))
        return state, outs

    return run


def make_multi_agent_runner(cal: cam_mod.Cal3DS2, config: TrackerConfig,
                            collect: bool = False):
    """Whole-sequence runner for A agents tracked concurrently: the step
    vmaps over the agent axis, so the latency-bound small ops amortize —
    the multi-quadrotor throughput path (aggregate frames/s scales with A
    until the chip saturates).

    Returns jitted fn: (states [A-stacked pytree], imgs [A, T+1, H, W]) ->
    (final states, per-frame (accepted [T, A], rvec, tvec)).

    ``collect=True`` appends the per-frame track-level outputs
    (cur_uv, track_alive, track_triangulated, new_landmarks, pnp_inlier,
    objp_idx) to the scan outputs so a host-side dump builder
    (multiagent.fleet_dump.ba_data_from_scan) can reconstruct each
    agent's BAData — the device-resident analog of run_frontend's
    collect_ba bookkeeping.
    """
    _, _, step_pyr = make_step(cal, config)
    pad = lk.lk_pad(config.lk_win)
    post_flow = step_pyr.post_flow
    vtrack = jax.vmap(post_flow.track_phase)
    vkf = jax.vmap(post_flow.kf_phase)
    vno_kf = jax.vmap(post_flow.no_kf_phase)
    vfinal = jax.vmap(post_flow.finalize)
    vrefill = jax.vmap(lambda s, img: _refill(s, img, config))
    K = config.max_tracks

    def atlas_pyramid(imgs_a):
        """[A, H, W] -> per-level [A*Hp, Wp] vertical atlases (each tile
        pre-padded). One shared image per level lets ALL agents' tracks go
        through a single LK call — the vmapped per-agent form lowered the
        per-track dynamic_slice to a serial gather (linear in A)."""
        pyrs = jax.vmap(lambda im: tuple(lk.build_pyramid(
            im, config.lk_levels, pad=pad)))(imgs_a)
        return tuple(l.reshape(l.shape[0] * l.shape[1], l.shape[2])
                     for l in pyrs)

    @jax.jit
    def run(states: TrackerState, imgs):
        A = imgs.shape[0]
        agent_ids = jnp.repeat(jnp.arange(A, dtype=jnp.int32), K)

        def body(carry, idx):
            states, prev_atlas = carry
            new = imgs[:, idx + 1]
            new_atlas = atlas_pyramid(new)
            uv_flat = states.cur_uv.reshape(A * K, 2)
            act_flat = states.active.reshape(A * K)
            new_uv, st_of, err_of = lk.lk_track_pyr(
                prev_atlas, new_atlas, uv_flat, act_flat,
                win=config.lk_win, prepad=True, atlas_agents=agent_ids,
                atlas_tiles=A, atlas_contiguous=True)
            # per-agent padded level-0 tiles for the keyframe color sampling
            Hp0 = new_atlas[0].shape[0] // A
            tiles0 = new_atlas[0].reshape(A, Hp0, new_atlas[0].shape[1])
            t = vtrack(states, new_uv.reshape(A, K, 2),
                       st_of.reshape(A, K), err_of.reshape(A, K))
            # under vmap a per-agent lax.cond lowers to select (the
            # keyframe phase — 2 triangulations + a 10-iter pose refine +
            # landmark scatter — would run EVERY frame for EVERY agent);
            # gate the vmapped phase on any agent keyframing instead
            kf_out = jax.lax.cond(
                jnp.any(t.is_kf),
                lambda args: vkf(*args),
                lambda args: vno_kf(args[0], args[1]),
                (states, t, tiles0))
            states, out = vfinal(states, t, kf_out)
            kf = out.accepted == 2

            def do_refill(states):
                refilled = vrefill(states, new)
                return jax.tree_util.tree_map(
                    lambda a, b: jnp.where(
                        kf.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
                    states, refilled)

            # full-image corner detection per agent is the most expensive
            # op in the body — only pay it on frames where SOME agent
            # keyframed (the single-agent scan has the same cond)
            states = jax.lax.cond(jnp.any(kf), do_refill, lambda s: s,
                                  states)
            outs = (out.accepted, out.rvec, out.tvec)
            if collect:
                outs = outs + (out.cur_uv, out.track_alive,
                               out.track_triangulated, out.new_landmarks,
                               out.pnp_inlier, out.objp_idx)
            return (states, new_atlas), outs

        n = imgs.shape[1] - 1
        atlas0 = atlas_pyramid(imgs[:, 0])
        (states, _), outs = jax.lax.scan(body, (states, atlas0),
                                         jnp.arange(n))
        return states, outs

    return run
