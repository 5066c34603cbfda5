"""BA problem container: static-shape factor arrays + conversion from BAData.

The data model mirrors the reference's (reference: Work/SLAM/tools/
bundle_adjustment/DataStructures.hpp:55-88): per-camera pose chains over
steps, a shared landmark store, 2D observations bound to (camera, frame,
landmark), odometry (between) factors — including cross-camera ones — and
priors on the first poses / first landmark batch (bundle_adjust.cpp:268-282).

Poses are parameterized as cam-to-world (rvec, tvec) — the same convention
the BA wire format stores (IO.hpp:221-228, TUM-style world transforms).
All index arrays are flattened & padded to static sizes with validity masks.
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

__all__ = ["BAProblem", "BAVariables", "problem_from_ba_data",
           "variables_from_problem"]


class BAVariables(NamedTuple):
    """The optimized quantities."""
    pose_r: jnp.ndarray    # [F, 3] rvec of cam-to-world
    pose_t: jnp.ndarray    # [F, 3] camera center in world
    points: jnp.ndarray    # [P, 3]


class BAProblem(NamedTuple):
    """Constant problem data (pytree of device arrays + static sizes)."""
    # initial values
    init: BAVariables
    pose_valid: jnp.ndarray    # [F] bool (False = hole, not optimized)
    point_valid: jnp.ndarray   # [P] bool
    # calibration per camera [C, 9] (Cal3DS2 order)
    calibrations: jnp.ndarray
    # projection factors
    obs_uv: jnp.ndarray        # [O, 2] pixels
    obs_pose: jnp.ndarray      # [O] int32 flattened cam * S + frame
    obs_cam: jnp.ndarray       # [O] int32
    obs_point: jnp.ndarray     # [O] int32
    obs_sigma: jnp.ndarray     # [O] isotropic pixel sigma
    obs_valid: jnp.ndarray     # [O] bool
    # between (odometry) factors: measured = W_from^-1 W_to
    odo_r: jnp.ndarray         # [Q, 3]
    odo_t: jnp.ndarray         # [Q, 3]
    odo_from: jnp.ndarray      # [Q] int32 (flattened pose index)
    odo_to: jnp.ndarray        # [Q] int32
    odo_sigma: jnp.ndarray     # [Q, 6] (rot xyz, trans xyz) sigmas
    odo_valid: jnp.ndarray     # [Q] bool
    # pose priors
    prior_pose_idx: jnp.ndarray    # [Rp] int32
    prior_pose_r: jnp.ndarray      # [Rp, 3]
    prior_pose_t: jnp.ndarray      # [Rp, 3]
    prior_pose_sigma: jnp.ndarray  # [Rp, 6]
    prior_pose_valid: jnp.ndarray  # [Rp] bool
    # point priors
    prior_point_idx: jnp.ndarray    # [Rq] int32
    prior_point_xyz: jnp.ndarray    # [Rq, 3]
    prior_point_sigma: jnp.ndarray  # [Rq]
    prior_point_valid: jnp.ndarray  # [Rq] bool

    @property
    def n_poses(self):
        return self.init.pose_r.shape[0]

    @property
    def n_points(self):
        return self.init.points.shape[0]


def variables_from_problem(problem: BAProblem) -> BAVariables:
    return problem.init


def _pad(a, n, fill=0):
    a = np.asarray(a)
    out = np.full((n,) + a.shape[1:], fill, dtype=a.dtype)
    out[:len(a)] = a
    return out


def _round_up(n, m=128):
    return max(m, ((n + m - 1) // m) * m)


def problem_from_ba_data(data, pad_multiple: int = 128,
                         step_limit: int = None) -> BAProblem:
    """Build a BAProblem from a loaded/collected BA_info dump.

    Follows performBundleAdjustment's graph construction
    (bundle_adjust.cpp:245-309): initial pose estimates from the front-end
    trajectory (holes stay unoptimized), initial landmarks from the map,
    projection factors from point2D3D assocs, between factors from odometry
    assocs, priors on each camera's first valid pose and on the first
    landmark batch. ``step_limit`` truncates to the first N steps (the
    incremental mode re-uses this).
    """
    import jax.numpy as jnp
    from mqslam_tpu.core import so3

    C = data.nr_cameras
    S = data.nr_steps if step_limit is None else min(step_limit,
                                                    data.nr_steps)
    F = C * S

    pose_r = np.zeros((F, 3))
    pose_t = np.zeros((F, 3))
    pose_valid = np.zeros(F, dtype=bool)
    for c in range(C):
        for f in range(S):
            node = data.poses[c][f]
            if node is None:
                continue
            W, _ = node
            pose_valid[c * S + f] = True
            rv = np.asarray(so3.log(jnp.asarray(W[:3, :3])))
            pose_r[c * S + f] = rv
            pose_t[c * S + f] = W[:3, 3]

    # landmarks active up to the step limit
    P_n = len(data.points3D)
    point_valid = np.zeros(P_n, dtype=bool)
    for s in range(S):
        for idx in data.point3D_added_idxs[s]:
            if idx < P_n:
                point_valid[idx] = True
    points = np.asarray(data.points3D, dtype=np.float64)

    # projection factors
    obs_uv, obs_pose, obs_cam, obs_point, obs_sigma = [], [], [], [], []
    for c in range(C):
        sig = data.point2D_noise[c]
        sigma_px = float(sig.sigmas[0])
        for s in range(min(S, len(data.point2D3D_assocs[c]))):
            for (f_idx, p2d, p3d) in data.point2D3D_assocs[c][s]:
                f_idx, p2d, p3d = int(f_idx), int(p2d), int(p3d)
                if f_idx >= S or not pose_valid[c * S + f_idx]:
                    continue
                if p3d >= P_n or not point_valid[p3d]:
                    continue
                obs_uv.append(data.points2D[c][f_idx][p2d])
                obs_pose.append(c * S + f_idx)
                obs_cam.append(c)
                obs_point.append(p3d)
                obs_sigma.append(sigma_px)

    # odometry factors
    odo_r, odo_t, odo_from, odo_to, odo_sigma = [], [], [], [], []
    for s in range(min(S, len(data.odometry_assocs))):
        for k, (fc, ff, tc, tf) in enumerate(data.odometry_assocs[s]):
            if ff >= S or tf >= S:
                continue
            if not (pose_valid[fc * S + ff] and pose_valid[tc * S + tf]):
                continue
            M = data.odometry[s][k]
            rv = np.asarray(so3.log(jnp.asarray(M[:3, :3])))
            odo_r.append(rv)
            odo_t.append(M[:3, 3])
            odo_from.append(fc * S + ff)
            odo_to.append(tc * S + tf)
            nm = data.odometry_noise[fc][tc]
            odo_sigma.append(np.asarray(nm.sigmas, dtype=np.float64)
                             if nm is not None else np.ones(6))

    # priors: each camera's first valid pose (bundle_adjust.cpp:268-275)
    pp_idx, pp_r, pp_t, pp_sig = [], [], [], []
    for c in range(C):
        for f in range(S):
            if pose_valid[c * S + f]:
                pp_idx.append(c * S + f)
                pp_r.append(pose_r[c * S + f])
                pp_t.append(pose_t[c * S + f])
                pp_sig.append(np.asarray(data.pose_noise[c].sigmas,
                                         dtype=np.float64))
                break
    # first landmark batch priors (bundle_adjust.cpp:276-282)
    pq_idx, pq_xyz, pq_sig = [], [], []
    first_batch = data.point3D_added_idxs[0] if S > 0 else []
    for idx in first_batch:
        if idx < P_n:
            pq_idx.append(idx)
            pq_xyz.append(points[idx])
            pq_sig.append(float(data.point3D_noise.sigmas[0]))

    O = _round_up(max(len(obs_uv), 1), pad_multiple)
    Q = _round_up(max(len(odo_r), 1), pad_multiple)
    Rp = max(len(pp_idx), 1)
    Rq = _round_up(max(len(pq_idx), 1), pad_multiple)

    f32 = jnp.float32
    prob = BAProblem(
        init=BAVariables(
            pose_r=jnp.asarray(pose_r, f32),
            pose_t=jnp.asarray(pose_t, f32),
            points=jnp.asarray(points, f32)),
        pose_valid=jnp.asarray(pose_valid),
        point_valid=jnp.asarray(point_valid),
        calibrations=jnp.asarray(np.stack(data.calibrations), f32),
        obs_uv=jnp.asarray(_pad(np.asarray(obs_uv, np.float64).reshape(-1, 2),
                                O), f32),
        obs_pose=jnp.asarray(_pad(np.asarray(obs_pose, np.int32), O),
                             jnp.int32),
        obs_cam=jnp.asarray(_pad(np.asarray(obs_cam, np.int32), O),
                            jnp.int32),
        obs_point=jnp.asarray(_pad(np.asarray(obs_point, np.int32), O),
                              jnp.int32),
        obs_sigma=jnp.asarray(_pad(np.asarray(obs_sigma, np.float64), O,
                                   fill=1.0), f32),
        obs_valid=jnp.asarray(np.arange(O) < len(obs_uv)),
        odo_r=jnp.asarray(_pad(np.asarray(odo_r, np.float64).reshape(-1, 3),
                               Q), f32),
        odo_t=jnp.asarray(_pad(np.asarray(odo_t, np.float64).reshape(-1, 3),
                               Q), f32),
        odo_from=jnp.asarray(_pad(np.asarray(odo_from, np.int32), Q),
                             jnp.int32),
        odo_to=jnp.asarray(_pad(np.asarray(odo_to, np.int32), Q), jnp.int32),
        odo_sigma=jnp.asarray(_pad(np.asarray(odo_sigma,
                                              np.float64).reshape(-1, 6),
                                   Q, fill=1.0), f32),
        odo_valid=jnp.asarray(np.arange(Q) < len(odo_r)),
        prior_pose_idx=jnp.asarray(_pad(np.asarray(pp_idx, np.int32), Rp),
                                   jnp.int32),
        prior_pose_r=jnp.asarray(_pad(np.asarray(pp_r,
                                                 np.float64).reshape(-1, 3),
                                      Rp), f32),
        prior_pose_t=jnp.asarray(_pad(np.asarray(pp_t,
                                                 np.float64).reshape(-1, 3),
                                      Rp), f32),
        prior_pose_sigma=jnp.asarray(_pad(np.asarray(pp_sig,
                                                     np.float64
                                                     ).reshape(-1, 6),
                                          Rp, fill=1.0), f32),
        prior_pose_valid=jnp.asarray(np.arange(Rp) < len(pp_idx)),
        prior_point_idx=jnp.asarray(_pad(np.asarray(pq_idx, np.int32), Rq),
                                    jnp.int32),
        prior_point_xyz=jnp.asarray(_pad(np.asarray(pq_xyz,
                                                    np.float64
                                                    ).reshape(-1, 3), Rq),
                                    f32),
        prior_point_sigma=jnp.asarray(_pad(np.asarray(pq_sig, np.float64),
                                           Rq, fill=1.0), f32),
        prior_point_valid=jnp.asarray(np.arange(Rq) < len(pq_idx)),
    )
    return prob
