"""Offline bundle adjustment over a BA_info dump — the bundle_adjust CLI.

Argument surface mirrors the reference back-end
(reference: Work/SLAM/tools/bundle_adjustment/bundle_adjust.cpp:454-533):

  ba_run <baseDir> <baseName> <nrCameras> <fps> [useOdometry
         [fullOptimizeAtSecondPoints3DBatch [startTime
         [firstFrameStartsAfterStartTime [mode [runFromGenerated]]]]]]

``mode`` replaces iSAM_version: 0 = full batch LM (the reference's
recommended path for real slam2 data, bundle_adjustment/ReadMe.txt),
1/2 = step-batched incremental (our iSAM-equivalent). Outputs
traj_out.camC-<baseName>-BA.txt and map_out-<baseName>-BA.pcd.
"""

import sys

import numpy as np


def run(base_dir, base_name, nr_cameras, fps, use_odometry=True,
        full_optimize_at_second_batch=True, start_time=0.0,
        first_frame_after=True, mode=0, run_from_generated=False,
        max_iters=60, cg_iters=1000, verbose=True):
    import jax.numpy as jnp
    from mqslam_tpu.ba import problem as bp, solver as bs, synthetic as bsyn
    from mqslam_tpu.ba import incremental as binc
    from mqslam_tpu.ba.validate import (validate_data_integrity,
                                        validate_sufficiently_constrained)
    from mqslam_tpu.io import ba_info, pcd, tum
    from mqslam_tpu.io.nputil import matrix_to_quat_np
    from mqslam_tpu.core import so3
    import jax

    if run_from_generated:
        data = bsyn.generate_cube_scenario(nr_cameras=nr_cameras)
    else:
        data = ba_info.load_ba_data(base_dir, base_name, nr_cameras, fps,
                                    start_time, first_frame_after)
    validate_data_integrity(data)
    validate_sufficiently_constrained(data, use_odometry)

    prob = bp.problem_from_ba_data(data)
    if not use_odometry:
        prob = prob._replace(odo_valid=jnp.zeros_like(prob.odo_valid))

    if mode == 0:
        v, hist = bs.lm_solve(prob, max_iters=max_iters, cg_iters=cg_iters,
                              verbose=verbose)
        # f64 finishing pass: the f32 LM converges to the f32 cost floor;
        # the last stretch of the valley is below that resolution
        # (ba/polish64.py; beats the GTSAM golden on the SVO dump)
        from mqslam_tpu.ba.polish64 import polish64
        v, hist64 = polish64(prob, v, max_iters=12, verbose=verbose)
        hist = hist + hist64[1:]
    else:
        v, hist = binc.incremental_solve(data, prob,
                                         use_odometry=use_odometry,
                                         verbose=verbose)
    if verbose:
        print(f"cost: {hist[0]:.4e} -> {hist[-1]:.4e} "
              f"({len(hist) - 1} accepted iterations)")

    # write outputs in the reference's -BA naming
    fn = ba_info.make_filenames(base_dir, base_name, nr_cameras)
    S = data.nr_steps
    pose_r = np.asarray(v.pose_r)
    pose_t = np.asarray(v.pose_t)
    valid = np.asarray(prob.pose_valid)
    for c in range(nr_cameras):
        ts, locs, quats = [], [], []
        for f in range(S):
            idx = c * S + f
            if not valid[idx]:
                continue
            node = data.poses[c][f]
            t_stamp = node[1] if node is not None else (
                start_time + (f + (1 if first_frame_after else 0))
                / max(fps, 1))
            R = np.asarray(so3.exp(jnp.asarray(pose_r[idx])))
            ts.append(t_stamp)
            locs.append(pose_t[idx])
            quats.append(matrix_to_quat_np(R))
        tum.save_trajectory(fn.trajectories_out[c], tum.CamTrajectory(
            np.asarray(ts), np.asarray(locs).reshape(-1, 3),
            np.asarray(quats).reshape(-1, 4)))
    pts = np.asarray(v.points)[:len(data.points3D)]
    colors = None
    if data.point_colors is not None:
        colors = np.ascontiguousarray(
            np.asarray(data.point_colors, np.float32)).view(
            np.uint8).reshape(-1, 4)
    pcd.save_pcd(fn.map_out, pts, colors)
    if verbose:
        print(f"wrote {fn.map_out} and "
              f"{', '.join(fn.trajectories_out)}")
    return v, hist


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 4:
        print(__doc__)
        return 1
    base_dir, base_name = argv[0], argv[1]
    nr_cameras, fps = int(argv[2]), int(argv[3])
    opt = {"use_odometry": True, "full_optimize_at_second_batch": True,
           "start_time": 0.0, "first_frame_after": True, "mode": 0,
           "run_from_generated": False}
    keys = list(opt.keys())
    for i, raw in enumerate(argv[4:]):
        if i >= len(keys):
            break
        opt[keys[i]] = type(opt[keys[i]])(float(raw)) \
            if keys[i] == "start_time" else type(opt[keys[i]])(int(raw))
    run(base_dir, base_name, nr_cameras, fps, **opt)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
