"""Two-agent collaborative SLAM demo (BASELINE config #4).

Two cameras fly different trajectories over the same scene; each runs the
front-end independently (tracking drift accumulates per agent), the
per-agent BA dumps are merged into ONE 2-camera factor graph with
cross-agent between factors at rendezvous frames (the reference's 2-robot
graph shape: GenerateData.hpp:256-269 cross-camera odometry,
bundle_adjust.cpp:300-309), and joint bundle adjustment solves the shared
graph sharded over every available device (shard_map + psum assembly,
mqslam_tpu.parallel). Per-agent ATE: front-end -> independent BA -> joint
BA must improve monotonically.

Synthetic by construction (no dataset needed): run as
``python -m mqslam_tpu.cli.collab_demo``.
"""

import sys

import numpy as np


def run(n_frames=32, size=(320, 240), f=280.0, plane_z=4.0, seed=7,
        rendezvous_every=4, verbose=True):
    import cv2
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from mqslam_tpu.core import camera as cam_mod, quat as quat_mod
    from mqslam_tpu.frontend import synthetic, tracker as trk
    from mqslam_tpu.frontend.runner import run_frontend
    from mqslam_tpu.multiagent import CrossOdometry, merge_agents
    from mqslam_tpu.parallel import sharded_lm_solve
    from mqslam_tpu.ba import problem as bp, solver as bs
    from mqslam_tpu.eval import ate as ate_mod
    from mqslam_tpu.io import tum
    from mqslam_tpu.ops import features

    rng = np.random.RandomState(seed)
    cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
        [f, f, 0.0, size[0] / 2, size[1] / 2, 0, 0, 0, 0], jnp.float32))
    config = trk.TrackerConfig(max_tracks=192, max_landmarks=2048,
                               target_keypoints=120, ransac_hypotheses=64)
    tex = synthetic.make_texture(rng)

    def traj(start, vel, yaw_rate):
        Ps = []
        for i in range(n_frames):
            frac = i / max(n_frames - 1, 1)
            R = cv2.Rodrigues(np.array([0.0, yaw_rate * frac, 0.0]))[0]
            c = np.asarray(start) + np.asarray(vel) * frac
            P = np.eye(4)
            P[:3, :3] = R
            P[:3, 3] = -R @ c
            Ps.append(P)
        return np.stack(Ps)

    # two overlapping trajectories over the same plane
    gt = [traj([0.0, 0.0, 0.0], [1.8, 0.2, 0.3], 0.09),
          traj([2.4, 0.15, 0.0], [-1.8, -0.1, 0.25], -0.1)]

    datas, results = [], []
    for a in range(2):
        imgs = synthetic.render_plane_sequence(gt[a], tex, size=size, f=f,
                                               plane_z=plane_z)
        uv, valid = features.detect_corners(jnp.asarray(imgs[0]),
                                            max_corners=100, cell=14)
        uv = np.asarray(uv)[np.asarray(valid)][:80]
        objp = synthetic.backproject_to_plane(
            uv, gt[a][0], f, (size[0] / 2, size[1] / 2), plane_z=plane_z)
        res = run_frontend(imgs, cal, config, uv.astype(np.float32),
                           objp.astype(np.float32), fps=30.0,
                           collect_ba=True, seed=seed + a)
        datas.append(res.ba_data)
        results.append(res)
        if verbose:
            print(f"agent {a}: {sum(1 for x in res.accepted if x > 0)}"
                  f"/{len(res.accepted)} frames, "
                  f"{res.n_keyframes} keyframes")

    # rendezvous cross-factors: relative pose between the agents measured
    # at every k-th frame (ground truth + noise, as GenerateData.hpp does)
    cross = []
    for fidx in range(0, n_frames, rendezvous_every):
        Wa = np.linalg.inv(gt[0][fidx])
        Wb = np.linalg.inv(gt[1][fidx])
        meas = np.linalg.inv(Wa) @ Wb
        dr = 0.001 * rng.randn(3)
        dt = 0.002 * rng.randn(3)
        D = np.eye(4)
        D[:3, :3] = cv2.Rodrigues(dr)[0]
        D[:3, 3] = dt
        cross.append(CrossOdometry(
            step=fidx, from_agent=0, from_frame=fidx, to_agent=1,
            to_frame=fidx, measured=meas @ D,
            sigmas=np.array([0.002] * 3 + [0.004] * 3)))

    merged = merge_agents(datas, cross_odometry=cross)
    prob = bp.problem_from_ba_data(merged)

    devices = jax.devices()
    mesh = Mesh(np.array(devices).reshape(len(devices)), ("data",))
    v_joint, hist = sharded_lm_solve(prob, mesh, max_iters=25, cg_iters=400)
    if verbose:
        print(f"joint BA over {len(devices)} devices: cost "
              f"{hist[0]:.4e} -> {hist[-1]:.4e}")

    # independent per-agent BA (no cross factors)
    v_indep = []
    for a in range(2):
        pa = bp.problem_from_ba_data(datas[a])
        va, _ = bs.lm_solve(pa, max_iters=25, cg_iters=400)
        v_indep.append(va)

    # per-agent ATE for the three stages
    from mqslam_tpu.core import so3

    def traj_from_vars(v, cam, S, data):
        valid, ts, locs, quats = [], [], [], []
        for fr in range(S):
            node = data.poses[cam][fr] if fr < len(data.poses[cam]) else None
            if node is None:
                continue
            idx = cam * S + fr
            R = np.asarray(so3.exp(jnp.asarray(
                np.asarray(v.pose_r)[idx], jnp.float32)))
            ts.append(node[1])
            locs.append(np.asarray(v.pose_t)[idx])
            quats.append(np.asarray(quat_mod.from_matrix(jnp.asarray(R))))
        return tum.CamTrajectory(np.asarray(ts),
                                 np.asarray(locs).reshape(-1, 3),
                                 np.asarray(quats).reshape(-1, 4))

    def gt_traj(a):
        ts = np.arange(n_frames) / 30.0
        W = np.linalg.inv(gt[a])
        from mqslam_tpu.io.nputil import matrix_to_quat_np
        q = np.stack([matrix_to_quat_np(w[:3, :3]) for w in W])
        return tum.CamTrajectory(ts, W[:, :3, 3], q)

    S = merged.nr_steps
    table = {}
    for a in range(2):
        g = gt_traj(a)
        fe = ate_mod.evaluate_ate(results[a].trajectory, g,
                                  max_difference=1e-3).rmse
        ind = ate_mod.evaluate_ate(
            traj_from_vars(v_indep[a], 0, datas[a].nr_steps, datas[a]), g,
            max_difference=1e-3).rmse
        joint = ate_mod.evaluate_ate(
            traj_from_vars(v_joint, a, S, merged), g,
            max_difference=1e-3).rmse
        table[a] = (fe, ind, joint)
        if verbose:
            print(f"agent {a} ATE: front-end {fe:.4f} m | independent BA "
                  f"{ind:.4f} m | joint BA {joint:.4f} m")
    return table


def main(argv=None):
    table = run()
    mean_fe = np.mean([v[0] for v in table.values()])
    mean_joint = np.mean([v[2] for v in table.values()])
    print(f"mean ATE: front-end {mean_fe:.4f} m -> joint BA "
          f"{mean_joint:.4f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
