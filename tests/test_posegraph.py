"""Pose-graph optimization + loop-closure pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.ndimage as ndi

from mqslam_tpu.core import so3
from mqslam_tpu.ba import posegraph as pg
from mqslam_tpu.frontend import loopclosure as lc
from mqslam_tpu.ops import orb


def _circle_poses(n, radius=5.0):
    """Ground-truth cam-to-world poses on a circle, camera yawing along."""
    poses = np.zeros((n, 6), np.float32)
    for i in range(n):
        a = 2 * np.pi * i / n
        R = np.array([[np.cos(a), 0, np.sin(a)],
                      [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]])
        c = np.array([radius * np.sin(a), 0.0, radius * (1 - np.cos(a))])
        poses[i, :3] = np.asarray(so3.log(jnp.asarray(R, jnp.float32)))
        poses[i, 3:] = c
    return poses


def _between(pose_i, pose_j):
    Ri = np.asarray(so3.exp(jnp.asarray(pose_i[:3])))
    Rj = np.asarray(so3.exp(jnp.asarray(pose_j[:3])))
    meas_r = np.asarray(so3.log(jnp.asarray(Ri.T @ Rj, jnp.float32)))
    meas_t = Ri.T @ (pose_j[3:] - pose_i[3:])
    return meas_r.astype(np.float32), meas_t.astype(np.float32)


def _build_graph(n=40, odo_noise=0.02, seed=0, loop=True):
    """Odometry chain with drift + one loop-closure edge back to pose 0."""
    rng = np.random.RandomState(seed)
    gt = _circle_poses(n)
    E = n - 1 + (1 if loop else 0)
    ei = np.zeros(E, np.int32)
    ej = np.zeros(E, np.int32)
    mr = np.zeros((E, 3), np.float32)
    mt = np.zeros((E, 3), np.float32)
    # noisy odometry, integrated for the initial guess (drift)
    init = gt.copy()
    init[0] = gt[0]
    for k in range(n - 1):
        r, t = _between(gt[k], gt[k + 1])
        r = r + rng.normal(0, odo_noise, 3).astype(np.float32)
        t = t + rng.normal(0, odo_noise * 5, 3).astype(np.float32)
        ei[k], ej[k], mr[k], mt[k] = k, k + 1, r, t
        # integrate the NOISY measurement for the initial trajectory
        Rk = np.asarray(so3.exp(jnp.asarray(init[k, :3])))
        Rn = Rk @ np.asarray(so3.exp(jnp.asarray(r)))
        cn = init[k, 3:] + Rk @ t
        init[k + 1, :3] = np.asarray(so3.log(jnp.asarray(
            Rn.astype(np.float32))))
        init[k + 1, 3:] = cn
    inv_sig = np.tile(np.array([1 / 0.02] * 3 + [1 / 0.1] * 3,
                               np.float32), (E, 1))
    if loop:
        r, t = _between(gt[n - 1], gt[0])
        ei[-1], ej[-1], mr[-1], mt[-1] = n - 1, 0, r, t
        inv_sig[-1] = [1 / 0.005] * 3 + [1 / 0.02] * 3
    prior_mask = np.zeros(n, bool)
    prior_mask[0] = True
    prior_r = np.zeros((n, 3), np.float32)
    prior_t = np.zeros((n, 3), np.float32)
    prior_r[0], prior_t[0] = gt[0, :3], gt[0, 3:]
    g = pg.PoseGraph(
        poses=jnp.asarray(init), pose_valid=jnp.ones(n, bool),
        edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
        edge_meas_r=jnp.asarray(mr), edge_meas_t=jnp.asarray(mt),
        edge_inv_sigma=jnp.asarray(inv_sig),
        edge_valid=jnp.ones(E, bool),
        prior_mask=jnp.asarray(prior_mask),
        prior_r=jnp.asarray(prior_r), prior_t=jnp.asarray(prior_t),
        prior_inv_sigma=jnp.tile(jnp.asarray(
            [1 / 1e-3] * 6, jnp.float32), (n, 1)))
    return g, gt, init


class TestPoseGraph:
    def test_loop_closure_removes_drift(self):
        g, gt, init = _build_graph(n=40, odo_noise=0.02, loop=True)
        drift0 = np.linalg.norm(init[:, 3:] - gt[:, 3:], axis=1)
        poses, cost, _ = jax.block_until_ready(pg.pgo_solve(g, iters=25))
        poses = np.asarray(poses)
        err = np.linalg.norm(poses[:, 3:] - gt[:, 3:], axis=1)
        # optimized trajectory beats the drifted odometry integration
        assert err.max() < 0.5 * drift0.max(), (err.max(), drift0.max())
        assert float(cost) < float(pg.pgo_cost(g))

    def test_perfect_measurements_exact(self):
        g, gt, _ = _build_graph(n=20, odo_noise=0.0, loop=True)
        poses, cost, _ = pg.pgo_solve(g, iters=15)
        err = np.linalg.norm(np.asarray(poses)[:, 3:] - gt[:, 3:], axis=1)
        assert err.max() < 1e-3, err.max()

    def test_invalid_edges_and_poses_masked(self):
        g, gt, _ = _build_graph(n=10, odo_noise=0.01, loop=False)
        # append garbage edges, masked out
        g = g._replace(
            edge_i=jnp.concatenate([g.edge_i, jnp.asarray([0, 1])]),
            edge_j=jnp.concatenate([g.edge_j, jnp.asarray([5, 7])]),
            edge_meas_r=jnp.concatenate([g.edge_meas_r,
                                         jnp.full((2, 3), 99.0)]),
            edge_meas_t=jnp.concatenate([g.edge_meas_t,
                                         jnp.full((2, 3), 99.0)]),
            edge_inv_sigma=jnp.concatenate([g.edge_inv_sigma,
                                            jnp.ones((2, 6))]),
            edge_valid=jnp.concatenate([g.edge_valid,
                                        jnp.zeros(2, bool)]))
        poses, cost, _ = pg.pgo_solve(g, iters=10)
        assert np.isfinite(float(cost))
        err = np.linalg.norm(np.asarray(poses)[:, 3:] - gt[:, 3:], axis=1)
        assert err.max() < 1.0


class TestLoopClosure:
    def _scene(self, seed=2):
        rng = np.random.RandomState(seed)
        img = ndi.gaussian_filter(rng.rand(240, 320), 1.5)
        img = ((img - img.min()) / np.ptp(img) * 255).astype(np.float32)
        return img

    def test_db_retrieval_and_gating(self):
        imgs = [self._scene(s) for s in (1, 2, 3, 1)]  # last revisits first
        K = 128
        db = lc.empty_db(capacity=8, k=K)
        descs = []
        for im in imgs:
            uv, desc, score, theta, valid = orb.orb_features(
                jnp.asarray(im), max_corners=K, threshold=4.0)
            descs.append((uv, desc, valid))
            db = lc.add_keyframe(
                db, desc, valid, uv, jnp.zeros((K, 3)),
                jnp.zeros(K, bool), jnp.zeros(6))
        assert int(db.count) == 4
        uv, desc, valid = descs[3]
        scores, i1, good = lc.loop_scores(db, desc, valid,
                                          cur_index=jnp.int32(3),
                                          min_gap=2)
        scores = np.asarray(scores)
        # recency window: keyframes 2,3 ineligible
        assert scores[2] == 0 and scores[3] == 0
        # the revisited place wins
        assert scores.argmax() == 0 and scores[0] > scores[1] * 2
        cand, found = lc.best_candidate(jnp.asarray(scores),
                                        min_matches=20)
        assert int(cand) == 0 and bool(found)

    def test_verify_and_edge(self):
        """Full metric loop: landmarks on a plane, revisit -> PnP edge."""
        from mqslam_tpu.core import camera as cam_mod
        from mqslam_tpu.frontend import synthetic

        rng = np.random.RandomState(4)
        tex = synthetic.make_texture(rng)
        f, size, plane_z = 300.0, (320, 240), 4.0
        cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
            [f, f, 0, size[0] / 2, size[1] / 2, 0, 0, 0, 0], jnp.float32))
        P0 = np.eye(4)
        # a slightly moved revisit pose
        Pq = np.eye(4)
        Pq[:3, 3] = [-0.1, 0.05, 0.15]
        imgs = synthetic.render_plane_sequence(
            np.stack([P0, Pq]), tex, size=size, f=f, plane_z=plane_z)
        K = 128
        uv0, desc0, _, _, v0 = orb.orb_features(jnp.asarray(imgs[0]),
                                                max_corners=K,
                                                threshold=4.0)
        xyz0 = synthetic.backproject_to_plane(
            np.asarray(uv0), P0, f, (size[0] / 2, size[1] / 2), plane_z)
        db = lc.empty_db(capacity=4, k=K)
        pose0 = jnp.zeros(6)  # identity, center origin
        db = lc.add_keyframe(db, desc0, v0, uv0, jnp.asarray(
            xyz0.astype(np.float32)), v0, pose0)
        uvq, descq, _, _, vq = orb.orb_features(jnp.asarray(imgs[1]),
                                                max_corners=K,
                                                threshold=4.0)
        scores, i1, good = lc.loop_scores(db, descq, vq,
                                          cur_index=jnp.int32(10),
                                          min_gap=2)
        cand, found = lc.best_candidate(scores, min_matches=15)
        assert bool(found) and int(cand) == 0
        rvec, tvec, n_inl, ok = lc.verify_loop(
            db, cand, i1, good, uvq, vq, cal, jax.random.PRNGKey(0))
        assert bool(ok), int(n_inl)
        # recovered pose matches the ground-truth query pose
        meas_r, meas_t = lc.relative_edge(db.pose[cand], rvec, tvec)
        # ground truth: R rel = I, c_q = -R^T t of Pq (w2c [R|t], t=[-.1,...])
        cq_gt = -(Pq[:3, :3].T @ Pq[:3, 3])
        assert np.linalg.norm(np.asarray(meas_t) - cq_gt) < 0.05
        assert np.linalg.norm(np.asarray(meas_r)) < 0.02


class TestRunnerLoopClosure:
    def test_e2e_loop_closure_pipeline(self):
        """Out-and-back synthetic sequence: the revisit fires a verified
        loop edge and the PGO correction keeps/improves the trajectory."""
        import jax
        from mqslam_tpu.core import camera as cam_mod
        from mqslam_tpu.frontend import runner, synthetic
        from mqslam_tpu.frontend import tracker as trk
        from mqslam_tpu.ops import features

        rng = np.random.RandomState(7)
        tex = synthetic.make_texture(rng)
        f, size, plane_z = 400.0, (320, 240), 4.0
        n_out = 12
        P_list = []
        offs = list(np.linspace(0, 0.9, n_out)) + \
            list(np.linspace(0.9, 0.0, n_out))
        for i, ox in enumerate(offs):
            P = np.eye(4)
            P[:3, 3] = [-ox, 0.02 * np.sin(i), 0.0]
            P_list.append(P)
        P_list = np.stack(P_list)
        imgs = synthetic.render_plane_sequence(P_list, tex, size=size,
                                               f=f, plane_z=plane_z)
        cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
            [f, f, 0, size[0] / 2, size[1] / 2, 0, 0, 0, 0], jnp.float32))
        config = trk.TrackerConfig(max_tracks=256, target_keypoints=200)
        uv, valid = features.detect_corners(jnp.asarray(imgs[0]),
                                            max_corners=128, cell=12)
        uv = np.asarray(uv)[np.asarray(valid)][:96]
        objp = synthetic.backproject_to_plane(
            uv, P_list[0], f, (size[0] / 2, size[1] / 2), plane_z)
        res = runner.run_frontend(
            imgs, cal, config, uv.astype(np.float32),
            objp.astype(np.float32), collect_ba=False, loop_closure=True,
            loop_min_gap=2, loop_min_matches=15)
        assert res.n_keyframes >= 4
        assert len(res.loop_edges) >= 1, "no loop closure fired"
        # corrected trajectory still matches ground truth
        errs = []
        for i, P in enumerate(res.poses):
            if P is None:
                continue
            Cg = -(P_list[i][:3, :3].T @ P_list[i][:3, 3])
            errs.append(np.linalg.norm(P[:3, 3] - Cg))
        assert np.sqrt(np.mean(np.square(errs))) < 0.05, \
            np.sqrt(np.mean(np.square(errs)))
