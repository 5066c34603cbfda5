"""End-to-end front-end on a synthetic textured-plane sequence (config #2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mqslam_tpu.core import camera as cam_mod, se3
from mqslam_tpu.frontend import synthetic, tracker as trk
from mqslam_tpu.frontend.runner import run_frontend
from mqslam_tpu.eval import ate
from mqslam_tpu.io import tum
from mqslam_tpu.ops import features

F = 280.0
SIZE = (320, 240)
PLANE_Z = 4.0
CAL = cam_mod.Cal3DS2.from_array(jnp.asarray(
    [F, F, 0.0, SIZE[0] / 2, SIZE[1] / 2, 0, 0, 0, 0], jnp.float32))

CFG = trk.TrackerConfig(max_tracks=192, max_landmarks=2048,
                        target_keypoints=120, ransac_hypotheses=64)


def make_sequence(rng, n_frames=16):
    """Sideways + slight forward/rotating camera over the textured plane."""
    tex = synthetic.make_texture(rng)
    P_list = []
    for i in range(n_frames):
        frac = i / max(n_frames - 1, 1)
        rvec = np.array([0.0, 0.04 * frac, 0.0])
        center = np.array([0.9 * frac, 0.12 * frac, 0.15 * frac])
        import cv2
        R = cv2.Rodrigues(rvec)[0]
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = -R @ center
        P_list.append(P)
    P_list = np.stack(P_list)
    imgs = synthetic.render_plane_sequence(P_list, tex, size=SIZE, f=F,
                                           plane_z=PLANE_Z)
    return imgs, P_list


@pytest.fixture(scope="module")
def sequence():
    rng = np.random.RandomState(7)
    return make_sequence(rng)


def init_from_frame0(img0, P0):
    uv, valid = features.detect_corners(
        jnp.asarray(img0), max_corners=100, cell=14)
    uv = np.asarray(uv)[np.asarray(valid)][:80]
    objp = synthetic.backproject_to_plane(
        uv, P0, F, (SIZE[0] / 2, SIZE[1] / 2), plane_z=PLANE_Z)
    return uv.astype(np.float32), objp.astype(np.float32)


class TestFrontendEndToEnd:
    def test_tracks_synthetic_sequence(self, sequence):
        imgs, P_gt = sequence
        uv0, objp0 = init_from_frame0(imgs[0], P_gt[0])
        res = run_frontend(imgs, CAL, CFG, uv0, objp0, fps=30.0,
                           collect_ba=True)
        acc = np.array(res.accepted)
        # no rejected frames on this clean sequence; several keyframes
        assert (acc == 0).sum() == 0, acc
        assert res.n_keyframes >= 2, acc

        # trajectory accuracy vs ground truth (same scale: metric init)
        ts = np.arange(len(P_gt)) / 30.0
        import jax.numpy as jnp2
        q_gt, c_gt = se3.to_pose_tum(jnp2.asarray(P_gt))
        gt = tum.CamTrajectory(ts, np.asarray(c_gt), np.asarray(q_gt))
        result = ate.evaluate_ate(res.trajectory, gt, max_difference=1e-3)
        assert result.n_pairs == len(P_gt)
        assert result.rmse < 0.02, result  # 2 cm on a ~1 m trajectory

        # landmarks lie on the plane
        pts = res.points3d
        assert len(pts) >= len(uv0)
        on_plane = np.abs(pts[:, 2] - PLANE_Z) < 0.15
        assert on_plane.mean() > 0.9

        # BA export structure is consistent
        ba = res.ba_data
        assert ba.nr_steps == len(imgs)
        added = [i for s in ba.point3D_added_idxs for i in s]
        assert len(added) == len(set(added))
        for step_idx, assocs in enumerate(ba.point2D3D_assocs[0]):
            for (f_idx, p2d, p3d) in assocs:
                assert f_idx <= step_idx  # no future refs (IO.hpp:139)
                assert p2d < len(ba.points2D[0][f_idx])
                assert p3d < len(ba.points3D)

    def test_ba_roundtrip_through_wire_format(self, sequence, tmp_path):
        imgs, P_gt = sequence
        uv0, objp0 = init_from_frame0(imgs[0], P_gt[0])
        res = run_frontend(imgs[:8], CAL, CFG, uv0, objp0, fps=30.0)
        from mqslam_tpu.io import ba_info as ba_io
        ba_io.save_ba_data(str(tmp_path), "mqslam", res.ba_data,
                           timestamps=None)
        back = ba_io.load_ba_data(str(tmp_path), "mqslam", nr_cameras=1,
                                  fps=30)
        assert back.nr_steps == res.ba_data.nr_steps
        np.testing.assert_allclose(back.points3D, res.ba_data.points3D,
                                   atol=1e-5)


class TestMultiAgentRunner:
    def test_atlas_matches_per_agent_scan(self):
        """The atlas multi-agent runner reproduces the single-agent scan
        runner's trajectories for each agent (same kernels, shared image)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from mqslam_tpu.core import camera as cam_mod
        from mqslam_tpu.frontend import synthetic, tracker as trk
        from mqslam_tpu.ops import features

        f, size, plane_z = 300.0, (320, 240), 4.0
        cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
            [f, f, 0, size[0] / 2, size[1] / 2, 0, 0, 0, 0], jnp.float32))
        config = trk.TrackerConfig(max_tracks=128, target_keypoints=100)

        states, img_stacks, scan_results = [], [], []
        run1 = trk.make_scan_runner(cal, config)
        for a, seed in enumerate((3, 9)):
            rng = np.random.RandomState(seed)
            tex = synthetic.make_texture(rng)
            P_list = []
            for i in range(7):
                P = np.eye(4)
                P[:3, 3] = [-0.06 * i, 0.02 * i * (a + 1), 0.0]
                P_list.append(P)
            imgs = synthetic.render_plane_sequence(
                np.stack(P_list), tex, size=size, f=f, plane_z=plane_z)
            uv, valid = features.detect_corners(jnp.asarray(imgs[0]),
                                                max_corners=96, cell=12)
            uv = np.asarray(uv)[np.asarray(valid)][:64]
            objp = synthetic.backproject_to_plane(
                uv, P_list[0], f, (size[0] / 2, size[1] / 2), plane_z)
            st = trk.bootstrap(uv.astype(np.float32),
                               objp.astype(np.float32), cal, imgs[0],
                               config, jax.random.PRNGKey(10 + a))
            states.append(st)
            img_stacks.append(imgs)
            scan_results.append(jax.block_until_ready(
                run1(st, jnp.asarray(imgs))))

        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states)
        imgs_a = jnp.asarray(np.stack(img_stacks))
        run_ma = trk.make_multi_agent_runner(cal, config)
        _, (acc, rvecs, tvecs) = jax.block_until_ready(
            run_ma(stacked, imgs_a))
        acc = np.asarray(acc)          # [T, A]
        for a in range(2):
            _, (acc1, r1, t1) = scan_results[a]
            assert np.array_equal(acc[:, a], np.asarray(acc1)), a
            # poses agree to float tolerance (identical arithmetic modulo
            # atlas layout)
            np.testing.assert_allclose(np.asarray(tvecs)[:, a],
                                       np.asarray(t1), atol=2e-3)
