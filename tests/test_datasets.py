"""Dataset adapters."""

import os

import numpy as np
import pytest

from mqslam_tpu.datasets import icl_nuim, svo
from mqslam_tpu.io import tum

REF_ICL = "/root/reference/Work/SLAM/datasets/ICL_NUIM"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF_ICL),
                               reason="reference not mounted")


class TestIclNuim:
    def test_repair_quaternion_permutation(self):
        traj = tum.CamTrajectory(
            np.array([0.0]), np.array([[1.0, 2.0, 3.0]]),
            np.array([[0.1, 0.2, 0.3, 0.9]]) / np.linalg.norm(
                [0.1, 0.2, 0.3, 0.9]))
        out = icl_nuim.repair_cam_trajectory(traj, rebuild_timestamps=True,
                                             fps=30)
        np.testing.assert_allclose(out.locations[0], [1.0, 2.0, -3.0])
        q = traj.quaternions[0]
        np.testing.assert_allclose(out.quaternions[0],
                                   [q[3], q[2], q[1], -q[0]])
        np.testing.assert_allclose(out.timestamps[0], 1 / 30.0)

    def test_pov_parsing(self, tmp_path):
        # one synthetic render-command line with a known pose
        vals = {"00": 1.0, "01": 0.0, "02": 0.0,
                "10": 0.0, "11": 1.0, "12": 0.0,
                "20": 0.0, "21": 0.0, "22": 1.0,
                "30": 1.0, "31": 2.0, "32": 3.0}
        line = "povray +Ix.pov " + "".join(
            f"+ Declare=val{k}={v}+ " for k, v in vals.items())
        f = tmp_path / "cmds.sh"
        f.write_text(line + "\n")
        P = icl_nuim.load_cam_poses_pov(str(f))
        assert P.shape == (1, 4, 4)
        # cam-to-world was [I | (1,2,3)] -> extrinsic translation is -(1,2,3)
        np.testing.assert_allclose(P[0][:3, 3], [-1.0, -2.0, -3.0],
                                   atol=1e-12)

    def test_mirror_obj(self, tmp_path):
        fin = tmp_path / "a.obj"
        fin.write_text("v 1.0 2.0 3.0\nvn 0.5 0 0\nf 1 2 3\n")
        fout = tmp_path / "b.obj"
        icl_nuim.mirror_wavefront_obj(str(fin), str(fout))
        out = fout.read_text()
        assert "v -1.0 2.0 3.0" in out
        assert "vn -0.5 0 0" in out
        assert "f 1 2 3" in out


class TestSvoInit:
    def test_plane_initialization(self, rng):
        import jax.numpy as jnp
        from mqslam_tpu.core import camera as cam_mod
        from mqslam_tpu.frontend import synthetic

        tex = synthetic.make_texture(rng)
        P0 = np.eye(4)
        P0[2, 3] = 2.0  # camera 2 units above the z=0... (extrinsic z shift)
        imgs = synthetic.render_plane_sequence(P0[None], tex, size=(320, 240),
                                               f=280.0, plane_z=4.0)
        cal = cam_mod.Cal3DS2.from_array(jnp.asarray(
            [280.0, 280.0, 0, 160, 120, 0, 0, 0, 0], jnp.float32))
        uv, objp = svo.initialize_from_plane(imgs[0], P0, cal,
                                             target_features=60,
                                             plane_z=4.0)
        assert 40 <= len(uv) <= 60
        np.testing.assert_allclose(objp[:, 2], 4.0, atol=1e-5)
        # back-projected points reproject onto the original pixels
        proj, depth = cam_mod.project(jnp.asarray(objp),
                                      jnp.asarray(P0, jnp.float32), cal)
        np.testing.assert_allclose(np.asarray(proj), uv, atol=1e-2)
        assert np.all(np.asarray(depth) > 0)
