"""Checkpoint/resume: the resumed run is bit-identical to uninterrupted."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_frontend import make_sequence, init_from_frame0, CAL, CFG  # noqa

from mqslam_tpu.frontend.runner import run_frontend


class TestCheckpointResume:
    def test_resume_is_bit_identical(self, tmp_path):
        rng = np.random.RandomState(11)
        imgs, P_gt = make_sequence(rng, 16)
        uv0, objp0 = init_from_frame0(imgs[0], P_gt[0])
        ckpt = str(tmp_path / "ck.npz")

        full = run_frontend(imgs, CAL, CFG, uv0, objp0, fps=30.0,
                            collect_ba=True)

        # interrupted run: checkpoint at frame 8, discard the rest
        run_frontend(imgs[:9], CAL, CFG, uv0, objp0, fps=30.0,
                     collect_ba=True, checkpoint_every=8,
                     checkpoint_path=ckpt)
        assert os.path.exists(ckpt)

        resumed = run_frontend(imgs, CAL, CFG, uv0, objp0, fps=30.0,
                               collect_ba=True, resume_from=ckpt)

        assert resumed.accepted == full.accepted
        assert len(resumed.poses) == len(full.poses)
        for a, b in zip(resumed.poses, full.poses):
            if a is None or b is None:
                assert a is None and b is None
                continue
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(resumed.points3d, full.points3d)
        # BA bookkeeping identical too
        ra, fa = resumed.ba_data, full.ba_data
        assert ra.nr_steps == fa.nr_steps
        for s in range(fa.nr_steps):
            np.testing.assert_array_equal(ra.points2D[0][s],
                                          fa.points2D[0][s])
            np.testing.assert_array_equal(ra.point2D3D_assocs[0][s],
                                          fa.point2D3D_assocs[0][s])

    def test_resume_rejects_loop_closure(self, tmp_path):
        rng = np.random.RandomState(11)
        imgs, P_gt = make_sequence(rng, 4)
        uv0, objp0 = init_from_frame0(imgs[0], P_gt[0])
        with pytest.raises(ValueError):
            run_frontend(imgs, CAL, CFG, uv0, objp0, loop_closure=True,
                         resume_from=str(tmp_path / "x.npz"))
