"""The headless calibration CLI (cli/calibrate.py) end-to-end on rendered
boards: intrinsics -> save -> undistort -> per-frame pose."""

import os
import sys

import numpy as np
import cv2
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_chessboard import render_board  # noqa

from mqslam_tpu.cli import calibrate as cal_cli
from mqslam_tpu.io import intrinsics as iio

COLS, ROWS = 7, 6
K_GT = np.array([[560.0, 0, 320.0], [0, 540.0, 240.0], [0, 0, 1.0]])


def _render_views(n, seed=3, sq=40):
    board, off = render_board(COLS, ROWS, sq)
    rng = np.random.RandomState(seed)
    views = []
    for _ in range(n):
        rvec = np.array([0.25 * rng.randn(), 0.25 * rng.randn(),
                         0.1 * rng.randn()])
        tvec = np.array([-3.0 + 0.5 * rng.randn(),
                         -2.5 + 0.5 * rng.randn(),
                         14.0 + 1.5 * rng.randn()])
        R = cv2.Rodrigues(rvec)[0]
        Hpi = K_GT @ np.column_stack([R[:, 0], R[:, 1], tvec])
        A = np.array([[0, 1.0 / sq, -off / sq],
                      [1.0 / sq, 0, -off / sq], [0, 0, 1.0]])
        canvas = np.full((480, 640), 128, np.uint8)
        img = cv2.warpPerspective(board, Hpi @ A, (640, 480),
                                  borderMode=cv2.BORDER_TRANSPARENT,
                                  dst=canvas)
        views.append(cv2.GaussianBlur(img, (3, 3), 0.8))
    return views


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("boards")
    from mqslam_tpu.viz.painter import save_png
    for i, v in enumerate(_render_views(6)):
        save_png(str(d / f"view_{i:02d}.png"), v)
    return str(d)


class TestCalibrateCLI:
    def test_intrinsics_roundtrip(self, img_dir, tmp_path):
        out = str(tmp_path / "camera_intrinsics.txt")
        rc = cal_cli.main(["intrinsics", img_dir, f"{COLS}x{ROWS}",
                           "-o", out])
        assert rc == 0
        K, dist, size = iio.load_camera_intrinsics(out)
        np.testing.assert_allclose(K[0, 0], K_GT[0, 0], rtol=0.01)
        np.testing.assert_allclose(K[1, 1], K_GT[1, 1], rtol=0.01)
        assert tuple(size) == (640, 480)

        # undistort consumes the file we just wrote
        img_path = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        und = str(tmp_path / "und.png")
        rc = cal_cli.main(["undistort", out, img_path, "-o", und])
        assert rc == 0 and os.path.exists(und)

        # per-frame pose + snapshots
        snaps = str(tmp_path / "snaps")
        rc = cal_cli.main(["pose", img_dir, f"{COLS}x{ROWS}", out,
                           "-o", snaps])
        assert rc == 0
        assert len([f for f in os.listdir(snaps)
                    if f.endswith(".txt")]) >= 4

    def test_pose_matches_ground_truth_board_distance(self, img_dir,
                                                      tmp_path):
        from mqslam_tpu.calib import realtime as rt
        from mqslam_tpu.io import images
        p = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
        img = np.asarray(images.load_image_gray(p))
        ok, rvec, tvec, overlay = rt.pose_from_chessboard_frame(
            img, (COLS, ROWS), K_GT, None)
        assert ok
        # rendered boards sit ~11-17 units from the camera
        assert 8.0 < np.linalg.norm(tvec) < 25.0
        assert overlay is not None and overlay.shape == (480, 640, 3)
