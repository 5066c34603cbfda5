"""Chessboard detection / ordering / subpixel / image-based calibration.

Validates ops/chessboard against cv2.findChessboardCorners+cornerSubPix
(the pair the reference wraps in extractChessboardFeatures,
cv2_helpers.py:243-260) and calib.zhang.calibrate_camera_from_images
against the ground-truth intrinsics of rendered views.
"""

import numpy as np
import cv2
import pytest
import jax.numpy as jnp

from mqslam_tpu.ops import chessboard as cb
from mqslam_tpu.calib import zhang


def render_board(cols, rows, sq=40):
    """Board image with (cols, rows) INNER corners -> (cols+1, rows+1)
    squares, white border margin included."""
    m = sq  # margin
    h, w = (rows + 1) * sq + 2 * m, (cols + 1) * sq + 2 * m
    img = np.full((h, w), 255, np.uint8)
    for r in range(rows + 1):
        for c in range(cols + 1):
            if (r + c) % 2 == 0:
                img[m + r * sq:m + (r + 1) * sq,
                    m + c * sq:m + (c + 1) * sq] = 20
    return img, m + sq  # image, offset of first inner corner


def warp_view(board, quad_dst, out_size=(640, 480), blur=0.8):
    h, w = board.shape
    src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    H = cv2.getPerspectiveTransform(src, np.float32(quad_dst))
    canvas = np.full(out_size[::-1], 128, np.uint8)
    out = cv2.warpPerspective(board, H, out_size,
                              borderMode=cv2.BORDER_TRANSPARENT, dst=canvas)
    return cv2.GaussianBlur(out, (3, 3), blur), H


class TestDetector:
    @pytest.mark.parametrize("quad", [
        [[120, 80], [520, 110], [500, 400], [100, 380]],   # mild perspective
        [[80, 120], [560, 60], [580, 420], [60, 360]],     # stronger
    ])
    def test_matches_cv2(self, quad):
        cols, rows = 7, 6
        board, _ = render_board(cols, rows)
        img, _ = warp_view(board, quad)
        ok_cv, c_cv = cv2.findChessboardCorners(img, (cols, rows))
        assert ok_cv
        c_cv = cv2.cornerSubPix(
            img, c_cv, (5, 5), (-1, -1),
            (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30,
             0.001)).reshape(-1, 2)
        ok, c = cb.find_chessboard_corners(img.astype(np.float32),
                                           (cols, rows))
        assert ok
        # ordering matches up to the inherent 180-degree ambiguity
        d = min(np.abs(c - c_cv).max(), np.abs(c[::-1] - c_cv).max())
        assert d < 0.25, d

    def test_rotated_board(self):
        """~90-degree rotated board still orders into a valid grid."""
        cols, rows = 7, 5
        board, _ = render_board(cols, rows)
        M = cv2.getRotationMatrix2D((board.shape[1] / 2,
                                     board.shape[0] / 2), 84, 0.8)
        M[:, 2] += [100, 40]
        img = cv2.warpAffine(board, M, (640, 480), borderValue=128)
        img = cv2.GaussianBlur(img, (3, 3), 0.8)
        ok, c = cb.find_chessboard_corners(img.astype(np.float32),
                                           (cols, rows))
        assert ok
        grid = c.reshape(rows, cols, 2)
        # rows/cols are straight lines: collinearity residual tiny
        for r in range(rows):
            seg = grid[r]
            d = seg[1:] - seg[:-1]
            ang = np.arctan2(d[:, 1], d[:, 0])
            assert np.abs(np.unwrap(ang) - ang.mean()).max() < 0.05

    def test_missing_board_fails(self):
        rng = np.random.RandomState(0)
        img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
        ok, _ = cb.find_chessboard_corners(img, (7, 6))
        assert not ok

    def test_candidate_response_localized(self):
        cols, rows = 5, 4
        board, off = render_board(cols, rows)
        img = cv2.GaussianBlur(board, (3, 3), 0.8).astype(np.float32)
        uv, resp, valid = cb.detect_corner_candidates(jnp.asarray(img),
                                                      max_corners=cols * rows)
        assert bool(valid.all())
        gt = np.stack(np.meshgrid(off + 40 * np.arange(cols),
                                  off + 40 * np.arange(rows)),
                      -1).reshape(-1, 2)
        d = np.linalg.norm(np.asarray(uv)[:, None] - gt[None], axis=-1)
        assert d.min(axis=1).max() < 1.5  # every candidate near a corner
        assert d.min(axis=0).max() < 1.5  # every corner found


class TestSubpix:
    def test_converges_to_saddle(self):
        """Analytic saddle at known subpixel position."""
        gt = np.array([[100.3, 80.7], [200.6, 120.2], [321.9, 240.4]])
        ys, xs = np.mgrid[0:480, 0:640].astype(np.float64)
        img = np.zeros((480, 640), np.float32)
        # product-of-tanh saddle: smooth sign change in both axes
        for (cx, cy) in gt:
            img += 120 * (np.tanh((xs - cx) / 2)
                          * np.tanh((ys - cy) / 2)).astype(np.float32)
        img += 128
        start = gt + np.array([[1.2, -0.8], [-1.5, 0.9], [0.7, 1.3]])
        ref, ok = cb.corner_subpix(jnp.asarray(img),
                                   jnp.asarray(start, jnp.float32))
        assert bool(ok.all())
        assert np.abs(np.asarray(ref) - gt).max() < 0.05


class TestCalibrationFromImages:
    def test_recovers_intrinsics(self):
        """Render a 3D board through a known camera; calibrate from the raw
        images (detector included) and recover fx/fy/c within 1%."""
        cols, rows = 7, 6
        sq = 40
        board, off = render_board(cols, rows, sq)
        K_gt = np.array([[560.0, 0, 320.0], [0, 540.0, 240.0], [0, 0, 1.0]])
        # board plane points of the INNER corner grid, reference grid_objp
        # ordering (x = row index, y = col index)
        views = []
        rng = np.random.RandomState(3)
        for v in range(6):
            rvec = np.array([0.25 * rng.randn(), 0.25 * rng.randn(),
                             0.1 * rng.randn()])
            tvec = np.array([-3.0 + 0.5 * rng.randn(),
                             -2.5 + 0.5 * rng.randn(),
                             14.0 + 1.5 * rng.randn()])
            R = cv2.Rodrigues(rvec)[0]
            # homography board-image px -> camera px: board pixel (u, v)
            # corresponds to plane point (x=v/sq..., y=u/sq...) in grid
            # coords; plane->image H = K [r1 r2 t] with plane axes matching
            # grid_objp (x = row -> board v axis, y = col -> board u axis)
            Hpi = K_gt @ np.column_stack([R[:, 0], R[:, 1], tvec])
            # board px -> plane coords: x = (py - off)/sq, y = (px - off)/sq
            A = np.array([[0, 1.0 / sq, -off / sq],
                          [1.0 / sq, 0, -off / sq],
                          [0, 0, 1.0]])
            H = Hpi @ A
            canvas = np.full((480, 640), 128, np.uint8)
            img = cv2.warpPerspective(board, H, (640, 480),
                                      borderMode=cv2.BORDER_TRANSPARENT,
                                      dst=canvas)
            views.append(cv2.GaussianBlur(img, (3, 3), 0.8))
        K, dist, rvecs, tvecs, rms, used = \
            zhang.calibrate_camera_from_images(views, (cols, rows))
        assert used.sum() >= 4
        assert rms < 0.5, rms
        np.testing.assert_allclose(K[0, 0], K_gt[0, 0], rtol=0.01)
        np.testing.assert_allclose(K[1, 1], K_gt[1, 1], rtol=0.01)
        np.testing.assert_allclose(K[0, 2], K_gt[0, 2], atol=5)
        np.testing.assert_allclose(K[1, 2], K_gt[1, 2], atol=5)
