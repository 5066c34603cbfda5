"""Image undistortion vs cv2 (getOptimalNewCameraMatrix + remap + ROI crop).

Reference semantics: calibration_tools.py:59-86 undistort_image.
"""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from mqslam_tpu.core import camera as cam_mod
from mqslam_tpu.calib import undistort as ud

K = np.array([[540.0, 0, 320.0], [0, 530.0, 250.0], [0, 0, 1.0]])
DIST = np.array([-0.28, 0.08, 0.001, -0.0005])
SIZE = (640, 480)


@pytest.fixture
def cal():
    return cam_mod.cal_from_K_dist(jnp.asarray(K, jnp.float32),
                                   jnp.asarray(DIST, jnp.float32))


@pytest.fixture
def img():
    rng = np.random.RandomState(0)
    return cv2.GaussianBlur(
        rng.uniform(0, 255, SIZE[::-1]).astype(np.float32), (7, 7), 2)


class TestOptimalNewCameraMatrix:
    @pytest.mark.parametrize("alpha", [0.0, 0.5, 1.0])
    def test_matches_cv2(self, cal, alpha):
        Kn_cv, roi_cv = cv2.getOptimalNewCameraMatrix(K, DIST, SIZE, alpha)
        Kn, roi = ud.get_optimal_new_camera_matrix(cal, SIZE, alpha)
        np.testing.assert_allclose(Kn[:2], Kn_cv[:2], rtol=2e-3, atol=0.5)
        assert all(abs(a - b) <= 2 for a, b in zip(roi, roi_cv)), (roi,
                                                                   roi_cv)

    def test_negative_fy(self):
        Kn = K.copy()
        Kn[1, 1] = -530.0
        cal_n = cam_mod.cal_from_K_dist(jnp.asarray(Kn, jnp.float32),
                                        jnp.asarray(DIST, jnp.float32))
        K_new, roi = ud.get_optimal_new_camera_matrix(cal_n, SIZE, 1.0)
        assert K_new[1, 1] < 0           # sign preserved
        assert roi[2] > 0 and roi[3] > 0


class TestUndistortImage:
    def test_remap_matches_cv2_given_same_K(self, cal, img):
        Kn_cv, roi = cv2.getOptimalNewCameraMatrix(K, DIST, SIZE, 1)
        mapx, mapy = cv2.initUndistortRectifyMap(K, DIST, None, Kn_cv,
                                                 SIZE, 5)
        und_cv = cv2.remap(img, mapx, mapy, cv2.INTER_LINEAR)
        und = np.asarray(ud._remap(jnp.asarray(img),
                                   cal.as_array().astype(jnp.float32),
                                   jnp.asarray(Kn_cv, jnp.float32)))
        x, y, w, h = roi
        d = np.abs(und_cv[y:y + h, x:x + w] - und[y:y + h, x:x + w])
        # cv2.remap interpolates with 5-bit fixed-point weights; a few
        # pixels on sharp texture differ by one quantization step
        assert d.mean() < 0.1
        assert np.percentile(d, 99) < 1.0

    def test_full_pipeline_straightens_lines(self, cal):
        """A distorted straight line becomes straight after undistortion."""
        grid = np.zeros(SIZE[::-1], np.float32)
        for y in range(40, 480, 50):
            grid[y, :] = 255.0
        # render the DISTORTED view of the grid: sample grid at the
        # undistorted position of each pixel (inverse of the remap)
        u, v = np.meshgrid(np.arange(SIZE[0], dtype=np.float32),
                           np.arange(SIZE[1], dtype=np.float32))
        uvn = np.asarray(cam_mod.undistort_points(
            jnp.asarray(np.stack([u, v], -1).reshape(-1, 2)), cal))
        src = np.asarray(cam_mod.denormalize_points(
            jnp.asarray(uvn),
            cam_mod.cal_from_K_dist(jnp.asarray(K, jnp.float32))))
        mapx = src[:, 0].reshape(SIZE[1], SIZE[0]).astype(np.float32)
        mapy = src[:, 1].reshape(SIZE[1], SIZE[0]).astype(np.float32)
        distorted = cv2.remap(grid, mapx, mapy, cv2.INTER_LINEAR)

        def line_straightness(im):
            """Max over lines of the std of the per-column line center."""
            worst = 0.0
            row_energy = im.sum(axis=1)
            peaks = np.flatnonzero(
                (row_energy[1:-1] >= row_energy[:-2])
                & (row_energy[1:-1] >= row_energy[2:])
                & (row_energy[1:-1] > 0.3 * row_energy.max())) + 1
            for p in peaks[:4]:
                band = im[max(p - 4, 0):p + 5]
                ys = np.arange(band.shape[0], dtype=np.float64)
                w = band.sum(axis=0)
                keep = w > 0.2 * w.max()
                com = (ys[:, None] * band).sum(0)[keep] / w[keep]
                worst = max(worst, com.std())
            return worst

        # lines are measurably curved in the distorted image ...
        assert line_straightness(distorted) > 1.0
        und, roi = ud.undistort_image(distorted, cal, alpha=0.0)
        # ... and straight (constant per-column center) after undistortion
        assert line_straightness(und) < 0.15

    def test_uint8_roundtrip_and_channels(self, cal, img):
        rgb = np.stack([img, img * 0.5, img * 0.25], axis=-1)
        rgb8 = np.clip(rgb, 0, 255).astype(np.uint8)
        out, roi = ud.undistort_image(rgb8, cal, alpha=1.0)
        assert out.dtype == np.uint8 and out.ndim == 3
        assert out.shape[0] == roi[3] and out.shape[1] == roi[2]
