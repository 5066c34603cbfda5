"""Frontend ops (features / LK / PnP / homography) vs OpenCV ground truth."""

import numpy as np
import cv2
import jax.numpy as jnp
import jax
import pytest

from mqslam_tpu.core import camera as cam_mod, se3, so3
from mqslam_tpu.ops import features, lk, pnp, homography

CAL = cam_mod.Cal3DS2.from_array(jnp.array(
    [520.9, 521.0, 0.0, 325.1, 249.7, 0.05, -0.1, 1e-3, -2e-3],
    dtype=jnp.float32))


def checkerboard_texture(rng, h=240, w=320):
    """Smooth random texture with plenty of corners, uint8-scale floats."""
    img = rng.rand(h // 8, w // 8) * 255
    img = np.kron(img, np.ones((8, 8)))
    img = cv2.GaussianBlur(img.astype(np.float32), (5, 5), 1.2)
    return img


class TestFeatures:
    def test_response_peaks_on_corners(self, rng):
        img = np.zeros((120, 160), np.float32)
        img[40:80, 50:110] = 200.0  # rectangle: 4 corners
        uv, valid = features.detect_corners(jnp.asarray(img), max_corners=8,
                                            cell=10)
        uv = np.asarray(uv)[np.asarray(valid)]
        assert len(uv) >= 4
        corners = np.array([[50, 40], [109, 40], [50, 79], [109, 79]])
        for c in corners:
            d = np.linalg.norm(uv - c, axis=1).min()
            assert d <= 3.0, (c, uv)

    def test_respects_existing_mask(self, rng):
        img = jnp.asarray(checkerboard_texture(rng))
        uv1, v1 = features.detect_corners(img, max_corners=50, cell=12)
        # block everything: re-detect with existing = detected
        uv2, v2 = features.detect_corners(img, max_corners=50, cell=12,
                                          existing=uv1, existing_valid=v1)
        uv1n = np.asarray(uv1)[np.asarray(v1)]
        uv2n = np.asarray(uv2)[np.asarray(v2)]
        if len(uv2n) and len(uv1n):
            d = np.linalg.norm(uv2n[:, None] - uv1n[None], axis=2).min()
            assert d >= 12.0

    def test_min_distance_between_detections(self, rng):
        img = jnp.asarray(checkerboard_texture(rng))
        uv, valid = features.detect_corners(img, max_corners=100, cell=12)
        uvn = np.asarray(uv)[np.asarray(valid)]
        d = np.linalg.norm(uvn[:, None] - uvn[None], axis=2)
        np.fill_diagonal(d, np.inf)
        # grid guarantee: distinct cells, so distance >= 1; most pairs far
        assert d.min() >= 1.0


class TestLK:
    def test_pure_translation(self, rng):
        base = checkerboard_texture(rng)
        shift = (3.6, -2.3)
        M = np.float32([[1, 0, shift[0]], [0, 1, shift[1]]])
        moved = cv2.warpAffine(base, M, (base.shape[1], base.shape[0]))
        pts = np.stack(np.meshgrid(np.arange(40, 280, 40),
                                   np.arange(40, 200, 40)), -1
                       ).reshape(-1, 2).astype(np.float32)
        new_pts, status, err = lk.lk_track(jnp.asarray(base),
                                           jnp.asarray(moved),
                                           jnp.asarray(pts))
        new_pts = np.asarray(new_pts)[np.asarray(status)]
        pts_ok = pts[np.asarray(status)]
        assert np.asarray(status).sum() >= len(pts) * 0.8
        flow = new_pts - pts_ok
        np.testing.assert_allclose(flow.mean(axis=0), shift, atol=0.2)
        assert np.abs(flow - np.array(shift)).max() < 0.7

    def test_matches_opencv(self, rng):
        base = checkerboard_texture(rng)
        M = cv2.getRotationMatrix2D((160, 120), 1.5, 1.01)
        M[:, 2] += [2.0, -1.5]
        moved = cv2.warpAffine(base, M, (base.shape[1], base.shape[0]))
        pts = np.stack(np.meshgrid(np.arange(60, 260, 25),
                                   np.arange(60, 180, 25)), -1
                       ).reshape(-1, 2).astype(np.float32)
        got, st, err = lk.lk_track(jnp.asarray(base), jnp.asarray(moved),
                                   jnp.asarray(pts))
        want, st_cv, err_cv = cv2.calcOpticalFlowPyrLK(
            base.astype(np.uint8), moved.astype(np.uint8), pts, None)
        both = np.asarray(st) & (st_cv.reshape(-1) == 1)
        assert both.sum() >= len(pts) * 0.7
        d = np.linalg.norm(np.asarray(got)[both] - want[both], axis=1)
        # sub-pixel agreement with OpenCV for the vast majority
        assert np.median(d) < 0.25
        assert np.mean(d < 1.0) > 0.9

    def test_flat_region_rejected(self):
        flat = np.full((100, 100), 128.0, np.float32)
        pts = np.array([[50.0, 50.0]], np.float32)
        _, status, _ = lk.lk_track(jnp.asarray(flat), jnp.asarray(flat),
                                   jnp.asarray(pts))
        assert not bool(status[0])


def synthetic_pnp_scene(rng, n=64, noise=0.0):
    objp = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                     rng.uniform(4, 8, n)], 1).astype(np.float32)
    rvec = np.array([0.1, -0.2, 0.05], np.float32)
    tvec = np.array([0.2, -0.1, 0.3], np.float32)
    P = se3.from_rvec_tvec(jnp.asarray(rvec), jnp.asarray(tvec))
    uv, _ = cam_mod.project(jnp.asarray(objp), P, CAL)
    uv = np.asarray(uv) + noise * rng.randn(n, 2).astype(np.float32)
    return objp, uv.astype(np.float32), rvec, tvec


class TestPnP:
    def test_dlt_exact(self, rng):
        objp, uv, rvec, tvec = synthetic_pnp_scene(rng)
        uvn = cam_mod.undistort_points(jnp.asarray(uv), CAL)
        R, t = pnp.pnp_dlt(jnp.asarray(objp), uvn)
        np.testing.assert_allclose(np.asarray(R),
                                   np.asarray(so3.exp(jnp.asarray(rvec))),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(t), tvec, atol=5e-3)

    def test_refine_converges(self, rng):
        objp, uv, rvec, tvec = synthetic_pnp_scene(rng, noise=0.3)
        r0 = jnp.asarray(rvec + 0.05)
        t0 = jnp.asarray(tvec + np.float32([0.1, -0.1, 0.2]))
        r, t = pnp.pnp_refine(jnp.asarray(objp), jnp.asarray(uv), CAL, r0, t0)
        rms, _ = pnp.reprojection_error(jnp.asarray(objp), jnp.asarray(uv),
                                        CAL, r, t)
        assert float(rms) < 0.5
        np.testing.assert_allclose(np.asarray(t), tvec, atol=0.02)

    def test_refine_matches_opencv(self, rng):
        objp, uv, rvec, tvec = synthetic_pnp_scene(rng, noise=0.5)
        K = np.asarray(cam_mod.K_from_cal(CAL), np.float64)
        dist = np.array([0.05, -0.1, 1e-3, -2e-3], np.float64)
        r0 = (rvec + 0.03).astype(np.float64).reshape(3, 1)
        t0 = (tvec + 0.05).astype(np.float64).reshape(3, 1)
        ok, r_cv, t_cv = cv2.solvePnP(
            objp.astype(np.float64), uv.astype(np.float64), K, dist,
            r0.copy(), t0.copy(), useExtrinsicGuess=True)
        r, t = pnp.pnp_refine(jnp.asarray(objp), jnp.asarray(uv), CAL,
                              jnp.asarray(rvec + 0.03),
                              jnp.asarray(tvec + 0.05))
        np.testing.assert_allclose(np.asarray(t), t_cv.reshape(-1), atol=5e-3)
        np.testing.assert_allclose(np.asarray(r), r_cv.reshape(-1), atol=5e-3)

    def test_ransac_rejects_outliers(self, rng):
        objp, uv, rvec, tvec = synthetic_pnp_scene(rng, n=96, noise=0.3)
        # corrupt 25% of the observations
        n_bad = 24
        uv_bad = uv.copy()
        uv_bad[:n_bad] += rng.uniform(30, 80, (n_bad, 2)).astype(np.float32)
        valid = np.ones(96, bool)
        key = jax.random.PRNGKey(0)
        r, t, inl, n_inl = pnp.pnp_ransac(
            jnp.asarray(objp), jnp.asarray(uv_bad), CAL, jnp.asarray(valid),
            key)
        inl = np.asarray(inl)
        assert int(n_inl) >= 60
        assert inl[:n_bad].sum() <= 2          # outliers excluded
        np.testing.assert_allclose(np.asarray(t), tvec, atol=0.03)
        np.testing.assert_allclose(np.asarray(r), rvec, atol=0.01)

    def test_ransac_respects_valid_mask(self, rng):
        objp, uv, rvec, tvec = synthetic_pnp_scene(rng, n=64, noise=0.2)
        valid = np.zeros(64, bool)
        valid[20:] = True
        # garbage in the invalid region must not matter
        uv2 = uv.copy()
        uv2[:20] = 1e5
        r, t, inl, n_inl = pnp.pnp_ransac(
            jnp.asarray(objp), jnp.asarray(uv2), CAL, jnp.asarray(valid),
            jax.random.PRNGKey(1))
        assert not np.asarray(inl)[:20].any()
        np.testing.assert_allclose(np.asarray(t), tvec, atol=0.05)


class TestHomography:
    def test_exact_homography_recovery(self, rng):
        H_true = np.array([[1.02, 0.01, 0.3], [-0.02, 0.98, -0.2],
                           [1e-4, -2e-4, 1.0]])
        pts1 = rng.uniform(-1, 1, (60, 2))
        ph = np.concatenate([pts1, np.ones((60, 1))], 1) @ H_true.T
        pts2 = ph[:, :2] / ph[:, 2:3]
        H = homography.fit_homography(jnp.asarray(pts1, jnp.float32),
                                      jnp.asarray(pts2, jnp.float32))
        H = np.asarray(H, np.float64)
        H = H / H[2, 2] * 1.0
        H_want = H_true / np.linalg.norm(H_true)
        H_got = np.asarray(H) / np.linalg.norm(H)
        if np.sign(H_got[2, 2]) != np.sign(H_want[2, 2]):
            H_got = -H_got
        np.testing.assert_allclose(H_got, H_want, atol=1e-4)

    def test_condition_matches_opencv(self, rng):
        # noisy near-degenerate case (small parallax)
        pts1 = rng.uniform(-0.5, 0.5, (80, 2))
        depth = rng.uniform(4, 6, 80)
        pts3d = np.concatenate([pts1 * depth[:, None], depth[:, None]], 1)
        R = cv2.Rodrigues(np.array([0.01, 0.02, 0.005]))[0]
        t = np.array([0.08, 0.02, 0.01])
        p2 = pts3d @ R.T + t
        pts2 = p2[:, :2] / p2[:, 2:3]
        H_cv, _ = cv2.findHomography(pts1, pts2)
        w_cv = cv2.SVDecomp(H_cv, flags=cv2.SVD_NO_UV)[0].reshape(-1)
        cond_cv = w_cv[0] / w_cv[2]
        H = homography.fit_homography(jnp.asarray(pts1, jnp.float32),
                                      jnp.asarray(pts2, jnp.float32))
        cond = float(homography.homography_condition(H))
        np.testing.assert_allclose(cond, cond_cv, rtol=5e-3)

    def test_keyframe_test_semantics(self, rng):
        # zero motion -> H ~ identity -> condition ~ 1 -> not a keyframe
        pts = jnp.asarray(rng.uniform(-0.5, 0.5, (50, 2)), jnp.float32)
        assert not bool(homography.keyframe_test(pts, pts))
        # strong parallax -> keyframe
        depth = rng.uniform(2, 8, 50)
        pts3d = np.concatenate([np.asarray(pts) * depth[:, None],
                                depth[:, None]], 1)
        p2 = pts3d + np.array([1.5, 0.0, 0.0])
        pts2 = jnp.asarray(p2[:, :2] / p2[:, 2:3], jnp.float32)
        assert bool(homography.keyframe_test(pts, pts2))


class TestLKPallas:
    @pytest.mark.parametrize("impl", ["pallas", "fused", "tiled"])
    def test_matches_xla_implementation(self, rng, impl):
        """The Pallas Newton-loop kernels (interpret mode on CPU) must
        agree with the banded-matmul XLA formulation."""
        import cv2 as _cv2
        base = checkerboard_texture(rng)
        M = _cv2.getRotationMatrix2D((160, 120), 1.5, 1.01)
        M[:, 2] += [2.0, -1.5]
        moved = _cv2.warpAffine(base, M, (base.shape[1], base.shape[0]))
        pts = np.stack(np.meshgrid(np.arange(80, 240, 60),
                                   np.arange(80, 160, 60)), -1
                       ).reshape(-1, 2).astype(np.float32)
        a1, s1, e1 = lk.lk_track(jnp.asarray(base), jnp.asarray(moved),
                                 jnp.asarray(pts))
        a2, s2, e2 = lk.lk_track(jnp.asarray(base), jnp.asarray(moved),
                                 jnp.asarray(pts), impl=impl,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        both = np.asarray(s1)
        np.testing.assert_allclose(np.asarray(a2)[both],
                                   np.asarray(a1)[both], atol=2e-3)
        np.testing.assert_allclose(np.asarray(e2)[both],
                                   np.asarray(e1)[both],
                                   atol=1e-3 if impl == "pallas" else 0.5)

    @pytest.mark.parametrize("impl", ["pallas", "fused", "tiled"])
    def test_pallas_atlas_agents(self, rng, impl):
        """Pallas impls apply atlas row offsets (each agent's I-patches come
        from its own tile, not agent 0's)."""
        import cv2 as _cv2
        base = checkerboard_texture(rng)
        shifts = [(2.0, -1.5), (-3.0, 1.0)]
        moved = [
            _cv2.warpAffine(
                base, np.float32([[1, 0, dx], [0, 1, dy]]),
                (base.shape[1], base.shape[0]))
            for (dx, dy) in shifts]
        pts = np.stack(np.meshgrid(np.arange(80, 240, 40),
                                   np.arange(80, 160, 40)), -1
                       ).reshape(-1, 2).astype(np.float32)
        T = len(pts)
        pad = lk.lk_pad()
        pyr_of = lambda im: tuple(lk.build_pyramid(jnp.asarray(im), 3,
                                                   pad=pad))
        atlas = lambda ims: tuple(
            jnp.concatenate(levels, axis=0)
            for levels in zip(*[pyr_of(im) for im in ims]))
        prev_atlas = atlas([base, base])
        next_atlas = atlas(moved)
        pts2 = jnp.asarray(np.concatenate([pts, pts]))
        agents = jnp.concatenate([jnp.zeros(T, jnp.int32),
                                  jnp.ones(T, jnp.int32)])
        args = dict(win=21, prepad=True, atlas_agents=agents, atlas_tiles=2)
        a_x, s_x, _ = lk.lk_track_pyr(prev_atlas, next_atlas, pts2,
                                      impl="xla", **args)
        a_p, s_p, _ = lk.lk_track_pyr(prev_atlas, next_atlas, pts2,
                                      impl=impl, interpret=True, **args)
        np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
        ok = np.asarray(s_x)
        np.testing.assert_allclose(np.asarray(a_p)[ok], np.asarray(a_x)[ok],
                                   atol=1e-3)
        # each agent recovered its own shift
        for a, (dx, dy) in enumerate(shifts):
            sel = ok & (np.asarray(agents) == a)
            flow = np.asarray(a_p)[sel] - np.concatenate([pts, pts])[sel]
            np.testing.assert_allclose(flow.mean(0), [dx, dy], atol=0.2)

    def test_fused_bf16_store(self, rng):
        """bf16 strip copies (the production store on TPU: half the DMA
        traffic, exact for 8-bit imagery at level 0) stay within a small
        fraction of a pixel of the exact-f32 fused path."""
        import cv2 as _cv2
        base = checkerboard_texture(rng)
        M = _cv2.getRotationMatrix2D((160, 120), 1.5, 1.01)
        M[:, 2] += [2.0, -1.5]
        moved = _cv2.warpAffine(base, M, (base.shape[1], base.shape[0]))
        pts = np.stack(np.meshgrid(np.arange(80, 240, 60),
                                   np.arange(80, 160, 60)), -1
                       ).reshape(-1, 2).astype(np.float32)
        a1, s1, _ = lk.lk_track(jnp.asarray(base), jnp.asarray(moved),
                                jnp.asarray(pts), impl="fused",
                                interpret=True)
        a2, s2, _ = lk.lk_track(jnp.asarray(base), jnp.asarray(moved),
                                jnp.asarray(pts), impl="fused",
                                interpret=True, store_dtype="bfloat16")
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        ok = np.asarray(s1)
        np.testing.assert_allclose(np.asarray(a2)[ok], np.asarray(a1)[ok],
                                   atol=0.05)
