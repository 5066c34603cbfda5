"""ORB-style descriptor: rotation invariance + matching discriminability."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from mqslam_tpu.ops import matching, orb


def _texture(seed=3, H=240, W=320):
    rng = np.random.RandomState(seed)
    img = ndi.gaussian_filter(rng.rand(H, W), 2.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return img.astype(np.float32)


def _rotate_about(img, deg, center):
    """scipy rotation of the full image about an arbitrary center."""
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    # output coords -> input coords (inverse rotation about center)
    mat = np.array([[c, -s], [s, c]])
    off = np.asarray(center) - mat @ np.asarray(center)
    return ndi.affine_transform(img, mat, offset=off, order=3,
                                mode="nearest").astype(np.float32)


class TestOrientation:
    def test_gradient_patch_angle(self):
        """A patch with a linear ramp has its centroid along the ramp."""
        for deg in (0.0, 45.0, 120.0, -90.0):
            a = np.deg2rad(deg)
            y, x = np.mgrid[:orb._P, :orb._P].astype(np.float32)
            cx = cy = orb._P // 2
            ramp = ((x - cx) * np.cos(a) + (y - cy) * np.sin(a))
            theta = float(orb.orientation(jnp.asarray(ramp[None]))[0])
            err = (np.rad2deg(theta) - deg + 180.0) % 360.0 - 180.0
            assert abs(err) < 2.0, (deg, np.rad2deg(theta))


class TestBriefDescriptor:
    def test_self_match_is_zero(self):
        img = _texture()
        uv = np.array([[60.0, 80.0], [200.0, 100.0], [150.0, 160.0]],
                      np.float32)
        d1, _, ok = orb.brief_describe(jnp.asarray(img), jnp.asarray(uv))
        d2, _, _ = orb.brief_describe(jnp.asarray(img), jnp.asarray(uv))
        assert np.all(np.asarray(ok))
        assert np.array_equal(np.asarray(d1), np.asarray(d2))

    def test_rotation_invariance(self):
        """Descriptor at the same scene point survives in-plane rotation:
        Hamming distance to the rotated view stays far below random (128)."""
        img = _texture()
        pt = np.array([160.0, 120.0], np.float32)  # rotation center
        d0, _, ok0 = orb.brief_describe(jnp.asarray(img),
                                        jnp.asarray(pt[None]))
        assert bool(np.asarray(ok0)[0])
        for deg in (15.0, 45.0, 90.0):
            rot = _rotate_about(img, deg, center=(pt[1], pt[0]))
            d1, _, ok1 = orb.brief_describe(jnp.asarray(rot),
                                            jnp.asarray(pt[None]))
            ham = int(np.asarray(matching.pairwise_hamming(d0, d1))[0, 0])
            assert bool(np.asarray(ok1)[0])
            assert ham < 55, (deg, ham)

    def test_discriminability(self):
        """Correct correspondences under translation beat wrong ones."""
        img = _texture(seed=11)
        shift = (7, -4)
        moved = ndi.shift(img, (shift[1], shift[0]), order=3,
                          mode="nearest").astype(np.float32)
        rng = np.random.RandomState(0)
        uv = np.stack([rng.uniform(40, 280, 64),
                       rng.uniform(40, 200, 64)], 1).astype(np.float32)
        d1, _, ok1 = orb.brief_describe(jnp.asarray(img), jnp.asarray(uv))
        d2, _, ok2 = orb.brief_describe(jnp.asarray(moved),
                                        jnp.asarray(uv + shift))
        dist = np.asarray(matching.pairwise_hamming(d1, d2))
        ok = np.asarray(ok1) & np.asarray(ok2)
        # nearest neighbour of each descriptor is its true correspondence
        nn = dist.argmin(axis=1)
        acc = (nn[ok] == np.flatnonzero(ok | True)[ok]).mean() \
            if ok.any() else 0.0
        correct = (nn == np.arange(len(nn)))[ok].mean()
        assert correct > 0.9, correct
        assert acc >= 0.0  # sanity

    def test_border_points_flagged(self):
        img = _texture()
        uv = np.array([[3.0, 3.0], [160.0, 120.0]], np.float32)
        _, _, ok = orb.brief_describe(jnp.asarray(img), jnp.asarray(uv))
        ok = np.asarray(ok)
        assert not ok[0] and ok[1]


class TestOrbFeatures:
    def test_detect_and_describe(self):
        rng = np.random.RandomState(5)
        img = (rng.rand(240, 320) > 0.992).astype(np.float32)
        img = ndi.gaussian_filter(img * 255.0, 1.0).astype(np.float32) * 20
        uv, desc, score, theta, valid = orb.orb_features(
            jnp.asarray(img), max_corners=128, threshold=5.0)
        v = np.asarray(valid)
        assert v.sum() >= 10
        assert np.asarray(desc).shape == (128, 32)

    def test_pattern_static_and_bounded(self):
        pat = orb.orb_pattern()
        assert pat.shape == (orb.N_BITS, 4)
        r = np.hypot(pat[:, 0], pat[:, 1]).max()
        r2 = np.hypot(pat[:, 2], pat[:, 3]).max()
        assert max(r, r2) <= orb.PATCH_RADIUS - 2 + 1e-6
        assert np.array_equal(pat, orb.orb_pattern())  # deterministic
