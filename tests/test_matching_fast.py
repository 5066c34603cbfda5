"""Matching + FAST ops vs OpenCV."""

import numpy as np
import cv2
import jax.numpy as jnp

from mqslam_tpu.ops import fast, matching


class TestMatching:
    def test_l2_matches_numpy(self, rng):
        a = rng.randn(40, 32).astype(np.float32)
        b = rng.randn(50, 32).astype(np.float32)
        got = np.asarray(matching.pairwise_l2_sq(jnp.asarray(a),
                                                 jnp.asarray(b)))
        want = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_hamming_matches_opencv(self, rng):
        a = rng.randint(0, 256, (30, 32), dtype=np.uint8)
        b = rng.randint(0, 256, (25, 32), dtype=np.uint8)
        got = np.asarray(matching.pairwise_hamming(jnp.asarray(a),
                                                   jnp.asarray(b)))
        want = np.array([[bin(int.from_bytes(bytes(np.bitwise_xor(
            a[i], b[j])), "big")).count("1") for j in range(len(b))]
            for i in range(len(a))], dtype=np.int32)
        np.testing.assert_array_equal(got, want)

    def test_radius_match_semantics(self, rng):
        a = rng.randn(20, 8).astype(np.float32)
        b = rng.randn(30, 8).astype(np.float32)
        d = matching.pairwise_l2_sq(jnp.asarray(a), jnp.asarray(b))
        idx, dist, valid = matching.radius_match(d, max_distance=8.0)
        d_np = np.asarray(d)
        for q in range(20):
            order = np.argsort(d_np[q])
            within = [j for j in order[:2] if d_np[q, j] <= 8.0]
            got = [int(i) for i, v in zip(np.asarray(idx[q]),
                                          np.asarray(valid[q])) if v]
            assert got == within, (q, got, within)

    def test_ratio_and_mutual(self, rng):
        a = rng.randn(15, 4).astype(np.float32)
        b = np.concatenate([a + 0.01 * rng.randn(15, 4).astype(np.float32),
                            rng.randn(10, 4).astype(np.float32) * 5])
        d = matching.pairwise_l2_sq(jnp.asarray(a), jnp.asarray(b))
        i1, d1, i2, d2 = matching.knn2(d)
        accept = np.asarray(matching.ratio_test(d1, d2, 0.7))
        np.testing.assert_array_equal(np.asarray(i1), np.arange(15))
        assert accept.all()
        fwd, mutual = matching.mutual_best(d)
        np.testing.assert_array_equal(np.asarray(fwd), np.arange(15))
        assert np.asarray(mutual).all()


class TestFast:
    def test_detects_cv2_corners(self, rng):
        img = rng.rand(24, 32) * 255.0
        img = cv2.GaussianBlur(img.astype(np.float32), (3, 3), 0.8)
        img = np.kron(cv2.resize(img, (8, 6)), np.ones((4, 4))).astype(
            np.float32)[:120, :160]
        det = cv2.FastFeatureDetector_create(threshold=20,
                                             nonmaxSuppression=True)
        kps = det.detect(img.astype(np.uint8))
        want = {(int(k.pt[0]), int(k.pt[1])) for k in kps}
        uv, score, valid = fast.fast_detect(jnp.asarray(img), threshold=20.0,
                                            max_corners=256)
        got = {(int(u), int(v)) for (u, v), ok in
               zip(np.asarray(uv), np.asarray(valid)) if ok}
        if not want:
            return
        # substantial overlap (nms tie-breaking differs slightly)
        hits = sum(1 for c in want
                   if any(abs(c[0] - g[0]) <= 1 and abs(c[1] - g[1]) <= 1
                          for g in got))
        assert hits >= 0.8 * len(want), (len(want), hits)

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        uv, score, valid = fast.fast_detect(img, max_corners=32)
        assert not bool(np.asarray(valid).any())
