"""DMA patch extractor (interpret mode) vs the XLA strips+one-hot path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mqslam_tpu.ops import lk
from mqslam_tpu.ops.extract_pallas import (ROWS_CAP, _clamped_corners,
                                           dma_extract_supported,
                                           extract_patches_dma)


@pytest.fixture(scope="module")
def img():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(512, 768).astype(np.float32) * 255)


class TestDmaExtract:
    @pytest.mark.parametrize("P", [24, 36, 38])
    def test_matches_xla_patches(self, img, P):
        rng = np.random.RandomState(1)
        T = 100
        corners = jnp.asarray(np.stack([
            rng.randint(-4, img.shape[0] - P + 4, T),
            rng.randint(-4, img.shape[1] - P + 4, T)], 1)
            .astype(np.int32))
        p_ref, cy_r, cx_r = lk._extract_patches(img, corners, P)
        p_new, y0, cx_n = extract_patches_dma(img, corners, P,
                                              interpret=True)
        # tile-multiple dims -> identical clamps
        np.testing.assert_array_equal(np.asarray(cx_r), np.asarray(cx_n))
        dy = np.asarray(cy_r) - np.asarray(y0)
        assert (dy >= 0).all() and (dy + P <= ROWS_CAP).all()
        pn, pr = np.asarray(p_new), np.asarray(p_ref)
        got = pn[np.arange(T)[:, None, None],
                 dy[:, None, None] + np.arange(P)[None, :, None],
                 np.arange(P)[None, None, :]]
        np.testing.assert_array_equal(got, pr)

    def test_supported_gate(self):
        assert dma_extract_supported(512, 768)
        assert not dma_extract_supported(40, 768)
        assert not dma_extract_supported(512, 200)

    def test_clamp_caps_match_xla_on_tile_dims(self):
        H, W, P = 512, 768, 38
        cy, cx, y0, x0 = _clamped_corners(
            jnp.array([-7, 0, 200, H]), jnp.array([-3, 0, 700, W]),
            H, W, P)
        np.testing.assert_array_equal(np.asarray(cy), [0, 0, 200, H - P])
        np.testing.assert_array_equal(np.asarray(cx), [0, 0, 700, W - P])
        assert (np.asarray(y0) % 8 == 0).all()
        assert (np.asarray(x0) % 128 == 0).all()


class TestLkWithDmaExtract:
    def test_flows_match_xla_extraction(self):
        """lk_track_pyr(dma_extract=True) vs the default XLA extraction on
        a rendered pair: flows must agree to interpolation roundoff (the
        DMA path's template gradients use real borders instead of the
        XLA zero-pad, so the last-row gradient taps differ slightly)."""
        from mqslam_tpu.frontend import synthetic

        rng = np.random.RandomState(2)
        tex = synthetic.make_texture(rng)
        P0, P1 = np.eye(4), np.eye(4)
        P1[:3, 3] = [-0.02, -0.01, 0.004]
        imgs = synthetic.render_plane_sequence(
            np.stack([P0, P1]), tex, size=(320, 240), f=280.0, plane_z=4.0)
        pad = lk.lk_pad()
        pyr_a = tuple(lk.build_pyramid(jnp.asarray(imgs[0]), 3, pad=pad))
        pyr_b = tuple(lk.build_pyramid(jnp.asarray(imgs[1]), 3, pad=pad))
        pts = jnp.asarray(np.stack([rng.uniform(30, 290, 64),
                                    rng.uniform(30, 210, 64)], 1)
                          .astype(np.float32))
        q1, s1, e1 = lk.lk_track_pyr(pyr_a, pyr_b, pts, prepad=True,
                                     dma_extract=False)
        q2, s2, e2 = lk.lk_track_pyr(pyr_a, pyr_b, pts, prepad=True,
                                     dma_extract=True)
        s1, s2 = np.asarray(s1), np.asarray(s2)
        both = s1 & s2
        assert both.sum() >= 0.9 * len(pts)
        dq = np.abs(np.asarray(q1) - np.asarray(q2))[both]
        assert dq.max() < 0.05, dq.max()
        assert np.median(dq) < 0.01
