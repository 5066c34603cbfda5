"""Drawing primitives + composite painters (viz.draw / viz.painter)."""

import numpy as np
import pytest

from mqslam_tpu.viz import draw as dw
from mqslam_tpu.viz.painter import (Composite2DPainter, Composite3DPainter,
                                    save_png)


class TestPrimitives:
    def test_line_hits_endpoints_and_is_thin(self):
        img = np.zeros((50, 60, 3), np.uint8)
        dw.line(img, (5, 5), (50, 40), dw.rgb(255, 0, 0))
        assert (img[5, 5] == [255, 0, 0]).all()
        assert (img[40, 50] == [255, 0, 0]).all()
        # every lit pixel lies within ~1 px of the ideal segment
        ys, xs = np.nonzero(img[:, :, 0])
        d = np.abs((40 - 5) * (xs - 5) - (50 - 5) * (ys - 5)) \
            / np.hypot(45, 35)
        assert d.max() < 1.2

    def test_filled_circle(self):
        img = np.zeros((40, 40, 3), np.uint8)
        dw.circle(img, (20, 20), 5, dw.rgb(0, 255, 0), thickness=-1)
        assert (img[20, 20] == [0, 255, 0]).all()
        assert (img[20, 25] == [0, 255, 0]).all()
        assert (img[20, 27] == 0).all()

    def test_fill_poly_triangle(self):
        img = np.zeros((40, 40, 3), np.uint8)
        dw.fill_poly(img, [(5, 5), (35, 5), (20, 30)], dw.rgb(0, 0, 255))
        assert (img[10, 20] == [0, 0, 255]).all()   # inside
        assert (img[28, 5] == 0).all()              # outside

    def test_clipping_outside_image(self):
        img = np.zeros((20, 20, 3), np.uint8)
        dw.line(img, (-10, -10), (40, 40), dw.rgb(255, 255, 255))
        dw.circle(img, (19, 19), 6, dw.rgb(255, 0, 0))
        assert img.shape == (20, 20, 3)  # no exception, in-bounds writes


class TestAxisAndCamera:
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])

    def test_axis_system_drawn_at_projection(self):
        img = np.zeros((240, 320, 3), np.uint8)
        rvec = np.zeros(3)
        tvec = np.array([0.0, 0.0, 10.0])  # origin ahead of the camera
        dw.draw_axis_system(img, self.K, None, rvec, tvec, scale=4.0)
        # origin projects to the principal point: black dot + white ring
        assert (img[120, 160] == [0, 0, 0]).all()
        assert img[115, 160].max() == 255
        # X-axis extends right in red
        assert (img[120, 200] == [255, 0, 0]).all()

    def test_axis_system_skipped_outside(self):
        img = np.zeros((240, 320, 3), np.uint8)
        out = dw.draw_axis_system(img, self.K, None, np.zeros(3),
                                  np.array([100.0, 0, 10.0]))
        assert out.sum() == 0

    def test_draw_camera_visible(self):
        img = np.zeros((240, 320, 3), np.uint8)
        P = np.eye(4)[:3]          # viewer at origin looking +Z
        cam_origin = np.array([[0.0, 0.0, 5.0]])
        dw.draw_camera(img, cam_origin, np.eye(3), self.K, P)
        assert img.sum() > 0       # frustum + axes drawn
        ys, xs = np.nonzero(img.sum(-1))
        # drawing concentrated around the projected origin (160, 120)
        assert abs(xs.mean() - 160) < 40 and abs(ys.mean() - 120) < 40

    def test_draw_camera_skipped_when_partially_out(self):
        img = np.zeros((240, 320, 3), np.uint8)
        P = np.eye(4)[:3]
        dw.draw_camera(img, np.array([[3.0, 0.0, 5.0]]), np.eye(3),
                       self.K, P)
        assert img.sum() == 0      # slam2 only draws fully-visible cams


class TestPainters:
    def test_composite2d_good_and_bad_frames(self, tmp_path):
        p = Composite2DPainter((64, 48))
        img = np.full((48, 64), 100, np.uint8)
        K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
        uv = np.array([[10.0, 10.0], [40.0, 30.0], [20.0, 40.0]])
        alive = np.array([True, True, True])
        tri = np.array([True, True, False])
        oidx = np.array([0, 1, 0])
        objp = np.array([[0, 0, 5.0], [1, 1, 6.0]])
        groups = np.array([0, 1])
        out = p.draw(img, np.zeros(3), np.array([0, 0, 10.0]), 1, K, None,
                     uv, alive, tri, oidx, objp, groups, group_id=2,
                     depth_labels=False)
        assert (out != 100).any()  # drew something over the gray frame
        p.save(str(tmp_path / "c2d.png"))
        from PIL import Image
        assert Image.open(tmp_path / "c2d.png").size == (64, 48)

        out = p.draw(img, None, None, 0, K, None, uv, alive, tri, oidx,
                     objp, groups, group_id=2)
        assert (out[0, :, 0] == 255).all()  # red border on bad frame

    def test_composite3d_renders_points_and_trajectory(self, tmp_path):
        P_view = np.eye(4)
        P_view[2, 3] = 40.0  # virtual cam looking down +Z from afar
        p = Composite3DPainter(P_view[:3], (64, 48))
        pts = np.stack([np.linspace(-2, 2, 30), np.zeros(30),
                        np.full(30, 4.0)], 1)
        cols = np.full(30, 200.0)
        groups = np.zeros(30, np.int32)
        out = p.draw(np.zeros(3), np.array([0, 0, 2.0]), 1, pts, cols,
                     groups)
        assert (out.sum(-1) > 0).sum() >= 20  # landmarks rendered
        # navigation mutates the view
        before = p.P.copy()
        p.zoom_in(2.0)
        p.rotate_z(0.3)
        assert not np.allclose(before, p.P)
        out2 = p.draw(np.zeros(3), np.array([0, 0, 2.0]), 2, pts, cols,
                      groups)
        p.save(str(tmp_path / "c3d.png"))
        assert len(p.cams_pos) == 2 and len(p.cams_pos_keyfr) == 1


class TestDebugDirIntegration:
    """--debug-dir wiring: run_frontend writes Composite 2D/3D PNGs
    (the headless slam2 __debug__ views, slam2.py:1227-1242)."""

    def test_run_frontend_writes_debug_views(self, tmp_path):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_frontend import make_sequence, init_from_frame0, CAL, CFG
        from mqslam_tpu.frontend.runner import run_frontend

        rng = np.random.RandomState(3)
        imgs, P_gt = make_sequence(rng, 8)
        uv0, objp0 = init_from_frame0(imgs[0], P_gt[0])
        dbg = str(tmp_path / "dbg")
        run_frontend(imgs, CAL, CFG, uv0, objp0, fps=30.0,
                     collect_ba=False, debug_dir=dbg, debug_every=3)
        files = sorted(os.listdir(dbg))
        two_d = [f for f in files if f.startswith("composite2d_")]
        three_d = [f for f in files if f.startswith("composite3d_")]
        assert two_d and three_d
        from PIL import Image
        im = np.asarray(Image.open(os.path.join(dbg, two_d[0])))
        assert im.ndim == 3 and im.shape[2] == 3
        assert im.max() > 0  # something was drawn
