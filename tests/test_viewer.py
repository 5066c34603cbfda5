"""HTML viewer artifact: embedded data integrity + live-mode wiring."""

import json
import re

import numpy as np

from mqslam_tpu.viz.html_viewer import export_viewer, export_live_viewer


def _extract(html, name):
    m = re.search(rf"let {name} = (\[[^;]*\]);", html, re.S)
    assert m, f"{name} not found"
    return json.loads(m.group(1))


class TestViewer:
    def test_embedded_data_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        pts = rng.uniform(-2, 2, (50, 3))
        cols = rng.randint(0, 255, (50, 3)).astype(np.uint8)
        traj = rng.uniform(-1, 1, (20, 3))
        out = export_viewer(str(tmp_path / "v.html"), pts, cols, traj)
        html = open(out).read()
        P = np.asarray(_extract(html, "PTS")).reshape(-1, 6)
        T = np.asarray(_extract(html, "TRAJ")).reshape(-1, 3)
        np.testing.assert_allclose(P[:, :3], pts, atol=1e-4)
        np.testing.assert_array_equal(P[:, 3:].astype(np.uint8), cols)
        np.testing.assert_allclose(T, traj, atol=1e-4)
        # view initialized on the data (distance covers the spread)
        d0 = float(re.search(r"const D0 = ([0-9.]+)", html).group(1))
        assert d0 > 2.0
        # self-contained: no external resources
        assert "http://" not in html and "https://" not in html

    def test_intensity_colors_and_trajectory_object(self, tmp_path):
        from mqslam_tpu.io import tum
        pts = np.zeros((4, 3))
        traj = tum.CamTrajectory(np.arange(3) / 30.0,
                                 np.arange(9).reshape(3, 3).astype(float),
                                 np.tile([0, 0, 0, 1.0], (3, 1)))
        out = export_viewer(str(tmp_path / "v.html"), pts,
                            np.array([0., 100., 200., 255.]), traj)
        html = open(out).read()
        P = np.asarray(_extract(html, "PTS")).reshape(-1, 6)
        np.testing.assert_array_equal(P[:, 3], [0, 100, 200, 255])
        T = np.asarray(_extract(html, "TRAJ")).reshape(-1, 3)
        np.testing.assert_allclose(T, traj.locations)

    def test_live_viewer_polls_files(self, tmp_path):
        out = export_live_viewer(str(tmp_path / "live.html"),
                                 "traj.txt", "map.pcd", period_s=2.0)
        html = open(out).read()
        assert 'const TRAJ_FILE = "traj.txt"' in html
        assert 'const MAP_FILE = "map.pcd"' in html
        assert "const PERIOD_MS = 2000" in html
        assert "parsePCD" in html and "parseTUM" in html

    def test_js_brace_balance(self, tmp_path):
        """No un-substituted format braces; script braces balanced."""
        out = export_viewer(str(tmp_path / "v.html"), np.zeros((1, 3)))
        html = open(out).read()
        assert "{pts_json}" not in html and "{render_js}" not in html
        script = html[html.index("<script>"):html.index("</script>")]
        assert script.count("{") == script.count("}")
        assert script.count("(") == script.count(")")
