"""PLY export round-trip (via open3d-free manual parse)."""

import numpy as np

from mqslam_tpu.viz import ply


def test_ascii_ply(tmp_path, rng):
    pts = rng.randn(10, 3).astype(np.float32)
    colors = rng.randint(0, 255, (10, 3)).astype(np.uint8)
    f = tmp_path / "m.ply"
    ply.save_ply(str(f), pts, colors, binary=False)
    text = f.read_text().split("\n")
    assert text[0] == "ply"
    assert "element vertex 10" in text
    body = text[text.index("end_header") + 1:]
    row0 = body[0].split()
    np.testing.assert_allclose([float(v) for v in row0[:3]], pts[0],
                               atol=1e-5)
    assert [int(v) for v in row0[3:]] == list(colors[0][::-1])


def test_binary_ply(tmp_path, rng):
    pts = rng.randn(5, 3).astype(np.float32)
    f = tmp_path / "m.ply"
    ply.save_ply(str(f), pts, binary=True)
    raw = f.read_bytes()
    header_end = raw.index(b"end_header\n") + len(b"end_header\n")
    data = np.frombuffer(raw[header_end:], dtype="<f4").reshape(5, 3)
    np.testing.assert_allclose(data, pts, atol=1e-6)


def test_pcd_to_ply(tmp_path, rng):
    from mqslam_tpu.io import pcd
    pts = rng.randn(7, 3).astype(np.float32)
    colors = rng.randint(0, 255, (7, 3)).astype(np.uint8)
    pcd.save_pcd(tmp_path / "m.pcd", pts, colors)
    ply.pcd_to_ply(str(tmp_path / "m.pcd"), str(tmp_path / "m.ply"))
    assert (tmp_path / "m.ply").exists()


class TestColors:
    def test_palette_matches_cv2(self):
        """Palette reproduces the reference's (cv2-based) palette within
        Lab->RGB quantization tolerance, same seed-1 shuffle order."""
        import numpy as np
        from mqslam_tpu.viz import colors as ct

        pal, num = ct.color_palette(2, 3, 4)
        assert num == 24 and pal.shape == (24, 3) and pal.dtype == np.uint8
        try:
            import cv2
        except ImportError:
            return
        L_min, L_max = 99, 230
        a_min, a_max = 26, 230
        b_min, b_max = 26, 230
        lab = np.zeros((24, 1, 3), np.uint8)
        i = 0
        for L in np.arange(L_min, L_max + 1, (L_max - L_min) / 1):
            for a in np.arange(a_min, a_max + 1, (a_max - a_min) / 2):
                for b in np.arange(b_min, b_max + 1, (b_max - b_min) / 3):
                    lab[i, 0] = (L, a, b)
                    i += 1
        ref = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB).reshape(24, 3)
        st = np.random.get_state()
        np.random.seed(1)
        ref = np.random.permutation(ref)
        np.random.set_state(st)
        diff = np.abs(pal.astype(int) - ref.astype(int)).max()
        assert diff <= 3, diff

    def test_sample_colors(self):
        import numpy as np
        from mqslam_tpu.viz import colors as ct

        img = np.arange(12).reshape(3, 4)
        pts = np.array([[1.2, 0.4], [3.0, 2.0]])  # (x, y)
        got = ct.sample_colors(img, pts)
        assert got.tolist() == [1, 11]
