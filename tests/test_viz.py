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
