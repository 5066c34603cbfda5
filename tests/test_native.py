"""Native C++ image loader vs PIL."""

import numpy as np
import pytest
from PIL import Image

from mqslam_tpu import native
from mqslam_tpu.io import images

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"frame-{i}.png")
    gray = rng.randint(0, 255, (32, 40), dtype=np.uint8)
    Image.fromarray(gray, mode="L").save(d / "gray.png")
    Image.fromarray(arr).save(d / "color.jpg", quality=95)
    return d


class TestNativeDecode:
    def test_png_matches_pil(self, image_dir):
        path = str(image_dir / "frame-0.png")
        got = native.decode_gray(path)
        want = images.load_image_gray(path)
        assert got.shape == want.shape
        # PIL uses the same BT.601 luma; integer rounding differs by <1 level
        assert np.abs(got - want).max() <= 1.0

    def test_gray_png_exact(self, image_dir):
        path = str(image_dir / "gray.png")
        got = native.decode_gray(path)
        want = images.load_image_gray(path)
        np.testing.assert_array_equal(got, want)

    def test_jpeg_decodes(self, image_dir):
        path = str(image_dir / "color.jpg")
        got = native.decode_gray(path)
        want = images.load_image_gray(path)
        assert got.shape == want.shape
        assert np.abs(got - want).mean() < 4.0  # JPEG luma path differences

    def test_sequence_prefetch_order(self, image_dir):
        paths = [str(image_dir / f"frame-{i}.png") for i in range(6)]
        seq = native.ImageSequence(paths, queue_depth=2)
        frames = list(seq)
        assert len(frames) == 6
        for p, f in zip(paths, frames):
            np.testing.assert_array_equal(f, native.decode_gray(p))
        seq.close()
