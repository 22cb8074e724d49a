"""Native C++ encoder tests (native/fastimg.cpp via ctypes bindings).

The .so is built on demand from source; if the toolchain is missing the
tests skip and Pillow covers encoding (io/image_out.py fallback order).
"""

import numpy as np
import pytest

from fractal_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native encoder not built (no toolchain?)"
)


def _rand_img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_png_roundtrip(tmp_path):
    from PIL import Image

    img = _rand_img(37, 53)
    p = str(tmp_path / "x.png")
    native.write_png(img, p)
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, img)


def test_png_compression_levels(tmp_path):
    from PIL import Image

    img = _rand_img(64, 64, seed=1)
    sizes = {}
    for lvl in (1, 6, 9):
        p = str(tmp_path / f"l{lvl}.png")
        native.write_png(img, p, compression=lvl)
        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, img)
        sizes[lvl] = len(open(p, "rb").read())
    assert sizes[9] <= sizes[1] * 1.2  # lossless at every level, sane sizes


def test_encode_image_prefers_native(tmp_path):
    from fractal_tpu.io.image_out import encode_image
    from PIL import Image

    img = _rand_img(20, 30, seed=2)
    p = str(tmp_path / "y.png")
    encode_image(img, p)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), img)
