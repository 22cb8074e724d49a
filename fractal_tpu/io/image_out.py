"""Image encoding — AVIF (reference parity) and PNG.

The reference encodes AVIF via ravif with speed 8, quality 100.0, all-core
threading, YCbCr color space (src/lib.rs:326-333), and unconditionally
appends ".avif" to the output name (src/lib.rs:192-195) — even if it already
ends in .avif.  Both behaviors are replicated (the suffix rule only for the
avif format; the PNG extension follows the same always-append rule).

AVIF parity notes (vs ravif's Config, src/lib.rs:326-333): the primary
encode path is our native C++ shim (native/fastimg.cpp) over the system
libheif→libaom AV1 encoder — the same native-encoder architecture as the
reference's ravif→rav1e.  Settings map one-for-one: quality 100 / speed 8
(aom cpu-used); color space: libheif converts RGB→YCbCr for AV1 exactly as
ravif's `ColorSpace::YCbCr`, chroma 4:4:4 (no subsampling) requested to
match ravif; threads 0 = encoder default all-core behavior.  Near-lossless:
YCbCr round-trip error ≤ ~2/255, covered by the decode-roundtrip tests in
tests/test_native_io.py.  Fallback when the shim or libheif is missing:
Pillow's native `_avif` C extension over libavif+libaom with the same
knobs (``subsampling="4:4:4"``, ``range="full"``).
"""

from __future__ import annotations

import numpy as np

# Reference encoder settings (src/lib.rs:326-333).
AVIF_QUALITY = 100
AVIF_SPEED = 8
AVIF_SUBSAMPLING = "4:4:4"   # ravif encodes RGB without chroma subsampling
AVIF_RANGE = "full"


def output_filename(name: str, fmt: str = "avif") -> str:
    """Append the format suffix unconditionally — `format!("{}.avif", f)`
    (src/lib.rs:192-195): "output" → "output.avif", "a.avif" → "a.avif.avif"."""
    return f"{name}.{fmt}"


def _to_pil(img: np.ndarray):
    from PIL import Image

    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {img.shape} {img.dtype}")
    return Image.fromarray(img, mode="RGB")


def encode_image(img: np.ndarray, path: str) -> None:
    """Encode (H, W, 3) uint8 to `path`; format chosen by extension."""
    lower = path.lower()
    if lower.endswith(".png"):
        from fractal_tpu.io import native

        if native.available():
            native.write_png(img, path)
            return
        _to_pil(img).save(path, format="PNG")
    elif lower.endswith(".avif"):
        from fractal_tpu.io import native

        if native.avif_available():
            img = np.ascontiguousarray(img)
            if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
                raise ValueError(
                    f"expected (H, W, 3) uint8, got {img.shape} {img.dtype}")
            native.write_avif(img, path, quality=AVIF_QUALITY,
                              speed=AVIF_SPEED)
            return
        _to_pil(img).save(
            path, format="AVIF", quality=AVIF_QUALITY, speed=AVIF_SPEED,
            subsampling=AVIF_SUBSAMPLING, range=AVIF_RANGE,
        )
    else:
        _to_pil(img).save(path)


def write_image(img: np.ndarray, name: str, fmt: str = "avif", verbose: bool = True) -> str:
    """Full write path (reference write_image/image_to_data,
    src/lib.rs:245-251, 324-344), including its progress prints."""
    path = output_filename(name, fmt)
    if verbose:
        print("Starting encode.")
    encode_image(img, path)
    if verbose:
        print(f'Finished encode. Writing file "{path}".')
    return path
