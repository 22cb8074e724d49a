"""Image encoding — AVIF (reference parity) and PNG.

The reference encodes AVIF via ravif with speed 8, quality 100.0, all-core
threading, YCbCr color space (src/lib.rs:326-333), and unconditionally
appends ".avif" to the output name (src/lib.rs:192-195) — even if it already
ends in .avif.  Both behaviors are replicated (the suffix rule only for the
avif format; the PNG extension follows the same always-append rule).

Encoders, fastest available first:
  * native C++ encoder shim (fractal_tpu.io.native — libpng/libavif), if built;
  * Pillow (AVIF plugin / PNG);
"""

from __future__ import annotations

import numpy as np

# Reference encoder settings (src/lib.rs:326-333).
AVIF_QUALITY = 100
AVIF_SPEED = 8


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
        _to_pil(img).save(
            path, format="AVIF", quality=AVIF_QUALITY, speed=AVIF_SPEED
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
