"""Output layer: image encoding (AVIF/PNG) and the --open launcher."""

from fractal_tpu.io.image_out import encode_image, write_image, output_filename
from fractal_tpu.io.open_file import open_in_viewer

__all__ = ["encode_image", "write_image", "output_filename", "open_in_viewer"]
