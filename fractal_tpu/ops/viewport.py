"""Pixel-grid → complex-plane viewport transform.

Reference semantics (calc/src/lib.rs:181-197):

    coord_to_space(coord, max, offset, pos, scale) = ((coord/max) − offset)/scale + pos
    re uses max = HEIGHT with offset (width/height)/2   (aspect-correct)
    im uses max = HEIGHT with offset 0.5

Pixel coordinates are the integer indices (no half-pixel centering), x in
[0, width), y in [0, height); im grows downward on screen.  Larger ``scale``
means deeper zoom (division by scale, calc:183).

Built from ``broadcasted_iota`` so it fuses into the escape kernel; no
meshgrid materialized in HBM when jitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_grid(width: int, height: int, pos, scale, dtype=jnp.float32,
               row0: int = 0, rows: int = None):
    """Return (cr, ci) arrays of shape (height, width): the complex-plane
    coordinate of each pixel per the reference transform.

    ``row0``/``rows`` select a horizontal band of the full grid: the shape
    becomes (rows, width) and y runs [row0, row0+rows), still normalized
    by the FULL ``height``.  Row indices are integer-valued in ``dtype``
    (exact below 2²⁴ f32 / 2⁵³ f64) and the transform is elementwise, so a
    band is bit-identical to the same slice of the full grid — banded
    renders (fractal_tpu.tiled) match one-shot renders exactly.  ``row0``
    may be a traced scalar (bands share one compiled program)."""
    pos_re, pos_im = pos
    scale_re, scale_im = scale
    if rows is None:
        rows = height
    h = jnp.asarray(float(height), dtype)
    x = jax.lax.broadcasted_iota(dtype, (rows, width), 1)
    y = (jax.lax.broadcasted_iota(dtype, (rows, width), 0)
         + jnp.asarray(row0).astype(dtype))
    off_re = (float(width) / float(height)) / 2.0
    cr = (x / h - off_re) / jnp.asarray(scale_re, dtype) + jnp.asarray(pos_re, dtype)
    ci = (y / h - 0.5) / jnp.asarray(scale_im, dtype) + jnp.asarray(pos_im, dtype)
    return cr, ci


def xy_to_complex(x: float, y: float, width: int, height: int, pos, scale):
    """Scalar version (python floats, f64) — mirror of xy_to_imaginary
    (calc/src/lib.rs:186-197); used by the viewer for click→coordinate."""
    off_re = (width / height) / 2.0
    re = ((x / height) - off_re) / scale[0] + pos[0]
    im = ((y / height) - 0.5) / scale[1] + pos[1]
    return re, im
