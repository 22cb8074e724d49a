"""Viewport transform tests (calc/src/lib.rs:181-197)."""

import jax.numpy as jnp
import numpy as np

from fractal_tpu.ops.viewport import pixel_grid, xy_to_complex
from tests import reference_impl as ref


def test_matches_scalar_reference_bitexact():
    w, h = 37, 23
    pos, scale = (-0.6, 0.25), (0.4, 0.7)
    cr, ci = pixel_grid(w, h, pos, scale, dtype=jnp.float64)
    cr, ci = np.asarray(cr), np.asarray(ci)
    for y in range(h):
        for x in range(w):
            er, ei = ref.xy_to_complex(x, y, w, h, pos, scale)
            assert cr[y, x] == er
            assert ci[y, x] == ei


def test_center_pixel_maps_to_pos():
    # x = width/2 → re = pos.re exactly; y = height/2 → im = pos.im
    w, h = 64, 32
    pos = (-0.743, 0.131)
    cr, ci = pixel_grid(w, h, pos, (400.0, 400.0), dtype=jnp.float64)
    assert np.asarray(cr)[0, w // 2] == pos[0]
    assert np.asarray(ci)[h // 2, 0] == pos[1]


def test_aspect_correction_uses_height_for_both_axes():
    # A 2:1 image spans twice the re-range of the im-range (calc:194-195).
    w, h = 100, 50
    cr, ci = pixel_grid(w, h, (0.0, 0.0), (1.0, 1.0), dtype=jnp.float64)
    re_span = float(cr[0, -1] - cr[0, 0])
    im_span = float(ci[-1, 0] - ci[0, 0])
    assert np.isclose(re_span / im_span, (w - 1) / (h - 1))


def test_larger_scale_zooms_in():
    w, h = 10, 10
    cr1, _ = pixel_grid(w, h, (0.0, 0.0), (1.0, 1.0), dtype=jnp.float64)
    cr2, _ = pixel_grid(w, h, (0.0, 0.0), (10.0, 10.0), dtype=jnp.float64)
    assert float(cr2.max() - cr2.min()) < float(cr1.max() - cr1.min())


def test_scalar_helper_matches_grid():
    w, h = 16, 16
    pos, scale = (0.29449, -0.4046), (2.0, 3.0)
    cr, ci = pixel_grid(w, h, pos, scale, dtype=jnp.float64)
    r, i = xy_to_complex(5, 7, w, h, pos, scale)
    assert np.asarray(cr)[7, 5] == r
    assert np.asarray(ci)[7, 5] == i
