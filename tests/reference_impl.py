"""Scalar (pure-Python, f64) mirror of the reference's per-pixel math, used
as the test oracle.  Written from the documented semantics in SURVEY.md §2
(calc/src/lib.rs:21-257, src/lib.rs:392-408) — one pixel at a time, exactly
the arithmetic the Rust code performs, including Rust `as u8` cast semantics.
"""

from __future__ import annotations

import math


def rust_u8(x: float) -> int:
    """Rust `f64 as u8`: NaN→0, truncate toward zero, saturate [0, 255]."""
    if math.isnan(x):
        return 0
    if x <= 0.0:
        return 0
    if x >= 255.0:
        return 255
    return int(x)  # truncates toward zero


def coord_to_space(coord, mx, offset, pos, scale):
    return ((coord / mx) - offset) / scale + pos


def xy_to_complex(x, y, width, height, pos, scale):
    re = coord_to_space(float(x), float(height), (width / height) / 2.0, pos[0], scale[0])
    im = coord_to_space(float(y), float(height), 0.5, pos[1], scale[1])
    return re, im


def recursive(iterations, start, c, limit):
    """z ← z² + c with early exit; returns (final z, iteration index).
    Mirrors calc/src/lib.rs:245-257."""
    squared = limit * limit
    pr, pi = start
    cr, ci = c
    for i in range(iterations):
        nr = (pr * pr) - (pi * pi) + cr
        ni = 2.0 * pr * pi + ci
        dist = nr * nr + ni * ni
        if dist > squared:
            return (nr, ni), i
        pr, pi = nr, ni
    return (pr, pi), iterations


def get_pixel(scene, x, y):
    """Full per-pixel pipeline (calc/src/lib.rs:199-235) on a Scene."""
    start = xy_to_complex(x, y, float(scene.width), float(scene.height),
                          scene.pos, scene.scale)
    if scene.algo == "julia":
        (zr, zi), iters = recursive(scene.iterations, start, scene.julia_set,
                                    scene.limit)
    elif scene.algo == "mandelbrot":
        (zr, zi), iters = recursive(scene.iterations, start, start, scene.limit)
    else:
        raise ValueError(scene.algo)

    dist = zr * zr + zi * zi
    if dist > scene.stable_limit:
        iters_f = float(iters)
        if scene.smooth:
            log_zn = math.log2(math.sqrt(dist)) / 2.0
            # math.log2 of a non-positive raises in Python; Rust returns NaN
            try:
                nu = math.log2(log_zn)
            except ValueError:
                nu = float("nan")
            iters_f += 1.0 - nu
        mult = iters_f / float(scene.iterations) * scene.exposure
        # color_multiply routes through the swapped RGB::new(r, b, g)
        # (calc/src/lib.rs:129, 133-139): output fields in true (r, g, b)
        # order are (r·m, b·m, g·m) of the stored color.
        p = scene.primary_color
        return (rust_u8(p.r * mult), rust_u8(p.b * mult), rust_u8(p.g * mult))
    elif scene.inside:
        s = scene.secondary_color
        return (rust_u8(s.r * dist), rust_u8(s.b * dist), rust_u8(s.g * dist))
    return (0, 0, 0)


def render_scalar(scene):
    """Render a full (small!) image pixel-by-pixel — the oracle."""
    import numpy as np

    out = np.zeros((scene.height, scene.width, 3), dtype=np.uint8)
    for y in range(scene.height):
        for x in range(scene.width):
            out[y, x] = get_pixel(scene, x, y)
    return out


def subtract_pixel_once(value, primary, weight):
    """One application of the fern darkening (src/lib.rs:399-406).

    The three darkened channels are fed back through the swapped
    ``RGB::new(r, b, g)`` constructor, so in true (r, g, b) order each hit
    writes r ← r·f(v.r), g ← b·f(v.b), b ← g·f(v.g): the g/b channels
    alternate across hits.
    """

    def factor(vc):
        if vc == 0:
            return 0.0  # 1/(0/255) = inf in Rust f64 ⇒ factor 0
        return 1.0 / ((((1.0 / (vc / 255.0)) - 1.0) * weight) + 1.0)

    pr, pg, pb = value
    vr, vg, vb = primary
    return (rust_u8(pr * factor(vr)),
            rust_u8(pb * factor(vb)),
            rust_u8(pg * factor(vg)))
