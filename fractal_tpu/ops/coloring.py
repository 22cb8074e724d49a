"""Coloring epilogue — vectorized XLA port of the per-pixel classify/color
stage (``get_recursive_pixel`` tail, calc/src/lib.rs:214-234, and
``color_multiply``, calc/src/lib.rs:133-139).

Semantics replicated exactly (SURVEY.md "Quirks" 2-5):
  * ``stable_limit`` (default 2.0) is compared against the *squared* final
    distance (calc:216) — inside radius is √2, not 2.
  * the smooth term is the log₂-based variant (calc:219-226):
        log_zn = log2(sqrt(dist)) / 2;  nu = log2(log_zn);  iters += 1 − nu
  * brightness: mult = iters / max_iters * exposure; color = primary · mult.
  * inside shading is secondary · dist (squared distance!), or black when
    ``inside`` is disabled (calc:230-234).
  * float→u8 uses Rust ``as`` cast semantics: truncate toward zero, saturate
    to [0, 255], NaN → 0 (calc:133-139).
  * ``color_multiply`` builds its result through the swapped ``RGB::new(r, b,
    g)`` constructor (calc:129, 133-139), so its output fields are
    (r·m, b·m, g·m) in true (r, g, b) order — the g and b channels of the
    *stored* color swap at render time.  Scene colors are stored exactly as
    the reference stores them (post-constructor swap), and this module
    applies the second, render-time swap; the two swaps cancel, so the
    literal ``Config::new`` values (blue primary (40,40,255), orange
    secondary (240,170,0)) are what actually lands in the image — matching
    the reference binary and its checked-in blue-dominant screenshot.
"""

from __future__ import annotations

import jax.numpy as jnp


def rust_u8_cast(x):
    """Rust `f64 as u8`: NaN→0, truncate toward zero, saturate to [0,255]."""
    x = jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)
    return jnp.clip(jnp.trunc(x), 0.0, 255.0).astype(jnp.uint8)


def smooth_iters(cnt, dist, smooth: bool):
    """Fractional iteration count with the reference's smooth term applied
    unconditionally on the escaped branch (calc:217-226)."""
    iters_f = cnt.astype(dist.dtype)
    if not smooth:
        return iters_f
    log_zn = jnp.log2(jnp.sqrt(dist)) / 2.0
    nu = jnp.log2(log_zn)
    return iters_f + (1.0 - nu)


def color_escape_result(
    zr,
    zi,
    cnt,
    *,
    iterations: int,
    stable_limit,
    exposure,
    primary_color,
    secondary_color,
    inside: bool,
    smooth: bool,
    as_float: bool = False,
):
    """Map iteration results to an (H, W, 3) image.

    Args mirror Scene fields; colors are (r, g, b) int tuples.
    ``as_float=True`` returns the pre-cast float image (used by the
    supersampling downsample path, which averages before the u8 cast).
    """
    return color_escape_result_dist(
        zr * zr + zi * zi, cnt, iterations=iterations,
        stable_limit=stable_limit, exposure=exposure,
        primary_color=primary_color, secondary_color=secondary_color,
        inside=inside, smooth=smooth, as_float=as_float)


def color_escape_result_dist(
    dist,
    cnt,
    *,
    iterations: int,
    stable_limit,
    exposure,
    primary_color,
    secondary_color,
    inside: bool,
    smooth: bool,
    as_float: bool = False,
):
    """``color_escape_result`` from the squared final distance directly.

    The reference's classify/color tail (calc/src/lib.rs:214-234) consumes
    only |z|² — dist-emitting kernels (the p32 fast tier's ``dist_only``
    δ-orbit kernel) skip materializing zr/zi entirely and color through
    this entry; passing ``dist == zr²+zi²`` here is bit-identical to
    ``color_escape_result(zr, zi, ...)``.
    """
    dtype = jnp.result_type(dist)
    escaped = dist > jnp.asarray(stable_limit, dtype)

    iters_f = smooth_iters(cnt, dist, smooth)
    mult = iters_f / jnp.asarray(float(iterations), dtype) * jnp.asarray(exposure, dtype)

    # color_multiply's render-time g/b swap (calc:129, 133-139): the output
    # channels are (stored.r, stored.b, stored.g) · mult.
    p, s = primary_color, secondary_color
    prim = jnp.asarray((p[0], p[2], p[1]), dtype)  # (3,)
    sec = jnp.asarray((s[0], s[2], s[1]), dtype)   # (3,)

    out_escaped = prim * mult[..., None]
    if inside:
        out_inside = sec * dist[..., None]
    else:
        out_inside = jnp.zeros_like(out_escaped)

    img = jnp.where(escaped[..., None], out_escaped, out_inside)
    if as_float:
        # NaN/clamp handling still applied so averaging matches cast-then-avg
        # closely; truncation happens only at the final cast.
        return jnp.where(jnp.isnan(img), jnp.zeros_like(img), img)
    return rust_u8_cast(img)


def downsample_box(img_float, factor: int):
    """k×k box filter for supersampled anti-aliasing (framework extension;
    the reference has no AA).  Average in float, then cast."""
    if factor == 1:
        return rust_u8_cast(img_float)
    h, w, c = img_float.shape
    img = img_float.reshape(h // factor, factor, w // factor, factor, c)
    return rust_u8_cast(img.mean(axis=(1, 3)))
