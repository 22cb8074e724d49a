"""Double-word arithmetic unit tests (ops/dd.py) against f64 oracles.

ds32 pairs carry ~48 mantissa bits; every op is checked to stay well inside
that budget on random inputs spanning the magnitudes the escape kernels see.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fractal_tpu.ops import dd


def _rand_dd(rng, n, scale=1.0):
    # canonical pairs: |lo| <= ulp(hi)/2 (relative 2^-25 of hi)
    hi = (rng.standard_normal(n) * scale).astype(np.float32)
    lo = (rng.standard_normal(n) * np.abs(hi) * 2.0 ** -26).astype(np.float32)
    return (jnp.asarray(hi), jnp.asarray(lo))


def _val(x):
    return np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)


REL = 2.0 ** -44  # comfortably inside the ~2^-48 design target


def test_add_mul_sqr_vs_f64():
    rng = np.random.default_rng(42)
    x = _rand_dd(rng, 512)
    y = _rand_dd(rng, 512)
    for op, ref in [
        (dd.add, lambda a, b: a + b),
        (dd.sub, lambda a, b: a - b),
        (dd.mul, lambda a, b: a * b),
    ]:
        got = _val(op(x, y))
        want = ref(_val(x), _val(y))
        err = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
        assert err.max() < REL, (op.__name__, err.max())
    got = _val(dd.sqr(x))
    want = _val(x) ** 2
    assert (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max() < REL


def test_from_f64_roundtrip():
    vals = np.array([-0.7436447860, 0.1318252536, 1e-12, 65536.0])
    pair = dd.from_f64(vals)
    np.testing.assert_allclose(_val(pair), vals, rtol=2.0 ** -45)


def test_split_str_deep_coordinate():
    hi, lo = dd.split_str("-0.743644786131252537")
    v = float(hi) + float(lo)
    assert abs(v - (-0.743644786131252537)) < 1e-14


def test_quad_step_matches_composed_ops():
    """The fused z←z²+c step must agree with the composed dd ops to the
    renormalization-noise level on escape-kernel-realistic magnitudes."""
    rng = np.random.default_rng(7)
    for scale in (1.0, 1e-6, 1e3):
        zr = _rand_dd(rng, 1024, scale)
        zi = _rand_dd(rng, 1024, scale)
        cr = _rand_dd(rng, 1024)
        ci = _rand_dd(rng, 1024)
        fr, fi = dd.quad_step(zr, zi, cr, ci)
        want_r = _val(zr) ** 2 - _val(zi) ** 2 + _val(cr)
        want_i = 2.0 * _val(zr) * _val(zi) + _val(ci)
        mag = np.maximum(
            np.maximum(_val(zr) ** 2, _val(zi) ** 2), np.abs(_val(cr))
        ) + 1e-30
        assert (np.abs(_val(fr) - want_r) / mag).max() < REL
        magi = np.maximum(2 * np.abs(_val(zr) * _val(zi)), np.abs(_val(ci))) + 1e-30
        assert (np.abs(_val(fi) - want_i) / magi).max() < REL
        # tricorn sign
        tr, ti = dd.quad_step(zr, zi, cr, ci, cross_sign=-1.0)
        want_ti = -2.0 * _val(zr) * _val(zi) + _val(ci)
        assert (np.abs(_val(ti) - want_ti) / magi).max() < REL


def test_quad_step_orbit_vs_f64():
    """Iterate a whole orbit near the boundary with the fused step: the
    trajectory must track an f64 orbit to ds32 precision for many steps."""
    c = (-0.7436447860 + 1e-7, 0.1318252536)
    zr = dd.from_f64(np.array([c[0]]))
    zi = dd.from_f64(np.array([c[1]]))
    cr = dd.from_f64(np.array([c[0]]))
    ci = dd.from_f64(np.array([c[1]]))
    wr, wi = c[0], c[1]
    for n in range(60):
        zr, zi = dd.quad_step(zr, zi, cr, ci)
        wr, wi = wr * wr - wi * wi + c[0], 2 * wr * wi + c[1]
        if wr * wr + wi * wi > 4e9:
            break
    assert abs(_val(zr)[0] - wr) < 1e-10 * max(abs(wr), 1.0)
    assert abs(_val(zi)[0] - wi) < 1e-10 * max(abs(wi), 1.0)


def test_dd64_render_beyond_f64():
    """dd64 (double-double on f64 words, ~2^-106) must resolve structure at
    1e16x zoom where plain f64 collapses every pixel to the same c, and its
    counts must match direct 45-digit mpmath iteration on sampled pixels."""
    from fractal_tpu.config import Scene
    from fractal_tpu.render import render_u8
    from fractal_tpu.ops.escape_pallas import iterate_whole_jnp, scene_params
    from fractal_tpu.ops.perturb import _affine_fractions
    from tests.test_perturb import _mpmath_count
    import jax.numpy as jnp

    # window straddling the needle tip at c = -2: the boundary crosses the
    # view, counts vary (30..139) and stay well-conditioned (cheap mpmath).
    w, h = 16, 12
    scene = Scene(width=w, height=h, iterations=300,
                  pos=(-2.0, 0.0),
                  scale=(1e16, 1e16), precision="dd64")
    params = scene_params(scene, h, w, dtype=jnp.float64)
    _, _, cnt = jax.jit(
        lambda p: iterate_whole_jnp(p, algo="mandelbrot", power=2,
                                    iterations=300, precision="dd64",
                                    height=h, width=w)
    )(params)
    cnt = np.asarray(cnt)
    assert len(np.unique(cnt)) > 1  # resolves sub-f64 structure
    (Ar, Cr), (Ai, Ci) = _affine_fractions(w, h, scene.pos, scene.scale)
    checked = 0
    for (x, y) in [(0, 0), (8, 6), (15, 11), (3, 9), (5, 2), (12, 6)]:
        truth = _mpmath_count(Ar * x + Cr, Ai * y + Ci, 300, scene.limit)
        # pixels that never escape sit ON the needle (measure-zero,
        # infinitely ill-conditioned: the center pixel is exactly c = -2);
        # compare only escaping, well-conditioned samples.
        if truth < 250:
            assert cnt[y, x] == truth, (x, y, cnt[y, x], truth)
            checked += 1
    assert checked >= 3

    img = np.asarray(render_u8(scene))  # full pipeline routes dd64
    assert img.shape == (12, 16, 3)
