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
