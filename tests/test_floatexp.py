"""Unit tests for the extended-exponent arithmetic (ops/floatexp.py) that
carries extreme-depth δ-orbits (see test_perturb.py's extreme tests for the
end-to-end validation vs mpmath)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fractal_tpu.ops import floatexp as fx


def _vals(seed=0, n=512):
    rng = np.random.default_rng(seed)
    return ((rng.random(n).astype(np.float32) - 0.5)
            * np.exp2(rng.integers(-30, 30, n)).astype(np.float32))


def test_roundtrip():
    x = jnp.asarray(_vals())
    np.testing.assert_array_equal(np.asarray(fx.to_float(fx.fe(x))),
                                  np.asarray(x))


def test_mul_add_match_f64_in_range():
    a, b = _vals(1), _vals(2)
    A, B = fx.fe(jnp.asarray(a)), fx.fe(jnp.asarray(b))
    got_m = np.asarray(fx.to_float(fx.mul(A, B)))
    got_a = np.asarray(fx.to_float(fx.add(A, B)))
    ref_m = (a.astype(np.float64) * b).astype(np.float32)
    ref_a = (a.astype(np.float64) + b).astype(np.float32)
    np.testing.assert_allclose(got_m, ref_m, rtol=2e-7)
    np.testing.assert_allclose(got_a, ref_a, rtol=2e-7, atol=0)


def test_extreme_range_products():
    """1e-100 × 1e-100 ≈ 1e-200 — representable where f32 (and f64 near
    1e-308) dies; relative accuracy stays f32-grade."""
    t = (jnp.float32(0.5), jnp.int32(-332))  # 2⁻³³³ ≈ 5.7e-101
    sq = fx.mul(t, t)
    # (2⁻³³³)² = 2⁻⁶⁶⁶, renormalized to 0.5·2⁻⁶⁶⁵
    assert float(sq[0]) == 0.5 and int(sq[1]) == -665
    # chain 10 squarings: exponent ≈ -333·2¹⁰, mantissa stays normalized
    v = t
    for _ in range(10):
        v = fx.mul(v, v)
    assert 0.5 <= abs(float(v[0])) < 1.0
    assert int(v[1]) < -300000


def test_zero_semantics():
    """A true zero must never flush a live operand during alignment."""
    z = fx.fe(jnp.zeros(3))
    tiny = (jnp.full(3, 0.75, jnp.float32), jnp.full(3, -400, jnp.int32))
    r = fx.add(z, tiny)
    np.testing.assert_array_equal(np.asarray(r[0]), 0.75)
    np.testing.assert_array_equal(np.asarray(r[1]), -400)
    m, e = fx.mul(z, tiny)
    assert (np.asarray(m) == 0).all() and (np.asarray(e) == fx.E_ZERO).all()


def test_alignment_rounds_small_operand_away():
    """> ~150-bit exponent gaps keep the larger operand exactly (the small
    one is below its mantissa's resolution)."""
    big = (jnp.float32(0.75), jnp.int32(10))
    small = (jnp.float32(0.9), jnp.int32(-300))
    r = fx.add(big, small)
    assert float(r[0]) == 0.75 and int(r[1]) == 10


def test_cmul_matches_complex():
    rng = np.random.default_rng(3)
    ar, ai, br, bi = (rng.standard_normal(64).astype(np.float32)
                      for _ in range(4))
    A = (fx.fe(jnp.asarray(ar)), fx.fe(jnp.asarray(ai)))
    B = (fx.fe(jnp.asarray(br)), fx.fe(jnp.asarray(bi)))
    rr, ri = fx.cmul(A[0], A[1], B[0], B[1])
    ref = (ar.astype(np.float64) + 1j * ai) * (br + 1j * bi)
    # cancellation in the real part bounds the error by the TERM magnitudes
    # (standard complex-multiply error model), not the result magnitude
    tol_r = 4e-7 * (np.abs(ar * br) + np.abs(ai * bi)) + 1e-30
    tol_i = 4e-7 * (np.abs(ar * bi) + np.abs(ai * br)) + 1e-30
    assert (np.abs(np.asarray(fx.to_float(rr)) - ref.real) <= tol_r).all()
    assert (np.abs(np.asarray(fx.to_float(ri)) - ref.imag) <= tol_i).all()
