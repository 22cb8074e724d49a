"""Escape-time iteration kernel tests vs the scalar oracle
(calc/src/lib.rs:245-257 semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fractal_tpu.models.rules import get_rule
from fractal_tpu.ops.escape_jnp import iterate
from tests import reference_impl as ref

RULE = get_rule("mandelbrot")


def _grid(n=17, lo=-2.2, hi=1.2):
    xs = np.linspace(lo, hi, n)
    ys = np.linspace(-1.6, 1.6, n)
    cr, ci = np.meshgrid(xs, ys)
    return cr, ci


@pytest.mark.parametrize("iterations", [0, 1, 7, 50, 300])
def test_mandelbrot_counts_and_finalz_bitexact_f64(iterations):
    cr, ci = _grid()
    zr, zi, cnt = iterate(
        jnp.asarray(cr), jnp.asarray(ci), jnp.asarray(cr), jnp.asarray(ci),
        iterations, 65536.0, RULE,
    )
    zr, zi, cnt = np.asarray(zr), np.asarray(zi), np.asarray(cnt)
    for idx in np.ndindex(cr.shape):
        (er, ei), ec = ref.recursive(
            iterations, (cr[idx], ci[idx]), (cr[idx], ci[idx]), 65536.0
        )
        assert cnt[idx] == ec, idx
        # XLA:CPU contracts a·a − b·b into FMA (~1 ulp per step), and the
        # dynamics are chaotic, so trajectory differences grow ~2× per
        # iteration; a loose rtol still catches formula-level bugs, while
        # the count equality above pins the escape dynamics exactly.
        tol = max(1e-12, 2.0 ** (min(iterations, 60) - 52))
        assert np.isclose(zr[idx], er, rtol=tol, atol=1e-12), idx
        assert np.isclose(zi[idx], ei, rtol=tol, atol=1e-12), idx


def test_julia_constant_c():
    cr, ci = _grid(n=11)
    c = (-0.8, 0.156)
    zr, zi, cnt = iterate(
        jnp.asarray(cr), jnp.asarray(ci),
        jnp.float64(c[0]), jnp.float64(c[1]),
        120, 65536.0, RULE,
    )
    cnt = np.asarray(cnt)
    for idx in np.ndindex(cr.shape):
        (_, _), ec = ref.recursive(120, (cr[idx], ci[idx]), c, 65536.0)
        assert cnt[idx] == ec


def test_known_points():
    # c = 0: never escapes. c = 2: |z| blows past 2^16 quickly.
    pts_r = jnp.asarray([0.0, 2.0, -1.0])
    pts_i = jnp.asarray([0.0, 0.0, 0.0])
    zr, zi, cnt = iterate(pts_r, pts_i, pts_r, pts_i, 1000, 65536.0, RULE)
    cnt = np.asarray(cnt)
    assert cnt[0] == 1000          # origin is in the set
    assert cnt[1] < 6              # c=2 escapes almost immediately
    assert cnt[2] == 1000          # -1 is in the set (period-2 cycle)


def test_escape_count_semantics_immediate():
    # start already outside: first computed z₁ = z₀² + c escapes ⇒ count 0
    # and z_final is the ESCAPED value (post-update), per calc:248-253.
    r = jnp.asarray([300.0])
    i = jnp.asarray([0.0])
    zr, zi, cnt = iterate(r, i, r, i, 10, 65536.0, RULE)
    assert int(cnt[0]) == 0
    assert float(zr[0]) == 300.0 ** 2 + 300.0


def test_chunking_invariance():
    cr, ci = _grid(n=9)
    args = (jnp.asarray(cr), jnp.asarray(ci), jnp.asarray(cr), jnp.asarray(ci))
    base = iterate(*args, 100, 65536.0, RULE, chunk=1)
    # (chunk sizes kept small: XLA:CPU compile time of the unrolled body
    # grows ~linearly and dominates the suite otherwise)
    for chunk in (3, 40):
        out = iterate(*args, 100, 65536.0, RULE, chunk=chunk)
        for a, b in zip(base, out):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_f32_close_to_f64_shallow():
    cr, ci = _grid(n=9)
    a32 = iterate(
        jnp.asarray(cr, jnp.float32), jnp.asarray(ci, jnp.float32),
        jnp.asarray(cr, jnp.float32), jnp.asarray(ci, jnp.float32),
        60, 65536.0, RULE,
    )
    a64 = iterate(
        jnp.asarray(cr), jnp.asarray(ci), jnp.asarray(cr), jnp.asarray(ci),
        60, 65536.0, RULE,
    )
    # counts match except possibly at the boundary (grid points are generic)
    c32, c64 = np.asarray(a32[2]), np.asarray(a64[2])
    assert (c32 == c64).mean() > 0.95


def test_burning_ship_and_tricorn_rules():
    bs = get_rule("burningship")
    zr, zi = bs(jnp.asarray([-1.0]), jnp.asarray([-2.0]),
                jnp.asarray([0.5]), jnp.asarray([0.25]))
    # (|−1| + i·|−2|)² = (1+2i)² = −3 + 4i, plus c
    assert float(zr[0]) == -3.0 + 0.5
    assert float(zi[0]) == 4.0 + 0.25

    tc = get_rule("tricorn")
    zr, zi = tc(jnp.asarray([1.0]), jnp.asarray([2.0]),
                jnp.asarray([0.0]), jnp.asarray([0.0]))
    # conj(1+2i)² = (1−2i)² = −3 − 4i
    assert float(zr[0]) == -3.0
    assert float(zi[0]) == -4.0


def test_multibrot_power_matches_complex_pow():
    # --power is honored by the whole z^d family (multibrot by definition;
    # mandelbrot/julia via the r3 extension) — all three must share the rule
    for algo in ("multibrot", "mandelbrot", "julia"):
        rule = get_rule(algo, power=5)
        z = 0.7 + 0.3j
        c = -0.2 + 0.1j
        zr, zi = rule(jnp.asarray([z.real]), jnp.asarray([z.imag]),
                      jnp.asarray([c.real]), jnp.asarray([c.imag]))
        want = z ** 5 + c
        assert np.isclose(float(zr[0]), want.real, rtol=1e-12), algo
        assert np.isclose(float(zi[0]), want.imag, rtol=1e-12), algo


def test_periodicity_detection_matches_plain():
    """Interior cycle detection (inside=False fast path) must not change a
    single count: escaped pixels are untouched and interior pixels report
    cnt == iterations either way (no false positives on a set-heavy view)."""
    import jax
    import numpy as np
    from fractal_tpu.ops.escape_pallas import iterate_whole_jnp, scene_params
    from fractal_tpu.config import Scene

    scene = Scene(width=96, height=72, iterations=400, inside=False,
                  pos=(-0.6, 0.0), scale=(0.4, 0.4))
    params = scene_params(scene)
    kw = dict(algo="mandelbrot", power=2, iterations=400,
              precision="ds32", height=72, width=96)
    _, _, c_off = jax.jit(lambda p: iterate_whole_jnp(p, periodicity=False, **kw))(params)
    _, _, c_on = jax.jit(lambda p: iterate_whole_jnp(p, periodicity=True, **kw))(params)
    c_off, c_on = np.asarray(c_off), np.asarray(c_on)
    assert (c_off == 400).mean() > 0.15  # the view really contains the set
    np.testing.assert_array_equal(c_on, c_off)
