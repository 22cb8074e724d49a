"""Full-pipeline pixel parity: vectorized render vs the scalar oracle
(get_recursive_pixel, calc/src/lib.rs:199-235)."""

import numpy as np
import pytest

from fractal_tpu.config import RGB, scene_defaults
from fractal_tpu.render import render
from tests import reference_impl as ref


def _assert_images_equal(got, want, tol=0):
    diff = np.abs(got.astype(int) - want.astype(int))
    if tol == 0:
        np.testing.assert_array_equal(got, want)
    else:
        assert diff.max() <= tol, f"max diff {diff.max()}"


CASES = [
    # (scene overrides, description)
    (dict(), "golden defaults"),
    (dict(smooth=False), "unsmooth"),
    (dict(inside=False), "disable inside"),
    (dict(exposure=5.0, iterations=120), "cli exposure tier"),
    (dict(pos=(-0.7435669, 0.1314023), scale=(400.0, 400.0), iterations=150,
          exposure=10.0), "zoomed recipe"),
    (dict(stable_limit=4.0), "custom stable limit"),
    (dict(primary_color=RGB(1, 2, 3), secondary_color=RGB(200, 100, 50)),
     "custom colors"),
]


@pytest.mark.parametrize("overrides", [c[0] for c in CASES],
                         ids=[c[1] for c in CASES])
def test_mandelbrot_pixel_parity(overrides):
    base = dict(width=31, height=17, pos=(-0.6, 0.0), precision="f64")
    base.update(overrides)
    s = scene_defaults("mandelbrot").replace(**base)
    got = render(s, backend="jnp")
    want = ref.render_scalar(s)
    # smooth coloring uses log2 whose last-ulp may differ between libms;
    # allow ±1 u8 there, exact otherwise
    _assert_images_equal(got, want, tol=1 if s.smooth else 0)


def test_julia_pixel_parity():
    s = scene_defaults("julia").replace(
        width=24, height=16, pos=(0.0, 0.0), julia_set=(-0.8, 0.156),
        iterations=80, exposure=30.0, scale=(0.6, 0.6), precision="f64",
    )
    got = render(s, backend="jnp")
    want = ref.render_scalar(s)
    _assert_images_equal(got, want, tol=1)


def test_supersample_shapes_and_smoothing():
    s = scene_defaults("mandelbrot").replace(
        width=16, height=16, precision="f64", supersample=4
    )
    img = render(s)
    assert img.shape == (16, 16, 3)
    # supersampled render should differ from the non-AA one at edges
    img1 = render(s.replace(supersample=1))
    assert (img != img1).any()


def test_rust_u8_cast_semantics():
    from fractal_tpu.ops.coloring import rust_u8_cast
    import jax.numpy as jnp

    x = jnp.asarray([-5.0, -0.4, 0.0, 0.6, 254.9, 255.0, 300.0, jnp.nan, jnp.inf])
    got = np.asarray(rust_u8_cast(x))
    want = np.array([ref.rust_u8(v) for v in
                     [-5.0, -0.4, 0.0, 0.6, 254.9, 255.0, 300.0,
                      float("nan"), float("inf")]], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)
