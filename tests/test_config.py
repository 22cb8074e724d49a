"""Scene/RGB semantics tests (reference Config, calc/src/lib.rs:21-75)."""

import jax
import pytest

from fractal_tpu.config import RGB, Scene, parse_hex_rgb, scene_defaults


def test_escape_defaults_match_reference_effective_values():
    s = scene_defaults("mandelbrot")
    # Config::new defaults (calc/src/lib.rs:39-69), colors post new(r,b,g) swap
    assert (s.width, s.height) == (2000, 1000)
    assert s.iterations == 50
    assert s.limit == 2.0 ** 16
    assert s.stable_limit == 2.0
    assert s.pos == (0.0, 0.0)
    assert s.scale == (0.4, 0.4)
    assert s.exposure == 2.0
    assert s.inside and s.smooth
    assert s.primary_color == RGB(40, 255, 40)      # new(40, 40, 255)
    assert s.secondary_color == RGB(240, 0, 170)    # new(240, 170, 0)
    assert s.color_weight == 0.01


def test_fern_defaults():
    s = scene_defaults("fern")
    assert s.iterations == 10_000_000
    assert s.primary_color == RGB(4, 3, 100)        # new(4, 100, 3)
    assert s.secondary_color == RGB(240, 240, 240)


def test_algo_parsing_case_insensitive_and_barnsleyfern():
    assert scene_defaults("Mandelbrot").algo == "mandelbrot"
    assert scene_defaults("BarnsleyFern").algo == "fern"
    assert scene_defaults("JULIA").algo == "julia"
    with pytest.raises(ValueError):
        scene_defaults("nonsense")


def test_reference_new_swaps_blue_and_green():
    # calc/src/lib.rs:129: new(r, b, g)
    assert RGB.reference_new(1, 2, 3) == RGB(1, 3, 2)


def test_hex_parse_compat_and_true():
    # src/lib.rs:22-28 feeds the swapped constructor: "RRGGBB" → (R, BB, GG)
    assert parse_hex_rgb("102030", compat=True) == RGB(0x10, 0x30, 0x20)
    assert parse_hex_rgb("102030", compat=False) == RGB(0x10, 0x20, 0x30)
    with pytest.raises(ValueError):
        parse_hex_rgb("12345")


def test_scene_is_pytree_with_static_shape_fields():
    s = scene_defaults("julia").replace(julia_set=(-0.8, 0.156))
    leaves, treedef = jax.tree_util.tree_flatten(s)
    s2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert s2 == s
    # changing a dynamic field must not change the treedef (no recompiles)
    s3 = s.replace(pos=(1.0, 2.0), exposure=30.0)
    _, treedef3 = jax.tree_util.tree_flatten(s3)
    assert treedef3 == treedef
    # changing a static field must change the treedef
    s4 = s.replace(width=100)
    _, treedef4 = jax.tree_util.tree_flatten(s4)
    assert treedef4 != treedef


def test_jit_does_not_recompile_on_dynamic_changes():
    import jax.numpy as jnp

    traces = []

    @jax.jit
    def f(scene):
        traces.append(1)
        return jnp.asarray(scene.pos[0]) * scene.width

    s = scene_defaults("mandelbrot")
    f(s)
    f(s.replace(pos=(1.5, 0.5), exposure=9.0))
    assert len(traces) == 1
    f(s.replace(width=123))
    assert len(traces) == 2


def test_validation():
    with pytest.raises(ValueError):
        Scene(width=0)
    with pytest.raises(ValueError):
        Scene(precision="float128")
    with pytest.raises(ValueError):
        RGB(300, 0, 0)
