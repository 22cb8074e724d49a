"""Integration smoke matrix: every algo × precision × feature combination
the CLI can express must render without error and produce a sane image.
Catches wiring gaps between components that unit tests miss."""

import numpy as np
import pytest

from fractal_tpu.config import Scene, scene_defaults
from fractal_tpu.render import render

CASES = [
    dict(algo="mandelbrot", precision="f32"),
    dict(algo="mandelbrot", precision="f64", supersample=2),
    dict(algo="mandelbrot", precision="ds32", inside=False),
    dict(algo="mandelbrot", precision="dd64"),
    dict(algo="julia", julia_set=(-0.8, 0.156), precision="f32", smooth=False),
    dict(algo="julia", julia_set=(0.285, 0.01), precision="ds32",
         supersample=2),
    dict(algo="burningship", precision="f32", pos=(-0.45, -0.5)),
    dict(algo="burningship", precision="ds32", pos=(-0.45, -0.5),
         inside=False),
    dict(algo="tricorn", precision="ds32"),
    dict(algo="multibrot", power=3, precision="f32"),
    dict(algo="multibrot", power=5, precision="ds32"),
    dict(algo="julia", power=3, julia_set=(0.443046379971365, 0.558308536),
         precision="f32"),                                  # julia z^3
    dict(algo="julia", power=4, julia_set=(0.443046379971365, 0.558308536),
         precision="ds32"),                                 # julia z^4 ds
    dict(algo="mandelbrot", power=3, precision="ds32"),     # multibrot alias
    dict(algo="mandelbrot", scale=(1e15, 1e15),
         pos=(-0.74364388703715871, 0.13182590420531198)),  # auto→perturb
    dict(algo="julia", julia_set=(-0.8, 0.156), scale=(1e15, 1e15),
         pos=(0.0, 0.0)),                                   # julia perturb
    dict(algo="mandelbrot", scale=(3.0, 0.5)),              # anisotropic
    dict(algo="mandelbrot", exposure=0.0),                  # black output ok
    dict(algo="mandelbrot", limit=4.0, stable_limit=1.0),
]


@pytest.mark.parametrize("kw", CASES,
                         ids=[f"{c['algo']}-{c.get('precision','auto')}-{i}"
                              for i, c in enumerate(CASES)])
def test_combo_renders(kw):
    scene = Scene(width=32, height=24, iterations=60, **kw)
    img = render(scene)
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8


def test_fern_combos():
    for kw in (dict(), dict(fern_replicas=3), dict(supersample=2),
               dict(seed=123, color_weight=0.1)):
        scene = scene_defaults("fern").replace(width=32, height=32,
                                               iterations=50_000, **kw)
        img = render(scene)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
