"""Golden-image regression tests (SURVEY.md §4: "render each [examples.md
recipe] at small resolution, compare against committed goldens").

The scenes are small-scale transcriptions of the reference's examples.md
recipes (classic Mandelbrot defaults, a Julia set, the deep ds32 recipe,
the seeded fern, Burning Ship).  Renders are fully deterministic under the
conftest environment (CPU backend, x64, fixed seeds), so the assertion is
BIT-equality of the pre-encode RGB array — any drift in the kernel math,
viewport, color pipeline, or precision ladder fails here even if the
per-component unit tests happen to miss it.

Regenerate (only after an INTENTIONAL rendering-semantics change, in the
same commit, citing the reference file:line that justifies it):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'PY'
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from tests.test_goldens import GOLDENS, _render
    import numpy as np
    for name, sc in GOLDENS.items():
        np.save(f"tests/goldens/{name}.npy", _render(sc))
    PY
"""

import os

import numpy as np
import pytest

from fractal_tpu.config import Scene, scene_defaults
from fractal_tpu.render import render_u8

GOLDENS = {
    "mandelbrot_default": Scene(width=75, height=50, iterations=50,
                                exposure=5.0),
    "julia_morph": Scene(algo="julia", width=64, height=48, iterations=100,
                         julia_set=(-0.8, 0.156), exposure=5.0),
    "deep_ds32": Scene(width=80, height=40, iterations=300,
                       pos=(-0.7436447860, 0.1318252536),
                       scale=(500000.0, 500000.0), inside=False,
                       exposure=5.0, precision="ds32"),
    "fern_seeded": scene_defaults("fern").replace(width=60, height=60,
                                                  iterations=200000, seed=7),
    "burningship": Scene(algo="burningship", width=64, height=48,
                         iterations=120, pos=(-0.45, -0.5),
                         scale=(0.8, 0.8), exposure=5.0),
}

_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _render(scene):
    return np.asarray(render_u8(scene))


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden(name):
    golden = np.load(os.path.join(_DIR, f"{name}.npy"))
    img = _render(GOLDENS[name])
    np.testing.assert_array_equal(img, golden)
