"""Animation sweep tests (fractal_tpu.animate) — the BASELINE.json
julia-sweep config: N frames over a c-path batched into one program."""

import numpy as np
import pytest

from fractal_tpu.animate import julia_sweep, render_sweep
from fractal_tpu.config import Scene
from fractal_tpu.render import render


def test_julia_sweep_frames_match_single_renders():
    out = julia_sweep(frames=6, width=64, height=48, iterations=60)
    assert out.shape == (6, 48, 64, 3) and out.dtype == np.uint8
    # every frame must equal the standalone render of its scene
    from fractal_tpu.animate import julia_c_path

    cs = julia_c_path(np.linspace(0, 1, 6, endpoint=False))
    for i in (0, 3, 5):
        one = render(Scene(algo="julia", width=64, height=48, iterations=60,
                           julia_set=(float(cs[i, 0]), float(cs[i, 1])),
                           pos=(0.0, 0.0), scale=(0.4, 0.4)))
        np.testing.assert_array_equal(out[i], one)


def test_sweep_over_zoom_path():
    scenes = [Scene(width=48, height=32, iterations=50,
                    pos=(-0.6, 0.0), scale=(0.4 * 1.3 ** k, 0.4 * 1.3 ** k))
              for k in range(5)]
    out = render_sweep(scenes)
    assert out.shape == (5, 32, 48, 3)
    assert len({out[i].tobytes() for i in range(5)}) == 5


def test_sweep_rejects_static_mismatch():
    scenes = [Scene(width=48, height=32, iterations=50),
              Scene(width=48, height=32, iterations=60)]
    with pytest.raises(ValueError, match="static scene structure"):
        render_sweep(scenes)
