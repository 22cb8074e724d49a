"""Viewer tests — the reference GUI's defining behaviors (SURVEY.md §2 C16):
one in-flight render with latest-wins coalescing (gui.rs:37-48), algorithm
switch resetting all settings (gui.rs:334-339), and the 2× screenshot
(gui.rs:319-328)."""

import json
import time
import urllib.request as rq

import numpy as np
import pytest

from fractal_tpu.cli import parse_options
from fractal_tpu.viewer import scene_from_dict, scene_to_dict, start
from fractal_tpu.config import Scene, RGB


def test_scene_json_roundtrip():
    s = Scene(algo="julia", width=64, height=48, julia_set=(-0.8, 0.156),
              primary_color=RGB(1, 2, 3))
    s2 = scene_from_dict(json.loads(json.dumps(scene_to_dict(s))))
    assert s2 == s


@pytest.fixture(scope="module")
def server():
    opts = parse_options(["64", "48", "-o", "/tmp/viewer_test_shot",
                          "--format", "png"])
    srv = start(opts, port=8791, open_browser=False, block=False)
    yield "http://127.0.0.1:8791"
    srv.shutdown()


def _get(base, p):
    r = rq.urlopen(base + p, timeout=60)
    return r.headers, r.read()


def _post(base, p, obj):
    req = rq.Request(base + p, json.dumps(obj).encode(), method="POST")
    return json.loads(rq.urlopen(req, timeout=30).read() or b"{}")


def test_render_and_coalescing(server):
    h, png = _get(server, "/image?gen=-1")
    # wait for the first render
    for _ in range(120):
        h, png = _get(server, "/image")
        if int(h["X-Gen"]) >= 1 and png[:4] == b"\x89PNG":
            break
        time.sleep(0.5)
    g0 = int(h["X-Gen"])
    assert png[:4] == b"\x89PNG"

    scene = json.loads(_get(server, "/scene")[1])
    # Make each render slower than the posting burst, else the worker keeps
    # up and no coalescing is needed (the reference behaves the same).
    scene["width"], scene["height"] = 512, 512
    scene["iterations"] = 2000
    _post(server, "/config", scene)
    time.sleep(0.1)
    g0 = int(_get(server, "/image")[0]["X-Gen"])
    for i in range(15):  # rapid-fire config changes
        scene["exposure"] = 5.0 + i * 0.01
        _post(server, "/config", scene)
    deadline = time.time() + 60
    while time.time() < deadline:
        time.sleep(1.0)
        h, _ = _get(server, "/image")
        # wait until the worker drains (last exposure rendered)
        if float(h["X-Render-Ms"]) > 0 and int(h["X-Gen"]) >= g0 + 1:
            break
    time.sleep(2.0)
    gend = int(_get(server, "/image")[0]["X-Gen"])
    assert 1 <= gend - g0 <= 5  # coalesced: nowhere near 15 renders
    # restore small dims for the remaining tests
    scene["width"], scene["height"], scene["iterations"] = 64, 48, 50
    _post(server, "/config", scene)


def test_algo_reset_keeps_dims(server):
    d = _post(server, "/reset", {"algo": "fern"})
    assert d["algo"] == "fern"
    assert d["iterations"] == 10_000_000  # Config::new(fern) default
    assert (d["width"], d["height"]) == (64, 48)
    assert d["secondary_color"] == [240, 240, 240]
    _post(server, "/reset", {"algo": "mandelbrot"})


def test_apply_nav_exact_pan_past_f64():
    """VERDICT r1 item 7: panning must survive past the f64 grid.  At depth
    a 40-pixel pan is ~4e-26 — far below f64 ulp at |x|~0.74 — yet the
    exact position must move and the rendered view must change."""
    from fractions import Fraction

    from fractal_tpu.config import exact_pos
    from fractal_tpu.render import render
    from fractal_tpu.viewer import apply_nav

    # the needle view of test_exact_string_center_beyond_f64: structure at
    # every scale, so a sub-f64 shift is visible
    scene = Scene(width=24, height=16, iterations=300,
                  pos_str=("-1.999999999999999999999999999",
                           "0.0000000000000000000000000035"),
                  scale=(1e26, 1e26))
    # pre-scale pan step of 40 pixels: du = px / height
    moved = apply_nav(scene, pan=(40.0 / 16.0, 0.0))
    e0, _ = exact_pos(scene)
    e1, _ = exact_pos(moved)
    assert e1 - e0 == Fraction(40, 16) / Fraction(1e26)
    # the f64 pos cannot represent the shift...
    assert float(e1) == float(e0)
    # ...but the render sees it
    a = render(scene)
    b = render(moved)
    assert (a != b).any(), "deep pan did not change the rendered view"
    # zoom multiplies scale only
    z = apply_nav(scene, zoom=2.0)
    assert z.scale == (2e26, 2e26) and z.pos_str == scene.pos_str


def test_nav_endpoint(server):
    scene = json.loads(_get(server, "/scene")[1])
    out = _post(server, "/nav", {"pan": [0.25, 0.0]})
    assert abs(out["pos"][0] - (scene["pos"][0] + 0.25 / scene["scale"][0])) < 1e-12
    assert out["pos_str"] is not None
    out2 = _post(server, "/nav", {"zoom": 2.0})
    assert abs(out2["scale"][0] - 2 * out["scale"][0]) < 1e-9


def _drain(server, g0, timeout=120.0):
    """Wait until the render generation passes g0 (no render left in
    flight — a worker busy at module teardown crashes the interpreter)."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        h, png = _get(server, "/image")
        if int(h["X-Gen"]) > g0 and png[:4] == b"\x89PNG":
            return int(h["X-Gen"])
        time.sleep(0.5)
    raise AssertionError("viewer render did not finish")


def test_config_accepts_p32_fast_preview(server):
    scene = json.loads(_get(server, "/scene")[1])
    g0 = int(_get(server, "/image")[0]["X-Gen"])
    scene["precision"] = "p32"
    scene["scale"] = [1e6, 1e6]
    scene["pos"] = [-0.7436447860, 0.1318252536]
    _post(server, "/config", scene)
    out = json.loads(_get(server, "/scene")[1])
    assert out["precision"] == "p32"
    g1 = _drain(server, g0)          # the p32 render completed
    scene["precision"] = "auto"
    scene["scale"] = [0.4, 0.4]
    scene["pos"] = [-0.6, 0.0]
    _post(server, "/config", scene)
    _drain(server, g1)               # queue empty before module teardown
