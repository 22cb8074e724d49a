"""The driver bench harness must stay parseable in every outcome.

The driver parses exactly ONE JSON line from ``python bench.py`` and
captures only a ~2,000-byte tail of stdout (VERDICT r4 #1: r4's
2,390-byte line clipped the headline fields out of BENCH_r04.json), so:

* the fully-populated line must stay ≤ ``bench.LINE_BUDGET`` (1,800 B)
  with worst-case-width values in every config slot;
* when the tunneled device hangs, the fail-fast path must still emit one
  parseable line (value null) carrying a compact pointer to the last
  committed-tree session capture (VERDICT r3 #1/#2 class of failure).

Behavioral assertions run against tmp_path evidence trees (ADVICE r4:
pruning ``evidence/`` must not silently break the suite); one smoke test
checks the committed tree and skips with a clear message if absent.
"""

import io
import json
import sys

import pytest

import bench

_CAPTURE_LINE = json.dumps({
    "metric": "m", "value": 147.91, "unit": "ms", "vs_baseline": 6.76,
    "details": {"exact_ms": 464.5, "cfg": {}},
})


def _write_capture(root, rnd, value=147.91, name="bench_fresh.log"):
    ev = root / "evidence" / rnd
    ev.mkdir(parents=True, exist_ok=True)
    line = json.dumps({"metric": "m", "value": value, "unit": "ms",
                       "vs_baseline": round(1000.0 / value, 2) if value
                       else None,
                       "details": {"exact_ms": 464.5, "cfg": {}}})
    (ev / name).write_text("some preamble\n" + line + "\n")
    return ev / name


def test_last_session_capture_reads_evidence_tree(tmp_path):
    _write_capture(tmp_path, "r4")
    rel, data = bench._last_session_capture(root=str(tmp_path))
    assert rel == "evidence/r4/bench_fresh.log"
    assert data["value"] == 147.91 and data["unit"] == "ms"


def test_capture_tiebreak_prefers_newer_round(tmp_path):
    # fresh clones share one mtime for every file: the round number must
    # break the tie, numerically (r10 > r9), not lexically (ADVICE r4)
    import os

    paths = [_write_capture(tmp_path, rnd, value=float(i + 1))
             for i, rnd in enumerate(["r4", "r9", "r10"])]
    t = os.path.getmtime(paths[0])
    for p in paths:
        os.utime(p, (t, t))
    rel, data = bench._last_session_capture(root=str(tmp_path))
    assert rel == "evidence/r10/bench_fresh.log"
    assert data["value"] == 3.0


def test_capture_skips_null_value_lines(tmp_path):
    # a log whose last JSON line is itself a hung-device record must be
    # skipped, never echoed back as "evidence"
    ev = tmp_path / "evidence" / "r9"
    ev.mkdir(parents=True)
    (ev / "bench_fresh_hung.log").write_text(
        '{"metric": "m", "value": null, "unit": "ms", "details": {}}\n')
    rel, data = bench._last_session_capture(root=str(tmp_path))
    assert rel is None and data is None


def test_committed_evidence_smoke():
    rel, data = bench._last_session_capture()
    if rel is None:
        pytest.skip("no committed evidence/*/bench_fresh*.log capture in "
                    "this checkout (evidence/ pruned?) — tmp_path tests "
                    "above cover the behavior")
    assert rel.startswith("evidence/")
    assert isinstance(data["value"], (int, float)) and data["value"] > 0


def test_hung_device_path_emits_one_parseable_line(monkeypatch, tmp_path):
    _write_capture(tmp_path, "r5", value=150.0)
    monkeypatch.setattr(bench, "_device_preflight",
                        lambda *a, **k: "simulated hang")
    orig = bench._last_session_capture
    monkeypatch.setattr(bench, "_last_session_capture",
                        lambda root=None: orig(root=str(tmp_path)))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    assert len(lines[0]) <= bench.LINE_BUDGET
    out = json.loads(lines[0])
    assert out["value"] is None and out["unit"] == "ms"
    assert out["details"]["error"] == "simulated hang"
    cap = out["details"]["last_session_capture"]
    assert cap["ms"] == 150.0
    assert cap["log"].startswith("evidence/")
    assert "NOT captured by this driver invocation" in cap["note"]


def test_json_line_fits_driver_capture():
    """The fully-populated driver line — every config slot present, every
    numeric field at worst-case realistic width — must stay within
    LINE_BUDGET so the driver's 2,000-byte tail capture can never clip it
    again (VERDICT r4 #1).  Uses the real assembly path."""
    cfg = {}
    for name in list(bench.baseline_configs()) + list(
            bench.longtail_configs()):
        cfg[name] = {"ms": 99999.9, "mps": 99999.9, "cold": 999999,
                     "warm": 99999, "prec": "perturb", "nres": 999999}
    cfg["jsweep256"] = {"s": 999.99, "fps": 9999.9,
                        "s_minmax": [999.99, 9999.99], "cold": 9999999}
    result = bench.assemble_result(
        p50=9.9999994, times=[9.99999] * 8, t_cold=999.9994, t_warm=99.9994,
        p50_exact=99.99994, t_cold_exact=999.9994, configs=cfg,
        backend="tpu")
    line = json.dumps(result, separators=(",", ":"))
    assert len(line) <= bench.LINE_BUDGET, (
        f"driver JSON line is {len(line)} B fully populated — over the "
        f"{bench.LINE_BUDGET} B budget; shrink keys/values in bench.py")
    # and the emit() guard uses the same serialization
    parsed = json.loads(line)
    assert parsed["details"]["cfg"]["mp100"]["ms"] == 99999.9


def test_tracked_deep_scenes_zero_residual():
    """VERDICT r4 #2 pin: the deep bench scenes (scaled to test size) must
    report RENDER_STATS['n_residual'] == 0 after a full exact render — no
    tracked config ships best-effort pixels."""
    from fractal_tpu.ops.perturb import RENDER_STATS, render_perturb

    scenes = {**bench.baseline_configs(), **bench.longtail_configs()}
    for name in ("dz1e12", "p1e15"):
        sc = scenes[name].replace(width=64, height=48, iterations=600)
        render_perturb(sc)
        assert int(RENDER_STATS.get("n_residual") or 0) == 0, name


def test_config_inventory_stable():
    """The tracked config set: every BASELINE.json config + the long tail
    + the r5 100 MP device row must be present by (short) name."""
    names = set(bench.baseline_configs()) | set(bench.longtail_configs())
    assert {"julia_1080p", "m4k_ss2", "mb3_2k", "dz1e12", "bship_2k",
            "fern_100m", "fern_10m", "p1e15", "fe1e44", "bla1e40",
            "fe1e44_11k", "mp100"} <= names
