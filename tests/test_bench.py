"""The driver bench harness must stay parseable in every outcome.

The driver parses exactly ONE JSON line from ``python bench.py``; when the
tunneled device hangs, the fail-fast path must still emit that line (value
null) and carry the last committed-tree session capture so the audit trail
survives the outage (VERDICT r3 #1/#2 class of failure).
"""

import io
import json
import sys

import bench


def test_last_session_capture_reads_committed_evidence():
    rel, data = bench._last_session_capture()
    # the repo ships at least one committed capture (evidence/r4/)
    assert rel is not None and rel.startswith("evidence/")
    assert isinstance(data["value"], (int, float)) and data["value"] > 0
    assert data["unit"] == "ms"
    assert "baseline_configs" in data["details"]


def test_hung_device_path_emits_one_parseable_line(monkeypatch):
    monkeypatch.setattr(bench, "_device_preflight",
                        lambda *a, **k: "simulated hang")
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1
    out = json.loads(lines[0])
    assert out["value"] is None and out["unit"] == "ms"
    assert out["details"]["error"] == "simulated hang"
    cap = out["details"]["last_session_capture"]
    assert cap["value_ms"] > 0
    assert cap["evidence_log"].startswith("evidence/")
    assert "NOT captured by this driver invocation" in cap["note"]


def test_capture_skips_null_value_lines(tmp_path):
    # a log whose last JSON line is itself a hung-device record must be
    # skipped, never echoed back as "evidence"
    ev = tmp_path / "evidence" / "r9"
    ev.mkdir(parents=True)
    (ev / "bench_fresh_hung.log").write_text(
        '{"metric": "m", "value": null, "unit": "ms", "details": {}}\n')
    rel, data = bench._last_session_capture(root=str(tmp_path))
    assert rel is None and data is None
