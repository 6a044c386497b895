"""Outage-proofing of the benchmark harness (round-3 lesson: a tunnel
outage turned the whole round's record into rc=124/parsed:null).

These tests pin the recovery behavior of bench.py and
tools/run_suite_retry.py WITHOUT a backend: fail-fast fallback lines,
checkpoint replay, and per-scenario log accounting.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_emit_writes_checkpoint(tmp_path, monkeypatch, capsys):
    bench = _load(os.path.join(REPO, "bench.py"), "bench_mod")
    monkeypatch.setattr(bench, "CHECKPOINT", str(tmp_path / "ck.json"))
    bench.emit(50_000.0, [48_000.0, 50_000.0, 52_000.0], final=False)
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec["value"] == 50000.0
    assert rec["partial"] == "3 passes"
    assert rec["vs_baseline"] == round(50000.0 / 2532.0, 3)
    ck = json.loads((tmp_path / "ck.json").read_text())
    assert ck["final"] is False and len(ck["passes"]) == 3

    bench.emit(51_000.0, [1.0] * 5, final=True)
    ck = json.loads((tmp_path / "ck.json").read_text())
    assert ck["final"] is True
    rec = json.loads(capsys.readouterr().out.strip())
    assert "partial" not in rec


def test_bench_outage_fallback_replays_final_checkpoint(
    tmp_path, monkeypatch, capsys
):
    bench = _load(os.path.join(REPO, "bench.py"), "bench_mod2")
    monkeypatch.setattr(bench, "CHECKPOINT", str(tmp_path / "ck.json"))
    # no checkpoint: explicit error record, exit 1
    try:
        bench.emit_outage_fallback("backend down")
    except SystemExit as e:
        assert e.code == 1
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 0 and rec["error"] == "backend down"

    # final checkpoint present: replay with provenance, exit 0
    bench.emit(60_000.0, [1.0] * 5, final=True)
    capsys.readouterr()
    try:
        bench.emit_outage_fallback("backend down again")
    except SystemExit as e:
        assert e.code == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 60000.0
    assert rec["from_checkpoint"] is True
    assert rec["outage"] == "backend down again"

    # partial checkpoints must NOT replay
    bench.emit(61_000.0, [1.0, 2.0], final=False)
    capsys.readouterr()
    try:
        bench.emit_outage_fallback("down")
    except SystemExit as e:
        assert e.code == 1
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 0


def test_runner_recorded_scenarios_and_bench_tagging(tmp_path):
    runner = _load(
        os.path.join(REPO, "tools", "run_suite_retry.py"), "runner_mod"
    )
    log = tmp_path / "suite.log"
    log.write_text(
        json.dumps({"scenario": "query_eng", "qps": 1.0})
        + "\n"
        + "not json\n"
        + json.dumps({"metric": "x", "value": 2})  # untagged bench line
        + "\n"
        + json.dumps({"scenario": "learn", "inputs_per_s": 3})
        + "\n"
    )
    done = runner.recorded_scenarios(str(log))
    assert done == {"query_eng", "learn"}


def test_runner_skips_partial_bench_lines(tmp_path, monkeypatch):
    runner = _load(
        os.path.join(REPO, "tools", "run_suite_retry.py"), "runner_mod2"
    )
    log = tmp_path / "suite.log"

    class FakeProc:
        returncode = 0
        stderr = ""
        stdout = (
            json.dumps({"metric": "m", "value": 1, "partial": "2 passes"})
            + "\n"
            + json.dumps({"metric": "m", "value": 0, "error": "down"})
            + "\n"
            + json.dumps({"metric": "m", "value": 5, "vs_baseline": 2.0})
            + "\n"
        )

    monkeypatch.setattr(
        runner.subprocess, "run", lambda *a, **k: FakeProc()
    )
    ok = runner.run_scenario("bench", str(log))
    assert ok
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    # only the complete final line lands, tagged as the bench scenario
    assert len(lines) == 1
    assert lines[0]["scenario"] == "bench" and lines[0]["value"] == 5
    assert runner.recorded_scenarios(str(log)) == {"bench"}
