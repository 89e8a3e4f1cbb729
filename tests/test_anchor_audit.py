"""Anchor-audit tool contract: a NO-ANCHOR row is a bookkeeping error
that fails the audit (exit 2) even on a load-suspect run; perf breaches
stay load-gated (ADVICE r13 pin on tools/anchor_audit.py:99)."""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
TOOL = os.path.join(REPO, "tools", "anchor_audit.py")


def _run(bench: dict, tmp_path):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(bench))
    return subprocess.run(
        [sys.executable, TOOL, str(p)], capture_output=True, text=True
    )


def _some_anchor():
    with open(os.path.join(REPO, "tools", "anchors.json")) as f:
        anchors = json.load(f)["anchors"]
    return next(iter(anchors.items()))


def test_no_anchor_fails_even_under_load(tmp_path):
    r = _run({"queries": {"zz_unknown_query": 1.0},
              "loadavg_start": [20.0, 20.0, 20.0]}, tmp_path)
    assert r.returncode == 2, r.stdout
    assert "NO-ANCHOR zz_unknown_query" in r.stdout
    assert "LOAD-SUSPECT" in r.stdout  # load annotation still printed


def test_breach_under_load_is_suspect_not_failure(tmp_path):
    name, base = _some_anchor()
    r = _run({"queries": {name: base * 10},
              "loadavg_start": [20.0, 20.0, 20.0]}, tmp_path)
    assert r.returncode == 0, r.stdout
    assert "load-suspect " + name.split("_", 1)[0] in r.stdout.replace(name, name.split("_", 1)[0])


def test_breach_at_idle_fails(tmp_path):
    name, base = _some_anchor()
    r = _run({"queries": {name: base * 10},
              "loadavg_start": [0.5, 0.5, 0.5]}, tmp_path)
    assert r.returncode == 1, r.stdout
    assert "BREACH" in r.stdout


def test_clean_run_passes(tmp_path):
    name, base = _some_anchor()
    r = _run({"queries": {name: base},
              "loadavg_start": [0.5, 0.5, 0.5]}, tmp_path)
    assert r.returncode == 0, r.stdout
    assert "OK: 0 rows" in r.stdout


def test_breach_at_idle_outranks_missing_anchor(tmp_path):
    """r14 review pin: a run with BOTH a real idle-load breach and a
    NO-ANCHOR row must exit 1 (regression), not 2 (bookkeeping) — the
    more severe signal wins the exit code."""
    name, base = _some_anchor()
    r = _run({"queries": {name: base * 10, "zz_unknown": 1.0},
              "loadavg_start": [0.5, 0.5, 0.5]}, tmp_path)
    assert r.returncode == 1, r.stdout
    assert "BREACH" in r.stdout and "NO-ANCHOR" in r.stdout
