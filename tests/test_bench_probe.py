"""bench.py's backend probe-retry loop (driver-critical: a transient
tunnel wedge at the driver's capture moment must not cost the round's
perf evidence — BENCH_r03 post-mortem, VERDICT r3 weak #2)."""

import os
import subprocess
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_proc(rc):
    p = types.SimpleNamespace()
    p.returncode = rc
    return p


def test_recovers_after_transient_failures(monkeypatch):
    calls = []

    def fake_run(*a, **k):
        calls.append(1)
        if len(calls) >= 3:
            return _fake_proc(0)
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_backend(max_wait_s=600, probe_timeout_s=1)
    assert len(calls) == 3


def test_permanently_down_returns_within_budget(monkeypatch):
    """A dead backend must hand control back to main() (which fails with
    the real traceback) rather than spin forever; the wait is bounded by
    max_wait_s."""
    calls = []
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: (calls.append(1), _fake_proc(1))[1])
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))
    t = [0.0]

    def fake_monotonic():
        t[0] += 5.0
        return t[0]

    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)
    bench._wait_for_backend(max_wait_s=60, probe_timeout_s=1)
    assert calls, "must have probed at least once"
    assert t[0] <= 120, "returned within the bounded window"


def test_healthy_backend_probes_once(monkeypatch):
    calls = []
    monkeypatch.setattr(bench.subprocess, "run",
                        lambda *a, **k: (calls.append(1), _fake_proc(0))[1])
    bench._wait_for_backend()
    assert len(calls) == 1
