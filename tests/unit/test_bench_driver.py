"""Unit tests for bench.py's phase orchestration (no device needed).

The bench driver isolates each phase in a subprocess with a timeout,
one retry, and a global budget; a tunnel outage must cost probing time
only — not one of the phase's attempts (observed 2026-08-19: a dead
tunnel hung a proceeding phase for the full 900 s timeout).
"""

import importlib.util
import subprocess
import time

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    return mod


class _Result:
    def __init__(self, stdout, returncode=0):
        self.stdout = stdout
        self.stderr = ""
        self.returncode = returncode


def test_outage_does_not_burn_attempts(bench, monkeypatch):
    """Device-down reports keep re-probing; a later success still lands."""
    outcomes = [_Result(bench._DOWN_MARKER + "\n", 3)] * 5 + [
        _Result(bench._MARKER + '{"total_s": 1.0}\n')]
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: outcomes.pop(0))
    out = bench._run_phase_isolated("smc", lambda: 10_000)
    assert out == {"total_s": 1.0}


def test_outage_bounded_by_global_budget(bench, monkeypatch):
    """With the tunnel down for good, the budget ends the phase."""
    calls = {"n": 0}

    def run(*a, **k):
        calls["n"] += 1
        return _Result(bench._DOWN_MARKER + "\n", 3)

    monkeypatch.setattr(subprocess, "run", run)
    budget = {"left": 500}

    def budget_left():
        budget["left"] -= 100
        return max(0, budget["left"])

    assert bench._run_phase_isolated("smc", budget_left) is None
    assert calls["n"] >= 1


def test_real_failures_burn_attempts(bench, monkeypatch):
    """A phase that produces no result marker gets exactly `attempts`."""
    calls = {"n": 0}

    def run(*a, **k):
        calls["n"] += 1
        return _Result("unrelated output\n", 1)

    monkeypatch.setattr(subprocess, "run", run)
    assert bench._run_phase_isolated("smc", lambda: 10_000) is None
    assert calls["n"] == 2


def test_timeout_burns_attempts(bench, monkeypatch):
    """A hung phase (TimeoutExpired) is a failure, not an outage."""
    calls = {"n": 0}

    def run(*a, **k):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(subprocess, "run", run)
    assert bench._run_phase_isolated("bolfi", lambda: 10_000) is None
    assert calls["n"] == 2


def test_phase_timeout_capped_by_budget(bench, monkeypatch):
    """The subprocess timeout never exceeds the remaining global budget."""
    seen = {}

    def run(*a, timeout=None, **k):
        seen["timeout"] = timeout
        return _Result(bench._MARKER + "{}\n")

    monkeypatch.setattr(subprocess, "run", run)
    bench._run_phase_isolated("bolfi", lambda: 120)
    assert seen["timeout"] == 120
