"""Unit tests for bench.py's phase orchestration (no device needed).

The bench driver isolates each phase in a subprocess with a timeout,
one retry, and a global budget; a tunnel outage must cost probing time
only — not one of the phase's attempts (observed 2026-08-19: a dead
tunnel hung a proceeding phase for the full 900 s timeout).  Rounds 3
and 4 both ended in an EXTERNAL kill (rc 124) that ate the back-half
phases, so the driver now (a) runs the cheap accuracy phases before the
long rejection sweep, (b) self-caps at BENCH_DEADLINE_S with a watchdog
that emits the final artifact and exits 0, and (c) persists per-phase
results to a sidecar so a re-run only executes what is missing.
"""

import importlib.util
import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH_PATH = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "bench.py"))


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(time, "sleep", lambda s: None)
    # never touch the real sidecar from tests
    monkeypatch.setenv("BENCH_SIDECAR", str(tmp_path / "sidecar.json"))
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
    monkeypatch.setattr(bench, "_run_child",
                        lambda *a, **k: outcomes.pop(0))
    out = bench._run_phase_isolated("smc", lambda: 10_000)
    assert out == {"total_s": 1.0}


def test_outage_bounded_by_global_budget(bench, monkeypatch):
    """With the tunnel down for good, the budget ends the phase."""
    calls = {"n": 0}

    def run(*a, **k):
        calls["n"] += 1
        return _Result(bench._DOWN_MARKER + "\n", 3)

    monkeypatch.setattr(bench, "_run_child", run)
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

    monkeypatch.setattr(bench, "_run_child", run)
    assert bench._run_phase_isolated("smc", lambda: 10_000) is None
    assert calls["n"] == 2


def test_timeout_burns_attempts(bench, monkeypatch):
    """A hung phase (TimeoutExpired) is a failure, not an outage."""
    calls = {"n": 0}

    def run(*a, **k):
        calls["n"] += 1
        raise subprocess.TimeoutExpired(cmd="bench", timeout=1)

    monkeypatch.setattr(bench, "_run_child", run)
    assert bench._run_phase_isolated("bolfi", lambda: 10_000) is None
    assert calls["n"] == 2


def test_phase_timeout_capped_by_budget(bench, monkeypatch):
    """The subprocess timeout never exceeds the remaining global budget."""
    seen = {}

    def run(cmd, timeout_s, env):
        seen["timeout"] = timeout_s
        return _Result(bench._MARKER + "{}\n")

    monkeypatch.setattr(bench, "_run_child", run)
    bench._run_phase_isolated("bolfi", lambda: 120)
    assert seen["timeout"] == 120


def test_probe_deadline_below_parent_timeout(bench, monkeypatch):
    """The child's device-probe deadline is capped below the parent's
    subprocess timeout, so an outage surfaces as the DOWN marker rather
    than TimeoutExpired (which would burn a phase attempt)."""
    seen = {}

    def run(cmd, timeout_s, env):
        seen["timeout"] = timeout_s
        seen["probe"] = float(env["BENCH_PROBE_DEADLINE_S"])
        return _Result(bench._MARKER + "{}\n")

    monkeypatch.setattr(bench, "_run_child", run)
    bench._run_phase_isolated("bolfi", lambda: 120)
    assert seen["probe"] <= seen["timeout"] - 60 or seen["probe"] == 20
    bench._run_phase_isolated("bolfi", lambda: 10_000)
    assert seen["probe"] <= seen["timeout"] - 60


def test_outage_wait_capped_per_phase(bench, monkeypatch):
    """A persistent outage stops costing this phase after OUTAGE_CAP_S so
    later phases still get attempted (round 3 spun on one phase until an
    external kill zeroed the whole benchmark)."""
    calls = {"n": 0}

    def run(*a, **k):
        calls["n"] += 1
        return _Result(bench._DOWN_MARKER + "\n", 3)

    monkeypatch.setattr(bench, "_run_child", run)
    assert bench._run_phase_isolated("smc", lambda: 1_000_000) is None
    assert calls["n"] == bench.OUTAGE_CAP_S // bench._OUTAGE_SLEEP_S


def test_accuracy_phases_run_before_rejection(bench):
    """Rounds 3+4 lost the cheap accuracy phases to a back-half outage
    while the (already-proven) headline sweep ran first; the order is now
    cheap-accuracy-first, rejection last."""
    assert bench.PHASE_ORDER[-1] == "rejection"
    assert set(bench.PHASE_ORDER[:-1]) == set(bench.PHASES) - {"rejection"}


def test_deadline_self_caps_inside_driver_window(bench):
    """rc=124 in r03+r04 proves the external kill fires at ~5400 s; the
    default deadline must leave real margin under it."""
    import inspect
    src = inspect.getsource(bench.main)
    assert '"BENCH_DEADLINE_S", "4500"' in src


_REJ_STUB = {"ma2_acc": {"ok": True}, "pallas_acc": {"ok": True},
             "xla_path_sims_per_s": 1.0, "pallas_kernel_sims_per_s": 2.0}


def _phase_stub(name):
    return (_REJ_STUB if name == "rejection"
            else {"total_s": 1.0, "means": {}, "acc": {"ok": True}})


def test_cumulative_emission_per_phase(bench, monkeypatch, capsys):
    """main() prints a full-format JSON line before any phase and after
    every phase, so the last parseable line always reflects everything
    completed so far."""
    monkeypatch.setattr(bench, "_wait_for_device", lambda **k: True)
    monkeypatch.setattr(
        bench, "_run_phase_isolated",
        lambda name, budget: _phase_stub(name))
    bench.main([])
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(lines) == 1 + len(bench.PHASE_ORDER)
    parsed = [json.loads(ln) for ln in lines]
    assert parsed[0]["value"] == 0.0                 # nothing done yet
    assert not parsed[0]["detail"]["accuracy_ok"]
    assert parsed[-1]["value"] == 2.0                # rejection landed last
    assert parsed[-1]["detail"]["accuracy_ok"]


def test_failed_phase_retried_in_later_sweep(bench, monkeypatch, capsys):
    """A phase lost to an outage longer than OUTAGE_CAP_S is retried after
    the other phases ran (the tunnel often recovers within minutes): the
    headline must not stay zeroed when the device comes back mid-run."""
    calls = []

    def fake(name, budget):
        calls.append(name)
        if name == "rejection" and calls.count("rejection") == 1:
            return None                          # outage ate the first try
        return _phase_stub(name)

    monkeypatch.setattr(bench, "_wait_for_device", lambda **k: True)
    monkeypatch.setattr(bench, "_run_phase_isolated", fake)
    bench.main([])
    assert calls.count("rejection") == 2
    # succeeded phases are not re-run
    assert calls.count("bolfi") == 1
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    out = json.loads(lines[-1])
    assert out["value"] == 2.0
    assert out["detail"]["accuracy_ok"]


def test_sidecar_roundtrip_and_reuse(bench, monkeypatch, capsys):
    """Successful phases persist to the sidecar; a second main() run with
    the same code fingerprint replays them without re-executing, and the
    artifact discloses which phases were reused."""
    monkeypatch.setattr(bench, "_wait_for_device", lambda **k: True)
    calls = []

    def fake(name, budget):
        calls.append(name)
        return _phase_stub(name)

    monkeypatch.setattr(bench, "_run_phase_isolated", fake)
    bench.main([])
    assert len(calls) == len(bench.PHASE_ORDER)
    capsys.readouterr()

    calls.clear()
    bench.main([])                       # second run: everything reused
    assert calls == []
    out = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines() if ln][-1])
    assert out["value"] == 2.0
    assert out["detail"]["accuracy_ok"]
    assert set(out["detail"]["phases_reused_from_sidecar"]) == set(
        bench.PHASE_ORDER)


def test_sidecar_partial_reuse_runs_only_missing(bench, monkeypatch):
    """After a partial run (e.g. killed mid-sweep), only missing phases
    execute on the next run."""
    monkeypatch.setattr(bench, "_wait_for_device", lambda **k: True)
    fp = bench._code_fingerprint()
    bench._save_sidecar(fp, {
        name: {"payload": _phase_stub(name), "ts": time.time()}
        for name in bench.PHASE_ORDER if name != "rejection"})
    calls = []

    def fake(name, budget):
        calls.append(name)
        return _phase_stub(name)

    monkeypatch.setattr(bench, "_run_phase_isolated", fake)
    bench.main([])
    assert calls == ["rejection"]


def test_sidecar_rejects_stale_and_foreign_entries(bench):
    """Entries from different code or beyond the freshness window are
    ignored."""
    fp = bench._code_fingerprint()
    now = time.time()
    bench._save_sidecar(fp, {
        "smc": {"payload": {"total_s": 1.0}, "ts": now},
        "bsl": {"payload": {"total_s": 1.0},
                "ts": now - bench._sidecar_max_age_s() - 10}})
    loaded = bench._load_sidecar(fp)
    assert set(loaded) == {"smc"}
    assert bench._load_sidecar("deadbeef") == {}


def test_parent_killed_mid_run_leaves_parseable_line(tmp_path):
    """Round-3 regression: the driver SIGTERMs a stalled bench.  Completed
    phases must survive as the last parseable stdout line."""
    script = tmp_path / "driver.py"
    script.write_text(f"""
import importlib.util, os, time
os.environ["BENCH_SIDECAR"] = {str(tmp_path / "sidecar.json")!r}
spec = importlib.util.spec_from_file_location("b", {BENCH_PATH!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod._wait_for_device = lambda **k: True
def fake(name, budget, attempts=2):
    if name == "bsl":
        return {{"total_s": 1.0, "means": {{}}, "acc": {{"ok": True}}}}
    time.sleep(300)
mod._run_phase_isolated = fake
mod.main([])
""")
    p = subprocess.Popen([sys.executable, "-u", str(script)],
                         stdout=subprocess.PIPE, text=True)
    try:
        lines = [p.stdout.readline(), p.stdout.readline()]
        assert all(json.loads(ln) for ln in lines)   # initial + bsl
        p.send_signal(signal.SIGTERM)                # driver kill mid-smc
        rest, _ = p.communicate(timeout=30)
    finally:
        if p.poll() is None:
            p.kill()
    last = [ln for ln in (lines + rest.splitlines()) if ln.strip()][-1]
    out = json.loads(last)
    assert out["detail"]["accuracy"]["ma2_bsl"]["ok"]


def test_watchdog_emits_and_exits_zero_on_deadline(tmp_path):
    """r03/r04 regression: a phase subprocess wedged past its timeout must
    not let the bench outlive BENCH_DEADLINE_S — the watchdog prints the
    cumulative artifact and exits 0 on its own."""
    script = tmp_path / "driver.py"
    script.write_text(f"""
import importlib.util, os, time
os.environ["BENCH_SIDECAR"] = {str(tmp_path / "sidecar.json")!r}
os.environ["BENCH_DEADLINE_S"] = "3"
os.environ["BENCH_MIN_BUDGET_S"] = "0"
spec = importlib.util.spec_from_file_location("b", {BENCH_PATH!r})
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod._wait_for_device = lambda **k: True
def fake(name, budget, attempts=2):
    if name == "bsl":
        return {{"total_s": 1.0, "means": {{}}, "acc": {{"ok": True}}}}
    time.sleep(300)        # wedged child the per-phase timeout missed
mod._run_phase_isolated = fake
mod.main([])
""")
    r = subprocess.run([sys.executable, "-u", str(script)],
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 0
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    out = json.loads(lines[-1])
    assert out["detail"]["accuracy"]["ma2_bsl"]["ok"]
    assert "deadline reached" in r.stderr
