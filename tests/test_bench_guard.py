"""bench.py's bounded backend-outage guard (wait_for_backend): a bench
launched while the axon tunnel is hung must either wait it out or fail
LOUDLY with one JSON error line — never hang silently past its budget
(the driver runs bench.py unattended at round end)."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO) if REPO not in sys.path else None

import bench  # noqa: E402


def test_healthy_backend_returns_fast(monkeypatch):
    # pin the PROBE SUBPROCESS to the CPU backend (drop the axon
    # sitecustomize from PYTHONPATH, as conftest/verify do) so this test
    # never touches the tunnel; the guard must return on the first attempt
    monkeypatch.setenv("PYTHONPATH", REPO)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "120")
    bench.wait_for_backend()


def test_unreachable_backend_fails_loud(monkeypatch, capsys):
    # force every probe to fail (exit 1) and exhaust a zero budget: the
    # guard must emit ONE parseable JSON error line and SystemExit(1)
    monkeypatch.setattr(sys, "executable", "/bin/false")
    monkeypatch.setenv("BENCH_TUNNEL_WAIT", "0")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "5")
    with pytest.raises(SystemExit) as exc:
        bench.wait_for_backend()
    assert exc.value.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] is None
    assert "unreachable" in rec["error"]
    # same metric name as the success record: drivers keying on the primary
    # metric must be able to associate the outage record with it
    assert rec["metric"] == "vqa_arch1_train_throughput"


def test_broken_probe_env_fails_fast(monkeypatch, capsys):
    # a probe subprocess that exits nonzero INSTANTLY (unimportable jax,
    # broken venv) can never recover: the guard must give up after a few
    # consecutive fast failures instead of burning the full outage budget
    monkeypatch.setattr(sys, "executable", "/bin/false")
    monkeypatch.setenv("BENCH_TUNNEL_WAIT", "3600")
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT", "5")
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    with pytest.raises(SystemExit) as exc:
        bench.wait_for_backend()
    assert exc.value.code == 1
    # gave up on the 3rd consecutive fast failure: only two retry sleeps
    # (the guard's sleeps are >= 1 s; subprocess.run's internal wait-loop
    # sleeps, also captured by the patch, are millisecond-scale)
    assert len([s for s in sleeps if s >= 1]) == 2
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["metric"] == "vqa_arch1_train_throughput"
    assert "broken environment" in rec["error"]


@pytest.fixture
def fresh_progress(monkeypatch):
    # the watchdog shares module-global progress state with main(); isolate
    # each test with a fresh copy
    state = {"train": None, "secondary": [], "stage": "init", "done": False}
    monkeypatch.setattr(bench, "_progress", state)
    return state


def test_watchdog_fires_with_partial_results(monkeypatch, capsys, fresh_progress):
    # a mid-run hang (tunnel dying inside a jax call) can't raise: the
    # watchdog must flush the workloads that DID complete as the one JSON
    # line and hard-exit — the round-4 failure left parsed:null instead
    import time as _time
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    monkeypatch.setenv("BENCH_DEADLINE", "0.2")
    fresh_progress["train"] = {"items_per_sec": 1234.5, "mfu": 0.4}
    fresh_progress["secondary"].append({"metric": "fc7_extraction_throughput"})
    fresh_progress["stage"] = "inception"
    t = bench._start_watchdog()
    try:
        deadline = _time.monotonic() + 10
        while not exits and _time.monotonic() < deadline:
            _time.sleep(0.05)
    finally:
        t.cancel()
    assert exits == [3]
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] == 1234.5  # completed primary survives the flush
    assert rec["secondary"][0]["metric"] == "fc7_extraction_throughput"
    assert "watchdog" in rec["error"] and "'inception'" in rec["error"]


def test_watchdog_noop_after_final_record(monkeypatch, capsys, fresh_progress):
    import time as _time
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    monkeypatch.setenv("BENCH_DEADLINE", "0.1")
    fresh_progress["done"] = True  # main() printed its line already
    t = bench._start_watchdog()
    try:
        _time.sleep(0.5)
    finally:
        t.cancel()
    assert exits == [] and capsys.readouterr().out == ""


def test_watchdog_disabled_by_zero_deadline(monkeypatch, fresh_progress):
    monkeypatch.setenv("BENCH_DEADLINE", "0")
    assert bench._start_watchdog() is None


def test_watchdog_default_beats_driver_kill_window(monkeypatch):
    # the driver's observed kill window is ~1800 s (BENCH_r04.json: killed
    # between the 1440 s and 1860 s probe messages); the watchdog default
    # must flush BEFORE that, and the outage-guard default must give up
    # (and print its record) before the watchdog fires
    monkeypatch.delenv("BENCH_DEADLINE", raising=False)
    monkeypatch.delenv("BENCH_TUNNEL_WAIT", raising=False)
    import inspect
    deadline = float(bench.os.environ.get("BENCH_DEADLINE", 1560))
    assert deadline < 1800
    src = inspect.getsource(bench.wait_for_backend)
    assert 'BENCH_TUNNEL_WAIT", 600' in src  # give-up record ~600s << deadline


def test_primary_failure_still_emits_json_line(monkeypatch, capsys):
    # if bench_train throws (tunnel dying mid-run), main() must still print
    # one parseable JSON line and exit nonzero
    monkeypatch.setattr(bench, "wait_for_backend", lambda: None)

    def boom():
        raise RuntimeError("tunnel died mid-run")

    monkeypatch.setattr(bench, "bench_train", boom)
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 1
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] is None and "tunnel died mid-run" in rec["error"]
