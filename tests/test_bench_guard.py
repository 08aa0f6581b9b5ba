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


def test_unreachable_backend_fails_loud(monkeypatch, capsys, fresh_progress):
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


def test_broken_probe_env_fails_fast(monkeypatch, capsys, fresh_progress):
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
    # the watchdog and the emit paths share module-global progress state
    # (incl. the claim-once "done" flag) with main(); isolate each test
    # with a fresh copy so one test's emit can't mute another's
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
    # the driver's kill is only PROVEN to land in [1440, 1860] s
    # (BENCH_r04.json: the t=1440 probe message printed, the t=1860 one did
    # not), so the watchdog default must flush BEFORE the window's LOWER
    # bound — 1560 would lose to a 1500 s driver budget — and the
    # outage-guard default must give up (and print its record) before the
    # watchdog fires
    import inspect
    src = inspect.getsource(bench._start_watchdog)
    assert 'BENCH_DEADLINE", 1380' in src
    assert 1380 < 1440
    src = inspect.getsource(bench.wait_for_backend)
    assert 'BENCH_TUNNEL_WAIT", 600' in src  # give-up record ~600s << deadline


def test_bench_defaults_the_compile_cache(monkeypatch):
    # the driver runs `python bench.py` with no env: main() must default the
    # persistent compile cache on (cold tunnel compiles are what can push a
    # full run past the watchdog), overridable/disableable via the env var
    import inspect
    src = inspect.getsource(bench.main)
    assert 'setdefault("NOVEL_VQA_COMPILE_CACHE"' in src


def test_primary_failure_still_emits_json_line(monkeypatch, capsys,
                                               fresh_progress):
    # if bench_train throws (tunnel dying mid-run), main() must still print
    # one parseable JSON line and exit nonzero
    monkeypatch.setattr(bench, "wait_for_backend", lambda: None)
    # keep main()'s compile-cache default out of this test process (it would
    # flip jax_compilation_cache_dir for the rest of the suite)
    monkeypatch.setenv("NOVEL_VQA_COMPILE_CACHE", "0")

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


def test_exactly_one_emitter_wins_the_deadline_race(monkeypatch, capsys,
                                                    fresh_progress):
    # near the deadline the watchdog's fire and main's completion race;
    # the claim-once guard must let exactly ONE of them print (two JSON
    # lines — or a line truncated by os._exit — would corrupt the record)
    assert bench._claim_emit() is True   # first claimant (say, main) wins
    assert bench._claim_emit() is False  # the racing watchdog stands down
    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    monkeypatch.setenv("BENCH_DEADLINE", "0.1")
    import time as _time
    t = bench._start_watchdog()
    try:
        _time.sleep(0.4)
    finally:
        t.cancel()
    # the fired watchdog lost the claim: no exit, no second record
    assert exits == [] and capsys.readouterr().out == ""
