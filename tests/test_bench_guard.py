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
