"""Tests for the honest device-time measurement layer
(novel_vqa_tpu/core/device_bench.py — VERDICT round-1 item 1).

The Chrome-trace parser is pinned against a synthetic trace shaped exactly
like the ones ``jax.profiler`` writes on the TPU backend (process metadata
``/device:TPU:0`` with an ``XLA Modules`` thread of complete events); the
live path is smoke-tested on the CPU backend, which has no device plane and
must fall back gracefully to wall-clock.
"""

import gzip
import json
import os

import jax
import jax.numpy as jnp
import pytest

from novel_vqa_tpu.core import device_bench as db


def _synthetic_trace(n_exec=3, dur_us=150.0):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 701, "tid": 9, "name": "thread_name",
         "args": {"name": "python"}},
        # host-side event that must NOT be counted
        {"ph": "X", "pid": 701, "tid": 9, "name": "jit_step(1)",
         "ts": 0, "dur": 1e9},
        # op-level events on the device that must NOT be counted as modules
        {"ph": "X", "pid": 3, "tid": 3, "name": "fusion.3", "ts": 0, "dur": 50},
    ]
    for i in range(n_exec):
        events.append(
            {"ph": "X", "pid": 3, "tid": 2, "name": "jit_step(12345)",
             "ts": 1000 * i, "dur": dur_us}
        )
    events.append(
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_other(99)", "ts": 0,
         "dur": 10.0}
    )
    return {"traceEvents": events}


def test_parse_trace_events_counts_device_modules_only():
    s = db.parse_trace_events(_synthetic_trace(n_exec=4, dur_us=250.0))
    assert s.has_device_plane
    assert s.device_plane == "/device:TPU:0"
    st = s.module("jit_step")
    assert st.count == 4
    assert st.total_us == pytest.approx(1000.0)
    # the host-side jit_step span (1e9 us) and the op event are excluded
    assert s.total().total_us == pytest.approx(1010.0)
    assert s.module("jit_missing") is None


def test_parse_trace_dir_roundtrip(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(_synthetic_trace(n_exec=2), f)
    s = db.parse_trace_dir(str(tmp_path))
    assert s.module("jit_step").count == 2


def test_parse_trace_dir_empty(tmp_path):
    s = db.parse_trace_dir(str(tmp_path))
    assert not s.has_device_plane
    assert s.total().count == 0


def test_summarize_device_time_primary():
    rec = db.summarize(
        flops_per_step=1e12,
        device_s=1.0,
        n_steps=100,
        items_per_step=500,
        wall_s=0.001,  # absurd wall-clock (the tunnel pathology: >100x peak)
        peak=197e12,
    )
    assert rec["timing_source"] == "profiler_device_time"
    assert rec["items_per_sec"] == pytest.approx(500 * 100 / 1.0)
    assert rec["device_step_ms"] == pytest.approx(10.0)
    assert rec["mfu"] == pytest.approx(1e12 * 100 / 1.0 / 197e12, rel=1e-3)
    assert rec["mfu"] <= 1.0
    # the impossible wall-clock figure is present but flagged untrusted
    assert rec["wall_clock_trusted"] is False


def test_summarize_refuses_impossible_wall_clock():
    rec = db.summarize(
        flops_per_step=1e12,
        device_s=None,
        n_steps=10,
        items_per_step=1,
        wall_s=0.001,  # implies 1e16 FLOP/s on one chip
        peak=197e12,
    )
    assert rec["timing_source"] == "untrusted"
    assert rec["items_per_sec"] is None


def test_summarize_wall_clock_fallback_on_cpu():
    rec = db.summarize(
        flops_per_step=1e6,
        device_s=None,
        n_steps=10,
        items_per_step=32,
        wall_s=2.0,
        peak=None,
    )
    assert rec["timing_source"] == "wall_clock"
    assert rec["items_per_sec"] == pytest.approx(160.0)


def test_measure_device_time_cpu_smoke(tmp_path):
    """Live path on the CPU backend: no device plane, but wall time and the
    forced host transfer still work."""
    x = jnp.ones((64, 64))

    @jax.jit
    def f(x):
        return x @ x

    f(x).block_until_ready()
    timing = db.measure_device_time(lambda: f(x), 3, trace_dir=str(tmp_path))
    assert timing.wall_s > 0
    assert timing.n_calls == 3
    dev_s, n = timing.module_seconds("jit_f")
    assert dev_s is None and n == 0  # CPU: no /device: plane


def test_peak_flops_table():
    class FakeDev:
        device_kind = "TPU v5 lite"

    assert db.peak_flops(FakeDev()) == 197e12

    class Unknown:
        device_kind = "CPU"

    assert db.peak_flops(Unknown()) is None


def test_analytic_flops_arch1():
    from novel_vqa_tpu.models.vqa import arch1

    cfg = arch1.Arch1Config(vocab_size=12782)
    f = db.analytic_flops_arch1_step(cfg, batch_size=500, seq_len=16)
    # hand figure: ~0.39 GFLOP/pair fwd+bwd (VERDICT round-1), x500
    assert 0.3e9 * 500 < f < 0.5e9 * 500
