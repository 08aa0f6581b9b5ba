"""Honest device-time benchmarking (trace-derived, not wall-clock).

Host wall-clock through the axon tunnel is not trustworthy (CLAUDE.md:
``block_until_ready`` can return before execution; dependent matmul chains
"measure" far beyond hardware peak).  The ``jax.profiler`` trace, however,
records *device-side* execution spans: each jitted module appears on the
``/device:TPU:*`` process, thread ``XLA Modules``, as one complete event per
execution with a microsecond duration measured by the device runtime.  A
dependent-chain bf16 matmul calibration on the attached v5e measures
~194 TFLOP/s from these spans — 98.5% of the chip's 197 TFLOP/s bf16 peak —
so they are the defensible timing source.

This module provides:

  * :func:`measure_device_time` — run a dispatch callable N times under a
    trace and return per-module device durations + execution counts;
  * :func:`parse_trace_events` / :func:`parse_trace_dir` — the Chrome-trace
    (``*.trace.json.gz``) parser behind it;
  * :func:`peak_flops` — per-chip peak FLOP/s table for MFU accounting;
  * :func:`summarize` — turn (flops/step, device seconds, items/step) into a
    ``{items_per_sec, device_step_ms, mfu}`` record, refusing to report an
    MFU > 1 as trustworthy.

The reference has no analog (its only timer is unused,
/root/reference/002_train_vqa_arch1/004_eval_model.lua:203); this subsystem
exists because BASELINE.md's throughput targets demand measured numbers.
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import tempfile
from typing import Callable, Dict, List, Optional, Sequence, Tuple

__all__ = [
    "ModuleStat",
    "TraceSummary",
    "parse_trace_events",
    "parse_trace_dir",
    "measure_device_time",
    "peak_flops",
    "summarize",
    "analytic_flops_arch1_step",
    "analytic_flops_text_ae_step",
]


@dataclasses.dataclass
class ModuleStat:
    name: str
    count: int = 0
    total_us: float = 0.0

    @property
    def total_s(self) -> float:
        return self.total_us / 1e6


@dataclasses.dataclass
class TraceSummary:
    """Device-side module executions extracted from one profiler trace."""

    modules: Dict[str, ModuleStat]
    device_plane: Optional[str]  # e.g. "/device:TPU:0"; None on CPU-only

    @property
    def has_device_plane(self) -> bool:
        return self.device_plane is not None

    def module(self, prefix: str) -> Optional[ModuleStat]:
        """Aggregate stat over modules whose name starts with ``prefix``
        (module names look like ``jit_train_steps_scan(123456...)``)."""
        agg = ModuleStat(name=prefix)
        for name, st in self.modules.items():
            if name.startswith(prefix):
                agg.count += st.count
                agg.total_us += st.total_us
        return agg if agg.count else None

    def total(self) -> ModuleStat:
        agg = ModuleStat(name="<all modules>")
        for st in self.modules.values():
            agg.count += st.count
            agg.total_us += st.total_us
        return agg


def parse_trace_events(trace: dict) -> TraceSummary:
    """Parse a loaded Chrome-trace dict (``{"traceEvents": [...]}``).

    Device module executions live on the process whose metadata name starts
    with ``/device:`` under the thread named ``XLA Modules``.  The CPU
    backend emits no such plane — callers must handle
    ``has_device_plane == False`` by falling back to wall-clock.
    """
    events = trace.get("traceEvents", [])
    pid_names: Dict[int, str] = {}
    tid_names: Dict[Tuple[int, int], str] = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")

    device_pids = {
        pid: name for pid, name in pid_names.items() if name.startswith("/device:")
    }
    module_tids = {
        (pid, tid)
        for (pid, tid), name in tid_names.items()
        if pid in device_pids and name == "XLA Modules"
    }

    modules: Dict[str, ModuleStat] = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in module_tids:
            continue
        st = modules.setdefault(e["name"], ModuleStat(name=e["name"]))
        st.count += 1
        st.total_us += float(e.get("dur", 0.0))

    plane = next(iter(device_pids.values()), None) if module_tids else None
    return TraceSummary(modules=modules, device_plane=plane)


def parse_trace_ops(trace_dir: str) -> Dict[str, Dict[str, ModuleStat]]:
    """Op-level device spans, grouped by device thread name.

    Besides "XLA Modules" (whole-program executions), TPU traces carry
    per-op threads (e.g. "XLA Ops", "XLA TraceMe", "Steps") whose X events
    name individual HLO ops with device-measured durations — the data needed
    to attribute a step's time to gathers/scatters/matmuls/copies.
    Returns ``{thread_name: {op_name: ModuleStat}}`` for every thread on a
    ``/device:`` process."""
    files: List[str] = []
    for p in (
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
    ):
        files = sorted(glob.glob(p, recursive=True), key=os.path.getmtime)
        if files:
            break
    if not files:
        return {}
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names: Dict[int, str] = {}
    tid_names: Dict[Tuple[int, int], str] = {}
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items() if n.startswith("/device:")}
    out: Dict[str, Dict[str, ModuleStat]] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = tid_names.get((e["pid"], e["tid"]), f"tid{e['tid']}")
        ops = out.setdefault(tname, {})
        st = ops.setdefault(e["name"], ModuleStat(name=e["name"]))
        st.count += 1
        st.total_us += float(e.get("dur", 0.0))
    return out


def parse_trace_dir(trace_dir: str) -> TraceSummary:
    """Find the newest ``*.trace.json.gz`` under ``trace_dir`` and parse it.

    ``jax.profiler`` writes ``<dir>/plugins/profile/<timestamp>/<host>.trace.json.gz``.
    """
    pats = [
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
    ]
    files: List[str] = []
    for p in pats:
        files = sorted(glob.glob(p, recursive=True), key=os.path.getmtime)
        if files:
            break
    if not files:
        return TraceSummary(modules={}, device_plane=None)
    with gzip.open(files[-1], "rt") as f:
        return parse_trace_events(json.load(f))


@dataclasses.dataclass
class DeviceTiming:
    """Result of :func:`measure_device_time`."""

    wall_s: float
    summary: TraceSummary
    n_calls: int  # how many times fn was invoked

    def module_seconds(self, prefix: str) -> Tuple[Optional[float], int]:
        st = self.summary.module(prefix)
        if st is None:
            return None, 0
        return st.total_s, st.count


def measure_device_time(
    fn: Callable[[], object],
    n_calls: int,
    trace_dir: Optional[str] = None,
) -> DeviceTiming:
    """Invoke ``fn`` ``n_calls`` times under a profiler trace and parse the
    device-side module durations.

    ``fn`` must return a jax array (or pytree ending in one); the result of
    the final call is forced to host via ``jax.device_get`` *inside* the
    trace window, because through the tunnel ``block_until_ready`` may return
    before the device has actually executed — a host transfer cannot.
    """
    import time

    import jax

    own_dir = trace_dir is None
    if own_dir:
        trace_dir = tempfile.mkdtemp(prefix="nvqa_devbench_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(n_calls):
            out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            jax.device_get(leaves[-1])
    wall = time.perf_counter() - t0
    summary = parse_trace_dir(trace_dir)
    return DeviceTiming(wall_s=wall, summary=summary, n_calls=n_calls)


# Peak dense matmul FLOP/s per chip (bf16 multiply / f32 accumulate — the MXU
# number).  Using the bf16 peak as the MFU denominator is conservative for
# fp32 workloads (fp32 throughput is lower, so true utilization is higher
# than reported).  Sources: public TPU spec sheets.
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,  # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v3": 123e12,
    "TPU v2": 46e12,
}


def peak_flops(device=None) -> Optional[float]:
    """bf16 peak FLOP/s for the given (default: first) jax device, or None
    when unknown (e.g. the CPU test mesh)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    for key, val in _PEAK_FLOPS.items():
        if kind.startswith(key):
            return val
    return None


def summarize(
    *,
    flops_per_step: Optional[float],
    device_s: Optional[float],
    n_steps: int,
    items_per_step: float,
    wall_s: float,
    peak: Optional[float],
) -> dict:
    """Build the honest throughput record.

    Primary figures derive from trace device time when available.  Wall-clock
    figures are always included for transparency, but when they would imply
    an MFU above 1.0 (physically impossible) they are marked untrusted and
    never used as the headline value — VERDICT round-1 item 1.
    """
    rec: dict = {
        "n_steps": n_steps,
        "items_per_step": items_per_step,
        "wall_s": round(wall_s, 4),
    }
    if flops_per_step:
        rec["flops_per_step"] = flops_per_step

    wall_items = items_per_step * n_steps / wall_s if wall_s > 0 else None
    wall_mfu = (
        flops_per_step * n_steps / wall_s / peak
        if (flops_per_step and peak and wall_s > 0)
        else None
    )
    if wall_items is not None:
        rec["wall_items_per_sec"] = round(wall_items, 2)
    if wall_mfu is not None:
        rec["wall_mfu"] = round(wall_mfu, 4)
        rec["wall_clock_trusted"] = wall_mfu <= 1.0

    if device_s and device_s > 0:
        rec["timing_source"] = "profiler_device_time"
        rec["device_step_ms"] = round(device_s / n_steps * 1e3, 4)
        rec["items_per_sec"] = round(items_per_step * n_steps / device_s, 2)
        if flops_per_step and peak:
            rec["mfu"] = round(flops_per_step * n_steps / device_s / peak, 4)
    elif wall_mfu is None or wall_mfu <= 1.0:
        # no device plane (CPU run): wall-clock is the only figure; on real
        # CPU it is also a *valid* figure (no tunnel in the way)
        rec["timing_source"] = "wall_clock"
        rec["device_step_ms"] = None
        rec["items_per_sec"] = rec.get("wall_items_per_sec")
        if wall_mfu is not None:
            rec["mfu"] = round(wall_mfu, 4)
    else:
        # wall clock implies >100% MFU and there is no device time: refuse
        rec["timing_source"] = "untrusted"
        rec["device_step_ms"] = None
        rec["items_per_sec"] = None
    return rec


def analytic_flops_arch1_step(cfg, batch_size: int, seq_len: int) -> float:
    """Analytic matmul FLOPs for ONE arch1 fwd+bwd+update train step
    (cross-check for ``Compiled.cost_analysis()['flops']``).

    Counts the MXU terms only (gates, fusion, classifier; fwd + ~2x for bwd),
    which dominate; elementwise/optimizer FLOPs are ignored.  Workload per
    /root/reference/002_train_vqa_arch1/002_train_baseline.lua:141-157.
    """
    E, H, L = cfg.input_encoding_size, cfg.rnn_size, cfg.rnn_layer
    per_tok = 0.0
    for layer in range(L):
        in_size = E if layer == 0 else H
        per_tok += 2.0 * 4 * H * (in_size + H)  # x@Wi + h@Wh
    lstm = per_tok * seq_len
    fusion = 2.0 * (2 * H * L) * cfg.common_embedding_size + 2.0 * cfg.nhimage * cfg.common_embedding_size
    classifier = 2.0 * cfg.common_embedding_size * cfg.num_output
    fwd = (lstm + fusion + classifier) * batch_size
    return 3.0 * fwd  # bwd ~= 2x fwd


def analytic_flops_arch2_step(cfg, batch_size: int, seq_len: int) -> float:
    """Analytic matmul FLOPs for ONE arch2 fwd+bwd+update train step
    (workload /root/reference/003_train_vqa_arch2/002_train_baseline.lua:
    cnn_projection -> nn.Encoder over [img, START, w1..wL] -> classifier).

    The encoder runs ``seq_len + 2`` LSTM steps (image tick + START token +
    tokens, misc/Encoder_lstm.lua:170-226); bwd ~= 2x fwd.
    """
    E, H = cfg.input_encoding_size, cfg.rnn_size
    per_tok = 0.0
    for i in range(cfg.num_layers):
        in_size = E if i == 0 else H
        per_tok += 2.0 * 4 * H * (in_size + H)
    enc = per_tok * (seq_len + 2)
    proj = 2.0 * cfg.nhimage * E
    classifier = 2.0 * H * cfg.num_output
    return 3.0 * (enc + proj + classifier) * batch_size


def analytic_flops_text_ae_step(cfg, batch_size: int, seq_len: int) -> float:
    """Analytic matmul FLOPs for ONE text-AE fwd+bwd+update train step
    (workload /root/reference/001_train_autoencoder/001_train_arch1_text_autoencoder.lua:208-249).

    Encoder: ``seq_len`` LSTM steps; decoder: ``seq_len + 1`` steps of gates
    plus the dominant Linear(H, V+1) projection.  bwd ~= 2x fwd, plus one
    extra decoder forward because the fused-NLL scan body is rematerialized
    (``jax.checkpoint`` in models/seq/autoencoder.decode_teacher_forced_nll
    recomputes each step's logits during the backward)."""
    E, H = cfg.input_encoding_size, cfg.rnn_size
    enc_tok = 0.0
    for i in range(cfg.num_layers):
        in_size = E if i == 0 else H
        enc_tok += 2.0 * 4 * H * (in_size + H)
    enc = enc_tok * seq_len
    dec_tok = 0.0
    for i in range(cfg.decoder_layers):
        in_size = E if i == 0 else H
        dec_tok += 2.0 * 4 * H * (in_size + H)
    dec_tok += 2.0 * H * (cfg.vocab_size + 1)  # logits projection
    dec = dec_tok * (seq_len + 1)
    fwd = (enc + dec) * batch_size
    return 3.0 * fwd + dec * batch_size  # + remat recompute of the decoder
