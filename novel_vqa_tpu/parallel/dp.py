"""Shared data-parallel step builders for the VQA trainers.

arch1 and arch2 need byte-for-byte the same DP machinery — the models differ
only in the ``loss_fn`` each closes over — so the builders live here once and
the model modules delegate (keeping their public ``make_dp_*`` API).  The
sharding recipe is the SURVEY section 2.8 plan: params / optimizer state /
HBM-resident dataset replicated over a 1-D ``"data"`` mesh, the per-step
sampled index vector sharding-constrained over the mesh so the batch gather
and fwd/bwd run per-chip, and the gradient mean all-reduces over ICI via
GSPMD — no hand-written collectives (the reference has no distributed code
at all: 002_train_vqa_arch1/002_train_baseline.lua:57-63 selects one GPU).

``loss_fn`` contract: ``loss_fn(params, cfg, tokens, image, labels, rng) ->
scalar mean loss`` (both ``arch1.loss_fn`` and ``arch2.loss_fn`` match).
"""

from __future__ import annotations

import functools
from collections import deque
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fetch_chunked(dev, rows_per_chunk: int = 0, target_mb: int = 64):
    """Materialize a LARGE device array on host in axis-0 slices.

    Through the axon tunnel a single-shot ``np.asarray`` of a big array
    collapses to ~1.5 MB/s (488 MB measured 336 s), while ~16–128 MB
    slices sustain 29–38 MB/s — a 20–26x difference (round-4 measurement,
    docs/PERF.md LF record).  Every slice's ``copy_to_host_async`` is
    issued up front so the transfers pipeline; materialization then walks
    them in order.  Exact same bytes as the one-shot fetch.  Small arrays
    (<= one chunk) take the direct path."""
    n = dev.shape[0]
    if not rows_per_chunk:
        row_bytes = max(
            1, int(np.prod(dev.shape[1:], dtype=np.int64)) * dev.dtype.itemsize
        )
        rows_per_chunk = max(1, int(target_mb * 2**20) // row_bytes)
    if rows_per_chunk >= n:
        return np.asarray(dev)
    slices = [dev[i : i + rows_per_chunk] for i in range(0, n, rows_per_chunk)]
    for s in slices:
        try:
            s.copy_to_host_async()
        except Exception:
            pass  # not every backend exposes it; fetch below blocks
    return np.concatenate([np.asarray(s) for s in slices])


class DeferredFetch:
    """Deep-pipelined device->host fetches for full-split inference loops.

    ``put(result, meta)`` starts the async copy-back and defers
    materialisation until ``depth`` newer results are in flight, so host
    upload, device compute, and copy-back overlap instead of serialising a
    full link round trip per batch (through the axon tunnel the serialized
    eval of 121,512 questions measured 611 s — round-4 rehearsal; same
    structure as ``extract_features.run_pipelined_extraction``, which keeps
    its own loop because it scatters into a preallocated feature matrix).
    ``results()`` flushes and returns ``[(np.ndarray, meta), ...]`` in put
    order.  Used by eval_vqa_arch1/2 and lf_ensemble compute."""

    def __init__(self, depth: int = 3):
        self.depth = max(0, depth)
        self._q = deque()
        self._out = []

    def put(self, dev, meta=None):
        try:  # start the device->host copy as soon as the result is ready
            dev.copy_to_host_async()
        except Exception:
            pass  # not every backend/array type exposes it; fetch blocks
        self._q.append((dev, meta))
        self._drain(self.depth)

    def _drain(self, limit):
        while len(self._q) > limit:
            dev, meta = self._q.popleft()
            self._out.append((np.asarray(dev), meta))

    def results(self):
        self._drain(0)
        return self._out


# (step, place) pairs memoized per (builder, eval_fn, cfg, batch_size,
# data_parallel): the DP builders construct a mesh + a fresh jax.jit wrapper,
# so same-shaped repeat calls in one process (lf_ensemble loops three splits
# through run_full_split; repeated eval legs) would otherwise recompile a
# minutes-long tunnel program each time (ADVICE round-4).  Keyed only for
# mesh=None (the CLI path); an explicit mesh bypasses the cache — tests pass
# their own meshes and must not leak state across mesh fixtures.
_forward_cache: dict = {}


def _cached(builder, eval_fn, cfg, batch_size, data_parallel, mesh):
    if mesh is not None:
        return builder(eval_fn, cfg, batch_size, data_parallel, mesh)
    key = (builder.__name__, eval_fn, cfg, batch_size, data_parallel)
    if key not in _forward_cache:
        _forward_cache[key] = builder(eval_fn, cfg, batch_size, data_parallel)
    return _forward_cache[key]


def make_eval_forward(
    eval_fn: Callable, cfg, batch_size: int, data_parallel: bool, mesh=None
):
    return _cached(_build_eval_forward, eval_fn, cfg, batch_size, data_parallel, mesh)


def make_eval_forward_indexed(
    eval_indexed_fn: Callable, cfg, batch_size: int, data_parallel: bool,
    mesh=None,
):
    return _cached(
        _build_eval_forward_indexed, eval_indexed_fn, cfg, batch_size,
        data_parallel, mesh,
    )


def _build_eval_forward(
    eval_fn: Callable, cfg, batch_size: int, data_parallel: bool, mesh=None
):
    """CLI helper for the eval/LF-compute loops: returns ``(step, place)``
    — the per-batch forward ``step(params, *batch)`` (a plain ``eval_fn``
    partial on one device, or the batch-sharded DP step over the attached
    mesh when ``--data_parallel`` is set — the full-split inference passes
    of 004_eval_model.lua:202-231 / 003_compute_lf_answers.lua:373-482 are
    embarrassingly parallel) and ``place(pytree)``, which commits a
    replicated operand (the params) to the mesh ONCE.  Callers MUST pass
    params through ``place``: an uncommitted params tree would otherwise be
    re-replicated across the mesh on EVERY per-batch dispatch (tens of MB
    x hundreds of batches at novel_v2 scale).  The caller's
    ``pad_to_batch=True`` iteration keeps every batch exactly
    ``batch_size`` rows, so one divisibility check covers the run."""
    if not data_parallel:
        def place(pytree):
            return jax.tree_util.tree_map(jnp.asarray, pytree)

        return functools.partial(eval_fn, cfg), place
    from novel_vqa_tpu.parallel.mesh import (
        make_dp_eval_step,
        make_mesh,
        replicated,
    )

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    if batch_size % n_dev:
        raise ValueError(
            f"--data_parallel: batch_size {batch_size} not divisible by the "
            f"mesh's {n_dev} devices"
        )
    repl = replicated(mesh)

    def place(pytree):
        return jax.device_put(pytree, repl)

    return make_dp_eval_step(cfg, mesh, eval_fn), place


def _build_eval_forward_indexed(
    eval_indexed_fn: Callable, cfg, batch_size: int, data_parallel: bool,
    mesh=None,
):
    """CLI helper for the HBM-resident eval path: returns ``(step, place)``
    where ``step(params, data, qinds)`` takes the device-resident split
    store and a per-batch (B,) index vector — the only per-batch
    host->device transfer — and ``place(pytree)`` uploads a replicated
    operand ONCE with the sharding the step expects.  DP shards the index
    vector; store and params replicate (mesh.make_dp_eval_indexed_step).
    NOTE the memory model this implies on a real multi-chip mesh: a
    replicated store is a FULL COPY per device (a GB-scale split store x N
    chips) — DP eval trades HBM for per-batch host traffic; shard the
    store itself if a split ever outgrows one chip's HBM.
    Callers MUST place BOTH the store and the params through ``place``:
    an uncommitted operand would otherwise be re-replicated across the
    mesh on EVERY per-batch dispatch (~663 MB store x 243 batches at
    novel_v2 scale; params likewise), defeating the upload-once design."""
    if not data_parallel:
        def place(pytree):
            return jax.tree_util.tree_map(jnp.asarray, pytree)

        return functools.partial(eval_indexed_fn, cfg), place
    from novel_vqa_tpu.parallel.mesh import (
        make_dp_eval_indexed_step,
        make_mesh,
        replicated,
    )

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    if batch_size % n_dev:
        raise ValueError(
            f"--data_parallel: batch_size {batch_size} not divisible by the "
            f"mesh's {n_dev} devices"
        )
    repl = replicated(mesh)

    def place(pytree):
        return jax.device_put(pytree, repl)

    return make_dp_eval_indexed_step(cfg, mesh, eval_indexed_fn), place


def gather_batch(data, qinds):
    """HBM-resident batch gather (002_train_baseline.lua:195-222 inverted:
    the dataset lives on device, only indices move).  Shared by the indexed
    training steps and every indexed/scan eval path
    (models/vqa/eval_paths.py)."""
    tokens = jnp.take(data["tokens"], qinds, axis=0)
    labels = jnp.take(data["answers"], qinds, axis=0)
    iminds = jnp.take(data["img_pos"], qinds, axis=0).astype(jnp.int32) - 1
    image = jnp.take(data["image"], iminds, axis=0)
    return tokens, image, labels


_gather_batch = gather_batch  # back-compat alias for in-package callers


def make_vqa_dp_indexed_step(
    loss_fn: Callable, cfg, tx: optax.GradientTransformation, mesh: Mesh
):
    """One DP training step over host-sampled indices: params/opt_state/data
    replicated, the (B,) index vector sharded over ``data`` — each chip
    gathers and processes its batch shard, and the gradient mean all-reduces
    over ICI via GSPMD."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def step(params, opt_state, data, qinds, rng):
        tokens, image, labels = _gather_batch(data, qinds)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, tokens, image, labels, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, shard, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


def vqa_scan_steps(
    loss_fn: Callable, cfg, tx: optax.GradientTransformation,
    params, opt_state, data, rng, n_steps: int, batch_size: int,
    constrain: Callable | None = None,
):
    """THE multi-step sampled-index scan training body — on-device uniform
    batch sampling (statistical parity with the reference's torch.random
    draw, 002_train_baseline.lua:203), HBM-resident gather, fwd/bwd/update
    per step, ``lax.scan`` over ``n_steps``.  Single source of the sampling
    semantics: arch1.train_steps_scan, arch2.train_steps_scan, and the DP
    builder below all delegate here (``constrain`` injects the DP sharding
    constraint on the sampled index vector) so the single-device and DP
    paths cannot drift."""
    n = data["tokens"].shape[0]

    def body(carry, step_rng):
        params, opt_state = carry
        k_sample, k_drop = jax.random.split(step_rng)
        qinds = jax.random.randint(k_sample, (batch_size,), 0, n)
        if constrain is not None:
            qinds = constrain(qinds)
        tokens, image, labels = gather_batch(data, qinds)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, tokens, image, labels, k_drop
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    step_rngs = jax.random.split(rng, n_steps)
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), step_rngs)
    return params, opt_state, losses


def make_vqa_dp_steps_scan(
    loss_fn: Callable,
    cfg,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_steps: int,
    batch_size: int,
    donate: bool = True,
):
    """``n_steps`` DP training iterations in ONE dispatch — the steady-state
    production path on a mesh.  Each step's on-device sampled index vector is
    sharding-constrained over ``data``, so the gather + fwd/bwd run
    batch-sharded per chip with zero per-step host work; the gradient mean
    psums over ICI."""
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def steps(params, opt_state, data, rng):
        return vqa_scan_steps(
            loss_fn, cfg, tx, params, opt_state, data, rng,
            n_steps, batch_size,
            constrain=lambda q: jax.lax.with_sharding_constraint(q, shard),
        )

    return jax.jit(
        steps,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
