"""Tracing / profiling hooks.

The reference's only instrumentation is an unused ``torch.Timer`` and xlua
progress bars (SURVEY.md section 5).  TPU-native equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (enable per-tool with ``--profile_dir``);
  * :class:`StepTimer` — wall-clock throughput reporter (QA-pairs/sec,
    images/sec) with deferred device syncs so timing does not serialize the
    pipeline;
  * :func:`nan_guard` — optional ``jax_debug_nans`` toggle, the analog of the
    reference's loss-explosion watchdog for localizing the faulting op.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard(enabled: bool = True) -> Iterator[None]:
    import jax

    if not enabled:
        yield
        return
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Throughput over a window of steps; call ``tick(n_items)`` per step and
    read ``rate()`` (items/sec) at log points."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.items = 0

    def tick(self, n_items: int):
        self.items += n_items

    def rate(self, reset: bool = True) -> float:
        dt = time.perf_counter() - self.t0
        r = self.items / dt if dt > 0 else 0.0
        if reset:
            self.t0 = time.perf_counter()
            self.items = 0
        return r
