"""Opt-in persistent XLA compilation cache.

Real-shape compiles are the dominant one-time cost of every production
process: the round-4 rehearsal measured 438-651 s to compile the bs-128
extraction forward and ~90 s for the arch1 train scan through the tunnel
(docs/STATUS.md "Real-dimension rehearsal").  The reference pays nothing
comparable (torch eager), so amortizing our compile across processes is
part of matching its end-to-end wall time: with the cache enabled a
re-run of the same program on the same machine deserializes the
executable instead of recompiling.

``NOVEL_VQA_COMPILE_CACHE=<dir>`` enables it for every CLI (the hook sits
in ``core.config.parse_config``, the one funnel all tools parse through)
and for ``bench.py``.  Unset/empty/``0`` leaves JAX's default (no
persistent cache) — tests never set it, so test isolation is unaffected.

Scope notes, measured:
- CPU backend: verified working (entries written, reloaded across
  processes — ``tests/test_compile_cache.py``).
- The tunneled axon TPU backend compiles server-side; whether the client
  observes cacheable serialized executables is deployment-dependent —
  the cache degrades to a no-op when the backend does not support
  executable serialization (JAX skips it, with a warning under
  ``jax_explain_cache_misses``), never to an error.
"""

from __future__ import annotations

import os


def maybe_enable() -> str | None:
    """Point JAX's persistent compilation cache at $NOVEL_VQA_COMPILE_CACHE.

    Returns the cache directory when enabled, else None.  Safe to call
    any number of times and after backend initialization (the cache is
    consulted per-compile, not at backend init)."""
    path = os.environ.get("NOVEL_VQA_COMPILE_CACHE", "")
    if not path or path == "0":
        return None
    import jax

    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
