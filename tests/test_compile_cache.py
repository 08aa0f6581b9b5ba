"""Persistent XLA compilation cache (core/compile_cache.py).

Two subprocesses compile the same program with NOVEL_VQA_COMPILE_CACHE
pointed at a shared dir: the first populates it, the second must reuse it
(same key -> no new entries) and agree numerically.  Subprocesses force
the CPU backend the same way conftest does (env var alone is overridden
by the container's axon sitecustomize)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from novel_vqa_tpu.core import compile_cache
d = compile_cache.maybe_enable()
expect = os.path.abspath(os.environ["NOVEL_VQA_COMPILE_CACHE"])
assert d == expect, (d, expect)
# production leaves JAX's >=1s-compile threshold; drop it here so this
# tiny test program qualifies for the cache
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np
f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
print(float(f(jnp.asarray(np.full((32, 32), 0.01, np.float32)))))
"""


def _run(env):
    p = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    assert p.returncode == 0, p.stderr
    return p.stdout.strip().splitlines()[-1]


def test_compile_cache_roundtrip(tmp_path):
    cache_dir = tmp_path / "xla"
    env = dict(os.environ, NOVEL_VQA_COMPILE_CACHE=str(cache_dir))
    first = _run(env)
    entries = sorted(os.listdir(cache_dir))
    assert entries, "first run wrote no cache entries"
    second = _run(env)
    assert second == first
    assert sorted(os.listdir(cache_dir)) == entries, (
        "second run re-compiled (new cache entries) instead of hitting"
    )


def test_disabled_by_default(monkeypatch):
    from novel_vqa_tpu.core import compile_cache

    monkeypatch.delenv("NOVEL_VQA_COMPILE_CACHE", raising=False)
    assert compile_cache.maybe_enable() is None
    monkeypatch.setenv("NOVEL_VQA_COMPILE_CACHE", "0")
    assert compile_cache.maybe_enable() is None
