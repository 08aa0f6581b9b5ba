"""Shared full-split inference driver for the eval/LF-compute CLIs.

One function runs a whole split through any of the three data-movement
strategies (the round-4 A/B record in docs/PERF.md §"Full-split eval"):

* ``hbm_resident and not data_parallel`` (default) — the split as ONE XLA
  program (``eval_predict_scan``/``eval_scores_scan`` over the HBM-resident
  store); score results come back through ``fetch_chunked``.
* ``hbm_resident and data_parallel`` — per-batch dispatches with the (B,)
  index vector sharded over the mesh, store AND params replicated and
  placed ONCE (``make_eval_forward_indexed``'s ``place``), deferred fetches.
* ``not hbm_resident`` — stream every batch host->device (for stores larger
  than device memory); optionally batch-sharded DP (params placed ONCE).

Callers: train/eval_vqa_arch1.py, train/eval_vqa_arch2.py,
train/lf_ensemble.py (reference loops 004_eval_model.lua:202-273,
003_compute_lf_answers.lua:373-482).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.parallel.dp import (
    DeferredFetch,
    fetch_chunked,
    make_eval_forward,
    make_eval_forward_indexed,
)


def run_full_split(
    arch, cfg, params, data, split: str, batch_size: int, *,
    hbm_resident: bool = True, data_parallel: bool = False,
    want: str = "predict",
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], Optional[np.ndarray]]:
    """Forward one whole split; returns ``(pred, mc_pred, scores)``.

    ``want='predict'``: pred/mc_pred are (n,) int64 1-indexed answer ids
    (device-side OE/MC argmax — models/vqa/predict.py) and ``scores`` is
    None (never materialized on host).  ``want='scores'``: the full (n,
    num_output) f32 score matrix with pred/mc_pred None (callers argmax on
    host, preserving the reference's host-side MC semantics bit for bit).
    The streaming path only produces scores (``arch.eval_step``), so
    ``want='predict'`` is invalid there (raises) — callers argmax the
    returned scores instead."""
    if not hbm_resident and want == "predict":
        raise ValueError(
            "run_full_split: the streaming path (hbm_resident=False) only "
            "produces scores (arch.eval_step) — pass want='scores' and "
            "argmax on host (models/vqa/predict.host_mc_predict)"
        )
    n = data.num_examples(split)

    if hbm_resident and not data_parallel:
        # single device, ONE dispatch for the whole split: the store (and
        # params, inside the scan call) upload once by construction
        store = jax.tree_util.tree_map(jnp.asarray, data.split_store(split))
        n_batches = -(-n // batch_size)
        if want == "predict":
            _, pred_m, mc_m = arch.eval_predict_scan(
                cfg, params, store, n_batches, batch_size
            )
            pred = np.asarray(pred_m).reshape(-1)[:n].astype(np.int64)
            mc_pred = np.asarray(mc_m).reshape(-1)[:n].astype(np.int64)
            return pred, mc_pred, None
        _, scores_m = arch.eval_scores_scan(
            cfg, params, store, n_batches, batch_size
        )
        # chunked fetch: a single-shot np.asarray of the ~0.5-0.9 GB score
        # block measures ~1.5 MB/s through the tunnel; slices sustain
        # ~30-38 MB/s (parallel.dp.fetch_chunked)
        scores_m = fetch_chunked(scores_m)
        return None, None, scores_m.reshape(-1, scores_m.shape[-1])[:n]

    if hbm_resident:
        fn = (
            arch.eval_predict_indexed if want == "predict"
            else arch.eval_step_indexed
        )
        step, place = make_eval_forward_indexed(fn, cfg, batch_size, True)
        store = place(data.split_store(split))
        params = place(params)  # commit ONCE, not re-replicated per dispatch
        fetch = DeferredFetch()
        for start in range(0, n, batch_size):
            real = min(n, start + batch_size) - start
            idx = np.arange(start, start + batch_size, dtype=np.int32)
            if real < batch_size:
                idx[real:] = 0  # pad with row 0; trimmed via `real` below
            out = step(params, store, jnp.asarray(idx))
            payload = out[1] if want == "scores" else jnp.stack([out[1], out[2]])
            fetch.put(payload, real)
        res = fetch.results()
        if want == "scores":
            return None, None, np.concatenate([s[:r] for s, r in res])
        pred = np.concatenate([p[0][:r] for p, r in res]).astype(np.int64)
        mc_pred = np.concatenate([p[1][:r] for p, r in res]).astype(np.int64)
        return pred, mc_pred, None

    step, place = make_eval_forward(arch.eval_step, cfg, batch_size, data_parallel)
    params = place(params)  # commit ONCE, not re-replicated per dispatch
    fetch = DeferredFetch()
    for batch in data.iter_split(split, batch_size, pad_to_batch=True):
        _, scores = step(
            params,
            jnp.asarray(batch.tokens),
            jnp.asarray(batch.image),
            jnp.asarray(batch.labels),
        )
        fetch.put(scores, len(batch.question_id))
    return None, None, np.concatenate([s[:r] for s, r in fetch.results()])
