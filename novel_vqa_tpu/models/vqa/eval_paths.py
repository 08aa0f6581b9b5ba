"""Shared HBM-resident eval paths for both VQA architectures.

arch1 and arch2 expose the same forward contract —
``apply(params, cfg, tokens, image, deterministic=True) -> (B, num_output)``
— so every indexed/scan eval variant is one factory parameterized by that
``apply`` (the same convention as the shared DP builders in parallel/dp.py).
The four paths, all mirrors of the reference's full-split eval loop
(004_eval_model.lua:202-231, which holds the whole ``fv_im`` store resident
for the pass):

* ``eval_step_indexed(cfg, params, data, qinds)`` — per-batch forward over
  the HBM-resident split store: only the (B,) index vector crosses the host
  boundary (the streaming loop re-shipped ~8 MB of fc7 per batch and stayed
  upload-bound through a high-latency link — round-4 A/B, docs/PERF.md).
  Returns ``(loss, scores)``.
* ``eval_predict_indexed`` — same + device-side OE/MC argmax
  (models.vqa.predict.device_predict): the per-batch fetch shrinks from the
  (B, num_output) score matrix to two (B,) int vectors.  Returns
  ``(loss, pred, mc_pred)``, preds (B,) int32 1-indexed.
* ``eval_predict_scan(cfg, params, data, n_batches, batch_size)`` — the
  ENTIRE split as ONE XLA program: ``lax.scan`` over contiguous index
  chunks + device argmax, one dispatch and one ~KB-scale fetch.  Through a
  high-latency link the per-batch loop pays full RTT per dispatch even
  deep-pipelined (611 -> 60-118 s at novel_v2 scale, docs/PERF.md) — the
  same inversion ``train_steps_scan`` applies to training.  Out-of-range
  rows of the final chunk are clamped to the last row (callers trim).
  Returns ``(losses, pred, mc_pred)`` with preds (n_batches, batch_size).
* ``eval_scores_scan`` — same scan but returning the full score matrices
  for workloads that genuinely need every score on host (the LF ensemble's
  three-split dump, 003_compute_lf_answers.lua:373-482, and
  ``--dump_scores_h5``); fetch with ``parallel.dp.fetch_chunked``.

``data`` keys match ``train_step_indexed``: tokens (N,D), image (M,F),
img_pos (N,) 1-indexed, answers (N,) (zeros for unlabeled splits — the loss
is then meaningless and ignored), optional mc_ans (N,18) (absent means
``mc_pred == pred``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from novel_vqa_tpu.ops import cross_entropy
from novel_vqa_tpu.parallel.dp import gather_batch


def _gather_choices(data, qinds):
    return (
        jnp.take(data["mc_ans"], qinds, axis=0).astype(jnp.int32)
        if "mc_ans" in data
        else None
    )


def build_eval_fns(apply_fn):
    """Returns ``(eval_step_indexed, eval_predict_indexed,
    eval_predict_scan, eval_scores_scan)`` for one architecture's
    ``apply``.

    CAVEAT on the scan losses: the final chunk clamps out-of-range indices
    to row ``n-1``, so its per-batch cross-entropy averages DUPLICATED rows
    whenever ``n % batch_size != 0`` — the final-chunk loss term (and any
    split loss derived from the scan outputs) is biased.  Every current
    caller trims preds/scores by ``n`` and discards the losses; a caller
    that starts consuming them must mask the padded rows first (ADVICE
    round-4)."""
    from novel_vqa_tpu.models.vqa.predict import device_predict

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step_indexed(cfg, params, data, qinds):
        tokens, image, labels = gather_batch(data, qinds)
        scores = apply_fn(params, cfg, tokens, image, deterministic=True)
        return cross_entropy(scores, labels), scores

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_predict_indexed(cfg, params, data, qinds):
        tokens, image, labels = gather_batch(data, qinds)
        scores = apply_fn(params, cfg, tokens, image, deterministic=True)
        pred, mc_pred = device_predict(scores, _gather_choices(data, qinds))
        return cross_entropy(scores, labels), pred, mc_pred

    def _scan(cfg, params, data, n_batches, batch_size, chunk_out):
        n = data["tokens"].shape[0]

        def body(_, i):
            qinds = jnp.minimum(
                i * batch_size + jnp.arange(batch_size, dtype=jnp.int32),
                n - 1,
            )
            tokens, image, labels = gather_batch(data, qinds)
            scores = apply_fn(params, cfg, tokens, image, deterministic=True)
            return None, (cross_entropy(scores, labels),) + chunk_out(
                scores, data, qinds
            )

        _, outs = jax.lax.scan(body, None, jnp.arange(n_batches, dtype=jnp.int32))
        return outs

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def eval_predict_scan(cfg, params, data, n_batches: int, batch_size: int):
        return _scan(
            cfg, params, data, n_batches, batch_size,
            lambda scores, data, qinds: device_predict(
                scores, _gather_choices(data, qinds)
            ),
        )

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def eval_scores_scan(cfg, params, data, n_batches: int, batch_size: int):
        return _scan(
            cfg, params, data, n_batches, batch_size,
            lambda scores, data, qinds: (scores,),
        )

    return eval_step_indexed, eval_predict_indexed, eval_predict_scan, eval_scores_scan
