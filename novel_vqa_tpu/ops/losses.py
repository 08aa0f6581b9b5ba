"""Loss criteria.

``cross_entropy`` — Torch ``nn.CrossEntropyCriterion`` with 1-indexed targets
(002_train_vqa_arch1/002_train_baseline.lua:157): log-softmax + NLL averaged
over the batch.

``sequence_nll`` — vectorized port of ``nn.LanguageModelCriterion``
(001_train_autoencoder/misc/AutoEncoder.lua:437-474): masked shifted-target
NLL over decoder logprobs, with the END token (= vocab_size+1, the last class)
enforced at the first null position of each sequence, normalized by the total
number of predictions.  The reference implements this as an O(L*N) host loop;
here it is a fused gather/mask reduction that XLA keeps on-device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def cross_entropy(scores: jax.Array, labels_1indexed: jax.Array) -> jax.Array:
    """scores: (N, C); labels are 1-indexed class ids (uint32 from the h5)."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    labels0 = labels_1indexed.astype(jnp.int32) - 1
    picked = jnp.take_along_axis(logp, labels0[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def sequence_nll(logprobs: jax.Array, seq: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Masked sequence NLL.

    Args:
      logprobs: (L, N, M+1) log-probabilities (L = D + 1: each step predicts
        the next token; the extra step predicts END).  For the arch2 AE, whose
        decoder emits D+2 steps because of the image tick, slice off the image
        step before calling (the reference sets loss 0 there,
        AutoEncoder.lua:431).
      seq: (D, N) int tokens, 1-indexed, 0 = null padding (zeros only as a
        suffix — prepro guarantees no interior zeros,
        000_prepro_vqa.py:154-156).

    Returns (loss, n) where n is the number of scored predictions, matching
    ``loss / n`` normalization at AutoEncoder.lua:471-472.
    """
    L, N, Mp1 = logprobs.shape
    D = seq.shape[0]
    assert D == L - 1, "logprobs must have one more step than seq"

    targets, scored = sequence_targets(seq, Mp1)
    # gather logprobs at target indices (targets are 1-indexed; class c is
    # stored at position c-1)
    gather_idx = jnp.clip(targets - 1, 0, Mp1 - 1)
    picked = jnp.take_along_axis(logprobs, gather_idx[:, :, None], axis=-1)[:, :, 0]
    n = jnp.sum(scored)
    loss = -jnp.sum(jnp.where(scored, picked, 0.0)) / n.astype(logprobs.dtype)
    return loss, n


def sequence_targets(seq: jax.Array, Mp1: int) -> Tuple[jax.Array, jax.Array]:
    """Shifted targets + scored mask for the LanguageModelCriterion.

    seq: (D, N) 1-indexed tokens, 0 = null suffix.  Returns
    (targets (D+1, N) with END=Mp1 at each sequence's first null,
     scored (D+1, N) bool).  Shared by :func:`sequence_nll` and the fused
    in-scan decoder loss (models/seq/autoencoder.decode_teacher_forced_nll)
    so both implement AutoEncoder.lua:450-462 identically.
    """
    D, N = seq.shape
    seq = seq.astype(jnp.int32)
    # target at step t: seq[t] for t < D, else 0 (pad), AutoEncoder.lua:450-454
    targets = jnp.concatenate([seq, jnp.zeros((1, N), jnp.int32)], axis=0)
    # first null along time becomes the END token (last class), :456-459
    is_null = targets == 0
    # index of the first null per column (there is always one: we appended it)
    first_null = jnp.argmax(is_null, axis=0)  # (N,)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (D + 1, N), 0)
    at_end = t_idx == first_null[None, :]
    targets = jnp.where(at_end, Mp1, targets)
    scored = targets != 0  # :462 — loss only where target is non-null
    return targets, scored
