"""Sequence alignment helpers.

``right_align`` ports 002_train_vqa_arch1/misc/RNNUtils.lua:54-61: shift each
row's ``length`` leading tokens to the end of the buffer, zero-filling the
front.  Right alignment is what makes the dense masked ``lax.scan`` in
``ops.lstm.lstm_encode`` exactly equivalent to the reference's length-sorted
ragged batching (RNNUtils.lua:84-125): every sequence *ends* at the last step,
so the final scan state is the per-row final LSTM state with no gathers.
"""

from __future__ import annotations

import numpy as np


def right_align(seq: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """seq: (N, D) int tokens (0-padded at the tail); lengths: (N,)."""
    seq = np.asarray(seq)
    lengths = np.asarray(lengths).astype(np.int64)
    out = np.zeros_like(seq)
    D = seq.shape[1]
    for i in range(seq.shape[0]):
        n = int(lengths[i])
        if n > 0:
            out[i, D - n :] = seq[i, :n]
    return out


def right_align_fast(seq: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Vectorized right_align (same output; used on large arrays)."""
    seq = np.asarray(seq)
    lengths = np.asarray(lengths).astype(np.int64)
    N, D = seq.shape
    cols = np.arange(D)[None, :]
    src_idx = cols - (D - lengths[:, None])  # column in seq feeding each slot
    valid = src_idx >= 0
    gathered = np.take_along_axis(seq, np.clip(src_idx, 0, D - 1), axis=1)
    return np.where(valid, gathered, 0).astype(seq.dtype)
