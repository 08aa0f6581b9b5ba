"""Device-side answer prediction for the full-split eval loops.

The reference argmaxes on the host after fetching every score matrix
(004_eval_model.lua:250-255 OE; :258-273 MC argmax-over-choices).  Through a
high-latency host<->device link the eval pass is LINK-bound, and the score
fetch is the dominant term once the split store is HBM-resident (500x1000
f32 = 2 MB/batch vs the 2 KB of predictions actually needed) — so the
TPU-native inversion computes both predictions inside the jitted forward and
fetches two (B,) int vectors instead.  Exact same math as the host path:
``jnp.argmax`` and ``np.argmax`` both take the FIRST maximal entry, and the
MC fallback for all-zero choice rows mirrors the host branch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def device_predict(scores, choices=None):
    """OE + MC predictions from a (B, num_output) score matrix.

    ``choices``: optional (B, 18) int32 of 1-indexed MC answer ids, 0 = empty
    slot (the h5 ``MC_ans_test`` layout).  Returns ``(pred, mc_pred)`` — both
    (B,) int32, 1-indexed answer ids; ``mc_pred == pred`` when ``choices`` is
    None (or for rows with no valid choice, matching the host fallback)."""
    pred = (jnp.argmax(scores, axis=1) + 1).astype(jnp.int32)
    if choices is None:
        return pred, pred
    valid = choices != 0
    # scores are 1-indexed by answer id (004_eval_model.lua:263-270); clamp
    # the empty slots to index 0 and mask them to -inf before the argmax
    ch_scores = jnp.take_along_axis(scores, jnp.maximum(choices - 1, 0), axis=1)
    ch_scores = jnp.where(valid, ch_scores, -jnp.inf)
    mc_idx = jnp.argmax(ch_scores, axis=1)
    mc_pred = jnp.take_along_axis(choices, mc_idx[:, None], axis=1)[:, 0]
    mc_pred = jnp.where(valid.any(axis=1), mc_pred, pred).astype(jnp.int32)
    return pred, mc_pred


def host_mc_predict(scores, mc_ans, pred):
    """Host-side MC argmax-over-choices (004_eval_model.lua:258-273) for the
    streaming eval path, where the full (n, num_output) score matrix is on
    host and predictions were not computed on device.  ``mc_ans``: (n, 18)
    int of 1-indexed choice ids, 0 = empty slot; ``pred``: (n,) 1-indexed OE
    argmax ids (the fallback for all-zero choice rows, as ``device_predict``).
    Returns (n,) int64 1-indexed MC answer ids.  Shared by
    eval_vqa_arch{1,2} so the two CLIs cannot drift."""
    out = np.empty(len(pred), dtype=np.int64)
    for i in range(len(pred)):
        choices = mc_ans[i]
        valid = choices[choices != 0].astype(np.int64)
        # scores are 1-indexed by answer id (004_eval_model.lua:263-270)
        out[i] = (
            int(valid[np.argmax(scores[i, valid - 1])])
            if valid.size
            else int(pred[i])
        )
    return out
