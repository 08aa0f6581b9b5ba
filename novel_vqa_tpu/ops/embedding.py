"""Token embedding.

The reference's arch1 word embedding is ``one-hot(V) @ Linear(V, E)`` with a
bias, dropout 0.5 and tanh (002_train_vqa_arch1/002_train_baseline.lua:141-144,
one-hot scatter at misc/RNNUtils.lua:42-53).  A one-hot times a Linear is an
embedding row lookup plus the shared bias — so on TPU we skip the one-hot
scatter entirely (SURVEY.md section 2.7) and gather rows with ``jnp.take``,
which XLA lowers to an efficient dynamic-gather.

The autoencoders use a bias-free ``nn.LookupTable``
(misc/AutoEncoder.lua:28); pass ``bias=None`` for those.  Null (0) tokens are
redirected to row 0 and the caller masks them out, mirroring the
``it[torch.eq(it,0)] = 1`` trick at AutoEncoder.lua:285 (1-indexed there).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def embedding_lookup(
    table: jax.Array,  # (V, E): row v-1 holds the embedding of 1-indexed token v
    tokens: jax.Array,  # int tokens, 1-indexed, 0 = null
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    idx = jnp.clip(tokens.astype(jnp.int32) - 1, 0, table.shape[0] - 1)
    out = jnp.take(table, idx, axis=0)
    if bias is not None:
        out = out + bias
    return out
