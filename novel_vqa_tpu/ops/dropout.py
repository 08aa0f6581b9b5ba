"""Functional inverted dropout.

Semantics match Torch ``nn.Dropout`` (v7, ``train`` mode): each element is
zeroed with probability ``rate`` and survivors are scaled by ``1/(1-rate)``;
in evaluate mode the layer is the identity.  The reference applies 0.5 dropout
inside the question embedding (002_train_vqa_arch1/002_train_baseline.lua:143),
between LSTM layers (misc/LSTM.lua:37), and on both fusion inputs
(misc/netdef.lua:10-11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(rng: jax.Array, x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
