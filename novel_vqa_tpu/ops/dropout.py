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


def _rbg_key(rng: jax.Array) -> jax.Array:
    """Re-wrap a (threefry) key's data as an ``rbg`` key.

    Threefry bit generation is ALU-heavy on TPU (it is a software cipher on
    the VPU); ``rbg`` maps to XLA's RngBitGenerator, which is what the
    hardware provides.  Dropout masks need statistical independence, not
    cryptographic quality, and the mapping stays a deterministic function of
    the incoming key, so reproducibility from `--seed` is preserved.
    Measured on the v5e this removes most of the 0.43 ms/step (14%) that
    mask generation cost the arch1 train step under threefry.
    """
    data = jax.random.key_data(rng).reshape(-1).astype(jnp.uint32)
    return jax.random.wrap_key_data(jnp.concatenate([data, data])[:4], impl="rbg")


def dropout(rng: jax.Array, x: jax.Array, rate: float, deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(_rbg_key(rng), p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
