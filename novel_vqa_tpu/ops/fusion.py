"""Multimodal fusion blocks: AxB, AskipB, A_B.

Reference: 002_train_vqa_arch1/misc/netdef.lua.

    AxB    (netdef.lua:6-14):  tanh(Wq·drop(q)) * tanh(Wi·drop(i))
    AskipB (netdef.lua:16-25): qc + qc*ic  (elementwise product plus a skip
                               add of the question projection)
    A_B    (netdef.lua:27-35): concat(qc, ic)

Weights are stored (in_features, out_features); the Torch checkpoints store
(out, in) and ``core.checkpoint`` transposes on conversion.  All three blocks
are single fused XLA computations — two MXU GEMMs plus a VPU epilogue.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from novel_vqa_tpu.ops.dropout import dropout

AxBParams = Dict[str, jax.Array]  # {"wq", "bq", "wi", "bi"}


def axb_init(
    rng: jax.Array, nh_a: int, nh_b: int, nh_common: int, scale: float = 0.08,
    dtype=jnp.float32,
) -> AxBParams:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -scale, scale)
    return {
        "wq": u(k1, (nh_a, nh_common)),
        "bq": u(k2, (nh_common,)),
        "wi": u(k3, (nh_b, nh_common)),
        "bi": u(k4, (nh_common,)),
    }


def _projections(
    params: AxBParams,
    q: jax.Array,
    i: jax.Array,
    rate: float,
    rng: jax.Array | None,
    deterministic: bool,
) -> Tuple[jax.Array, jax.Array]:
    if rng is not None and not deterministic and rate > 0.0:
        kq, ki = jax.random.split(rng)
        q = dropout(kq, q, rate, deterministic=False)
        i = dropout(ki, i, rate, deterministic=False)
    qc = jnp.tanh(jnp.dot(q, params["wq"], preferred_element_type=jnp.float32) + params["bq"])
    ic = jnp.tanh(jnp.dot(i, params["wi"], preferred_element_type=jnp.float32) + params["bi"])
    return qc, ic


def axb_apply(
    params: AxBParams,
    q: jax.Array,
    i: jax.Array,
    *,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    qc, ic = _projections(params, q, i, dropout_rate, rng, deterministic)
    return qc * ic


def askipb_apply(
    params: AxBParams,
    q: jax.Array,
    i: jax.Array,
    *,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    qc, ic = _projections(params, q, i, dropout_rate, rng, deterministic)
    return qc + qc * ic


def a_b_apply(
    params: AxBParams,
    q: jax.Array,
    i: jax.Array,
    *,
    dropout_rate: float = 0.0,
    rng: jax.Array | None = None,
    deterministic: bool = True,
) -> jax.Array:
    qc, ic = _projections(params, q, i, dropout_rate, rng, deterministic)
    return jnp.concatenate([qc, ic], axis=-1)
