"""Fused 2-layer full-sequence LSTM TRAINING kernel — the round-4 attempt at
the parked "structural floor" question (docs/PERF.md: the 2.29 ms arch1 step
is op-time-bound with ~520 us of HBM<->VMEM state staging + slice traffic).

Idea (VERDICT round-3 item 7): run BOTH layers' recurrences inside ONE
``pallas_call`` with the wavefront inside the kernel — iteration t computes
layer-1 step t and layer-2 step t-1, two *independent* matmul groups that
pipeline on the MXU — with all four weight matrices VMEM-resident for the
whole sequence and the inter-layer states never leaving VMEM.  The backward
is a single hand-structured XLA function (one custom-VJP boundary for the
whole encode instead of 32 per-step ones): gate pre-activations recomputed
in full-size matmuls from the saved hidden states, and a combined
reverse-wavefront over both layers whose sequential core is two MXU ops per
step.

Numerics: the four weight matrices alone are 14.2 MB fp32 — over the ~16 MB
scoped-VMEM budget once blocks are added — so this route stores weights,
saved states, and the inter-layer dropout mask in **bf16** (f32 matmul
accumulation via ``preferred_element_type``, f32 state carries in-kernel).
That makes it ALSO the test of the round-3 "bf16 VMEM-resident saved
states" hypothesis.  The backward recomputes gates from the same
bf16-rounded operands the forward consumed, so fwd/bwd are self-consistent;
vs the f32 XLA path expect ~1e-2-relative deviation.

Contract matches ``ops.lstm.lstm_encode`` in training mode for
``len(params) == 2``: returns the final ``(c, h)`` stacks, inter-layer
dropout only (misc/LSTM.lua:36-38 — none on the recurrent path), masked
right-aligned semantics.  Routed by ``NOVEL_VQA_FUSED2=1`` (A/B knob —
adopted/rejected record in docs/PERF.md).

Reference math: misc/LSTM_encoder.lua:32-50 (fused 4H gates); clone-buffer
machinery (misc/RNNUtils.lua:66-81) deleted by design.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _gate_slices(gates, H):
    i = jax.nn.sigmoid(gates[..., 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H : 2 * H])
    o = jax.nn.sigmoid(gates[..., 2 * H : 3 * H])
    g = jnp.tanh(gates[..., 3 * H : 4 * H])
    return i, f, o, g


def _seq2_kernel(
    xs_ref, mask_ref, drop_ref,
    wx1_ref, wh1_ref, b1_ref, wx2_ref, wh2_ref, b2_ref,
    c1_ref, h1_ref, c2_ref, h2_ref, hs1_ref, hs2_ref,
):
    """One batch tile, all T steps, both layers wavefronted.

    Iteration t computes layer-1 step t and layer-2 step t-1 — independent
    work (layer 2 consumes the PREVIOUS iteration's dropped h1), so the two
    gate GEMMs overlap on the MXU instead of serializing.  T is static; the
    loop is Python-unrolled at trace time (T = 16 for every reference
    workload).
    """
    T = xs_ref.shape[0]
    H = c1_ref.shape[-1]
    tile = c1_ref.shape[0]
    f32 = jnp.float32
    bf = jnp.bfloat16

    c1 = jnp.zeros((tile, H), f32)
    h1 = jnp.zeros((tile, H), f32)
    c2 = jnp.zeros((tile, H), f32)
    h2 = jnp.zeros((tile, H), f32)
    d_prev = None  # dropped layer-1 hidden state feeding layer 2

    for t in range(T + 1):
        d_new = None
        if t < T:
            gates1 = (
                jnp.dot(xs_ref[t], wx1_ref[:], preferred_element_type=f32)
                + jnp.dot(h1.astype(bf), wh1_ref[:], preferred_element_type=f32)
                + b1_ref[:].astype(f32)
            )
            i1, f1, o1, g1 = _gate_slices(gates1, H)
            c1n = f1 * c1 + i1 * g1
            h1n = o1 * jnp.tanh(c1n)
            m = mask_ref[t].astype(f32)  # (tile, 1) broadcasts over H
            c1 = jnp.where(m > 0, c1n, c1)
            h1 = jnp.where(m > 0, h1n, h1)
            hs1_ref[t] = h1.astype(bf)
            # layer 2 consumes exactly what the backward rebuilds from the
            # SAVED bf16 h1 (see _fused2_bwd d1): multiply the stored
            # rounding, not the f32 h1 — otherwise the backward linearizes
            # at a last-bit-different point than the forward evaluated
            d_new = (h1.astype(bf).astype(f32) * drop_ref[t].astype(f32)).astype(bf)
        if t > 0:
            gates2 = (
                jnp.dot(d_prev, wx2_ref[:], preferred_element_type=f32)
                + jnp.dot(h2.astype(bf), wh2_ref[:], preferred_element_type=f32)
                + b2_ref[:].astype(f32)
            )
            i2, f2, o2, g2 = _gate_slices(gates2, H)
            c2n = f2 * c2 + i2 * g2
            h2n = o2 * jnp.tanh(c2n)
            m = mask_ref[t - 1].astype(f32)
            c2 = jnp.where(m > 0, c2n, c2)
            h2 = jnp.where(m > 0, h2n, h2)
            hs2_ref[t - 1] = h2.astype(bf)
        d_prev = d_new

    c1_ref[:] = c1
    h1_ref[:] = h1
    c2_ref[:] = c2
    h2_ref[:] = h2


def _seq2_forward(xs, mask, drop, wx1, wh1, b1, wx2, wh2, b2,
                  *, tile_n: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, N, In = xs.shape
    H = wh1.shape[0]
    pad_n = _round_up(max(N, 8), tile_n)
    if pad_n != N:
        xs = jnp.pad(xs, ((0, 0), (0, pad_n - N), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_n - N)))
        drop = jnp.pad(drop, ((0, 0), (0, pad_n - N), (0, 0)))
    mask3 = mask[:, :, None].astype(jnp.float32)

    grid = (pad_n // tile_n,)
    tile3 = lambda width: pl.BlockSpec(
        (T, tile_n, width), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    row = lambda width: pl.BlockSpec(
        (tile_n, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _seq2_kernel,
        grid=grid,
        in_specs=[
            tile3(In), tile3(1), tile3(H),
            full(wx1.shape), full(wh1.shape), full((1, 4 * H)),
            full(wx2.shape), full(wh2.shape), full((1, 4 * H)),
        ],
        out_specs=(
            row(H), row(H), row(H), row(H),
            tile3(H), tile3(H),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
            jax.ShapeDtypeStruct((T, pad_n, H), jnp.bfloat16),
            jax.ShapeDtypeStruct((T, pad_n, H), jnp.bfloat16),
        ),
        interpret=interpret,
    )(xs, mask3, drop, wx1, wh1, b1.reshape(1, -1), wx2, wh2, b2.reshape(1, -1))
    c1, h1, c2, h2, hs1, hs2 = out
    return (c1[:N], h1[:N], c2[:N], h2[:N], hs1[:, :N], hs2[:, :N])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused2(xs, mask, drop, wx1, wh1, b1, wx2, wh2, b2, tile_n, interpret):
    out = _seq2_forward(xs, mask, drop, wx1, wh1, b1, wx2, wh2, b2,
                        tile_n=tile_n, interpret=interpret)
    return out[:4]


def _fused2_fwd(xs, mask, drop, wx1, wh1, b1, wx2, wh2, b2, tile_n, interpret):
    out = _seq2_forward(xs, mask, drop, wx1, wh1, b1, wx2, wh2, b2,
                        tile_n=tile_n, interpret=interpret)
    res = (xs, mask, drop, wx1, wh1, b1, wx2, wh2, b2, out[4], out[5])
    return out[:4], res


def _rebuild_c(i, f, g, m):
    """Elementwise forward scan: per-step pre-mask candidate c_new and the
    post-mask c_{t-1} (both needed by the gate derivatives)."""
    def body(c_prev, inp):
        i_t, f_t, g_t, m_t = inp
        c_new = f_t * c_prev + i_t * g_t
        c_state = jnp.where(m_t > 0, c_new, c_prev)
        return c_state, (c_new, c_prev)

    N, H = i.shape[1], i.shape[2]
    _, (c_new_seq, c_prev_seq) = jax.lax.scan(
        body, jnp.zeros((N, H), jnp.float32), (i, f, g, m)
    )
    return c_new_seq, c_prev_seq


def _layer_reverse_step(dh_in, dh_carry, dc_carry, i_t, f_t, o_t, g_t,
                        c_prev, tanh_ct, m_t):
    """One masked reverse LSTM step given the step's total incoming dh.
    Returns (dgates_t, dh_passthrough, dc_prev)."""
    dh_t = dh_in + dh_carry
    dc_t = dc_carry
    dh_new = m_t * dh_t
    dc_new = m_t * dc_t + dh_new * o_t * (1.0 - tanh_ct * tanh_ct)
    do = dh_new * tanh_ct
    di = dc_new * g_t
    df = dc_new * c_prev
    dg = dc_new * i_t
    dgates_t = jnp.concatenate(
        [
            di * i_t * (1.0 - i_t),
            df * f_t * (1.0 - f_t),
            do * o_t * (1.0 - o_t),
            dg * (1.0 - g_t * g_t),
        ],
        axis=-1,
    )
    dh_pass = (1.0 - m_t) * dh_t
    dc_prev = dc_new * f_t + (1.0 - m_t) * dc_t
    return dgates_t, dh_pass, dc_prev


def _fused2_bwd(tile_n, interpret, res, cts):
    """Combined hand-structured backward for both layers.

    Structure mirrors pallas_lstm._seq_bwd but for the whole 2-layer stack
    behind ONE custom-VJP boundary:
      1. both layers' gate pre-activations recomputed in full-size matmuls
         from the saved bf16 hidden states (identical rounding to what the
         forward's MXU consumed);
      2. cheap elementwise scans rebuild both cell-state sequences;
      3. a REVERSE WAVEFRONT (Python-unrolled, T static) carries
         (dh, dc) for both layers: iteration k runs layer-2 step T-1-k and
         layer-1 step T-k — independent, so their two per-step MXU ops
         (dgates2 @ [Wx2|Wh2]^T and dgates1 @ Wh1^T) overlap;
      4. dWx/dWh/db/dxs land as single big matmuls over the (T*N) axis.
    """
    xs, mask, drop, wx1, wh1, b1, wx2, wh2, b2, hs1, hs2 = res
    dc1_fin, dh1_fin, dc2_fin, dh2_fin = cts
    T, N, In = xs.shape
    H = wh1.shape[0]
    f32 = jnp.float32
    bf = jnp.bfloat16

    m = mask[..., None].astype(f32)  # (T, N, 1)
    drop_f = drop.astype(f32)

    # 1. full-size gate recomputation (bf16 operands, f32 accumulation —
    #    the same products the forward computed)
    z1 = jnp.zeros((1, N, H), bf)
    h1_prev = jnp.concatenate([z1, hs1[:-1]], axis=0)
    h2_prev = jnp.concatenate([z1, hs2[:-1]], axis=0)
    d1 = (hs1.astype(f32) * drop_f).astype(bf)  # layer-2 inputs
    gates1 = (
        jnp.einsum("tni,ij->tnj", xs, wx1, preferred_element_type=f32)
        + jnp.einsum("tnh,hj->tnj", h1_prev, wh1, preferred_element_type=f32)
        + b1.astype(f32)
    )
    gates2 = (
        jnp.einsum("tnh,hj->tnj", d1, wx2, preferred_element_type=f32)
        + jnp.einsum("tnh,hj->tnj", h2_prev, wh2, preferred_element_type=f32)
        + b2.astype(f32)
    )
    i1, f1, o1, g1 = _gate_slices(gates1, H)
    i2, f2, o2, g2 = _gate_slices(gates2, H)

    # 2. rebuild cell-state sequences
    c1_new, c1_prev = _rebuild_c(i1, f1, g1, m)
    c2_new, c2_prev = _rebuild_c(i2, f2, g2, m)
    t1c = jnp.tanh(c1_new)
    t2c = jnp.tanh(c2_new)

    # 3. reverse wavefront.  Layer-2 step t yields d(hs1_t) (through Wx2 and
    #    the dropout mask); layer-1 step t consumes it one iteration later.
    w2_cat_t = jnp.concatenate([wx2, wh2], axis=0).T.astype(bf)  # (4H, 2H)
    wh1_t = wh1.T.astype(bf)
    dh1_c, dc1_c = dh1_fin, dc1_fin
    dh2_c, dc2_c = dh2_fin, dc2_fin
    dgates1_list = [None] * T
    dgates2_list = [None] * T
    dh1_from2 = None  # d(hs1_t) produced by layer-2 step t
    for k in range(T + 1):
        t2 = T - 1 - k
        t1 = T - k
        new_dh1_from2 = None
        if t2 >= 0:
            dgates2_t, dh2_pass, dc2_c = _layer_reverse_step(
                jnp.zeros_like(dh2_c), dh2_c, dc2_c,
                i2[t2], f2[t2], o2[t2], g2[t2], c2_prev[t2], t2c[t2], m[t2],
            )
            dgates2_list[t2] = dgates2_t
            both = jnp.dot(dgates2_t.astype(bf), w2_cat_t,
                           preferred_element_type=f32)
            # d(d1_t2) -> d(hs1_t2) through the dropout multiplier
            new_dh1_from2 = both[:, :H] * drop_f[t2]
            dh2_c = both[:, H:] + dh2_pass
        if 0 <= t1 <= T - 1:
            dgates1_t, dh1_pass, dc1_c = _layer_reverse_step(
                dh1_from2, dh1_c, dc1_c,
                i1[t1], f1[t1], o1[t1], g1[t1], c1_prev[t1], t1c[t1], m[t1],
            )
            dgates1_list[t1] = dgates1_t
            dh1_c = (
                jnp.dot(dgates1_t.astype(bf), wh1_t, preferred_element_type=f32)
                + dh1_pass
            )
        dh1_from2 = new_dh1_from2

    dgates1 = jnp.stack(dgates1_list)
    dgates2 = jnp.stack(dgates2_list)

    # 4. the heavy lifting: full-size matmuls over the (T*N) axis
    dg1_b = dgates1.astype(bf)
    dg2_b = dgates2.astype(bf)
    dxs = jnp.einsum("tnj,ij->tni", dg1_b, wx1, preferred_element_type=f32)
    dwx1 = jnp.einsum("tni,tnj->ij", xs, dg1_b, preferred_element_type=f32)
    dwh1 = jnp.einsum("tnh,tnj->hj", h1_prev, dg1_b, preferred_element_type=f32)
    dwx2 = jnp.einsum("tnh,tnj->hj", d1, dg2_b, preferred_element_type=f32)
    dwh2 = jnp.einsum("tnh,tnj->hj", h2_prev, dg2_b, preferred_element_type=f32)
    db1 = dgates1.sum(axis=(0, 1))
    db2 = dgates2.sum(axis=(0, 1))
    return (
        dxs.astype(xs.dtype), None, None,
        dwx1.astype(wx1.dtype), dwh1.astype(wh1.dtype), db1.astype(b1.dtype),
        dwx2.astype(wx2.dtype), dwh2.astype(wh2.dtype), db2.astype(b2.dtype),
    )


_fused2.defvjp(_fused2_fwd, _fused2_bwd)


def fused2_encode_train(
    layers: Sequence[Dict[str, jax.Array]],
    xs: jax.Array,  # (T, N, In) time-major, any float dtype (cast to bf16)
    mask: jax.Array,  # (T, N)
    dropout_rate: float,
    rng,
    *,
    tile_n: int = 64,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ``lstm_encode(..., deterministic=False)`` with exactly two
    layers: returns stacked final ``(c, h)`` of shape (2, N, H).

    The inter-layer dropout mask is drawn once for the whole sequence with
    the rbg generator (ops.dropout) — distribution-identical to the
    per-step draws (independent Bernoulli per (t, n, h)); draw ORDER differs,
    which only matters for bitwise RNG coupling that is impossible vs the
    reference anyway (SURVEY.md section 7).
    """
    assert len(layers) == 2, "fused2 route is specialized to rnn_layer=2"
    T, N, _ = xs.shape
    H = layers[0]["wh"].shape[0]
    bf = jnp.bfloat16
    if dropout_rate > 0.0 and rng is not None:
        from novel_vqa_tpu.ops.dropout import dropout

        # one rbg draw for the whole sequence: multiplier in {0, 1/keep}
        drop = dropout(
            rng, jnp.ones((T, N, H), jnp.float32), dropout_rate,
            deterministic=False,
        ).astype(bf)
    else:
        drop = jnp.ones((T, N, H), bf)

    c1, h1, c2, h2 = _fused2(
        xs.astype(bf), mask, drop,
        layers[0]["wx"].astype(bf), layers[0]["wh"].astype(bf),
        (layers[0]["bx"] + layers[0]["bh"]).astype(bf),
        layers[1]["wx"].astype(bf), layers[1]["wh"].astype(bf),
        (layers[1]["bx"] + layers[1]["bh"]).astype(bf),
        tile_n, interpret,
    )
    return jnp.stack([c1, c2]), jnp.stack([h1, h2])
