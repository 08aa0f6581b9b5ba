"""Fused-gate LSTM: single step, multi-layer stack, and masked time scan.

Reference math (001_train_autoencoder/misc/LSTM_encoder.lua:32-50, identical in
misc/LSTM_decoder.lua:32-50 and 002_train_vqa_arch1/misc/LSTM.lua:41-59):

    gates = x @ Wx + bx + h @ Wh + bh          -- two Linear(4H) fused matmuls
    i, f, o = sigmoid(gates[0:H]), sigmoid(gates[H:2H]), sigmoid(gates[2H:3H])
    g       = tanh(gates[3H:4H])
    c' = f * c + i * g
    h' = o * tanh(c')

Gate order is [in, forget, out, in_transform] — fixed by the Lua
``nn.Reshape(4, rnn)`` / ``SplitTable`` at LSTM_encoder.lua:36-43.  Weight
tensors are stored (in_features, 4H) so the step is a plain ``x @ Wx``; the
Torch checkpoints store the transpose (out, in) and the converter in
``core.checkpoint`` handles the flip.  Keeping ``bx``/``bh`` separate (they are
redundant mathematically) preserves the Torch ``getParameters()`` flat-vector
layout for byte-compatible checkpoint interchange.

TPU-first design notes:
  * The reference clones the cell per timestep and loops in host Lua with
    ragged, length-sorted batches (misc/RNNUtils.lua:66-81,128-154).  Here one
    traced step runs under ``jax.lax.scan``; variable lengths are handled by a
    per-step ``mask`` on right-aligned tokens.  With zero initial state, a
    masked dense scan is exactly equivalent to the reference's packed ragged
    loop: inactive rows simply keep their (zero) state until their first real
    token, which is precisely what the length-sorted growing-batch loop
    computes (RNNUtils.lua:84-125).  No gather/scatter, no dynamic shapes —
    XLA tiles both GEMMs onto the MXU and fuses the gate nonlinearities.
  * The two GEMMs per step are (N, in)x(in, 4H) and (N, H)x(H, 4H).  For the
    reference model sizes (N=500, H=512 -> 4H=2048) these are MXU-sized and
    XLA fuses add+sigmoid/tanh into the matmul epilogue; a handwritten Pallas
    step (ops/pallas_lstm.py) is used on TPU for the fp32 hot path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from novel_vqa_tpu.ops.dropout import dropout

LSTMLayerParams = Dict[str, jax.Array]  # {"wx", "bx", "wh", "bh"}


def lstm_layer_init(
    rng: jax.Array,
    input_size: int,
    rnn_size: int,
    scale: float = 0.08,
    dtype=jnp.float32,
) -> LSTMLayerParams:
    """Uniform(-scale, scale) init, matching ``encoder_w_q:uniform(-0.08, 0.08)``
    (002_train_vqa_arch1/002_train_baseline.lua:178)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -scale, scale)
    return {
        "wx": u(k1, (input_size, 4 * rnn_size)),
        "bx": u(k2, (4 * rnn_size,)),
        "wh": u(k3, (rnn_size, 4 * rnn_size)),
        "bh": u(k4, (4 * rnn_size,)),
    }


def lstm_step(
    params: LSTMLayerParams,
    x: jax.Array,
    c: jax.Array,
    h: jax.Array,
    training: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One fused-gate LSTM step. x: (N, in); c, h: (N, H). Returns (c', h').

    TPU routing policy (all figures trace device time on a v5e, batch 500,
    2x512, T=16 — the A/B record lives in docs/PERF.md):
      * ``training=False`` (eval/sampling): the fused Pallas kernel
        (ops/pallas_lstm.py — same math, single on-chip pass);
      * ``training=True``: the plain XLA cell.  The Pallas cell's round-2
        win (3.25 vs 3.73 ms/step) predated the rbg dropout masks; with
        those landed the picture inverts — 2.29 ms/step (41.6% MFU) with
        the XLA cell vs 2.60 with the Pallas cell, because the custom-VJP
        pallas_call boundary blocks XLA from fusing the backward chain
        across the step while the saved-residual copies add per-op
        dispatch overhead to an already overhead-bound program.
    ``NOVEL_VQA_PALLAS=0`` forces XLA everywhere; ``NOVEL_VQA_PALLAS=all``
    forces the Pallas cell in training too (the A/B knob)."""
    import os

    pallas_env = os.environ.get("NOVEL_VQA_PALLAS", "1")
    if (
        pallas_env != "0"
        and (not training or pallas_env == "all")
        and jax.default_backend() == "tpu"
        and c.shape[-1] % 128 == 0  # lane-aligned H; tiny models stay on XLA
        and x.dtype == jnp.float32  # bf16 mixed precision stays on XLA
    ):
        from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_step

        return pallas_lstm_step(params, x, c, h)
    if training and os.environ.get("NOVEL_VQA_BF16_RESID", "0") == "1":
        c2, h2 = _cell_bf16_resid(params["wx"], params["wh"],
                                  params["bx"] + params["bh"], x, c, h)
        return c2.astype(c.dtype), h2.astype(h.dtype)
    rnn_size = c.shape[-1]
    gates = (
        jnp.dot(x, params["wx"], preferred_element_type=jnp.float32)
        + jnp.dot(h, params["wh"], preferred_element_type=jnp.float32)
        + params["bx"]
        + params["bh"]
    )
    i = jax.nn.sigmoid(gates[..., 0 * rnn_size : 1 * rnn_size])
    f = jax.nn.sigmoid(gates[..., 1 * rnn_size : 2 * rnn_size])
    o = jax.nn.sigmoid(gates[..., 2 * rnn_size : 3 * rnn_size])
    g = jnp.tanh(gates[..., 3 * rnn_size : 4 * rnn_size])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    # mixed precision: gates accumulate f32 (preferred_element_type) but the
    # carried state stays in the caller's compute dtype, so the per-step
    # activations saved for the backward are half-width under bf16
    return c_new.astype(c.dtype), h_new.astype(h.dtype)


@jax.custom_vjp
def _cell_bf16_resid(wx, wh, b, x, c, h):
    """LSTM cell whose backward RESIDUALS are stored bf16 (A/B knob
    ``NOVEL_VQA_BF16_RESID=1``).

    Hypothesis (docs/PERF.md round-3 profile): ~264 us/step of the arch1
    train step is HBM<->VMEM copy-done traffic staging the (N, H) f32
    per-step activations the backward re-reads.  This cell computes fwd and
    bwd entirely in f32 (identical update math to the plain path, unlike
    the rejected full-bf16 route) but saves the gate activations / states
    for the backward as bf16 — halving the residual footprint at the cost
    of ~1e-3-relative gradient rounding and the pack/unpack casts."""
    c2, h2, _ = _cell_fwd_math(wx, wh, b, x, c, h)
    return c2, h2


def _cell_fwd_math(wx, wh, b, x, c, h):
    H = c.shape[-1]
    gates = (
        jnp.dot(x, wx, preferred_element_type=jnp.float32)
        + jnp.dot(h, wh, preferred_element_type=jnp.float32)
        + b
    )
    i = jax.nn.sigmoid(gates[..., 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H : 2 * H])
    o = jax.nn.sigmoid(gates[..., 2 * H : 3 * H])
    g = jnp.tanh(gates[..., 3 * H : 4 * H])
    c2 = f * c + i * g
    tc2 = jnp.tanh(c2)
    h2 = o * tc2
    return c2, h2, (i, f, o, g, tc2)


def _cell_bf16_resid_fwd(wx, wh, b, x, c, h):
    c2, h2, (i, f, o, g, tc2) = _cell_fwd_math(wx, wh, b, x, c, h)
    bf = jnp.bfloat16
    resid = (
        wx, wh,  # weights are shared across steps — no per-step footprint
        x.astype(bf), c.astype(bf), h.astype(bf),
        i.astype(bf), f.astype(bf), o.astype(bf), g.astype(bf),
        tc2.astype(bf),
    )
    return (c2, h2), resid


def _cell_bf16_resid_bwd(resid, cts):
    wx, wh, x, c, h, i, f, o, g, tc2 = (
        resid[0], resid[1],
        *(t.astype(jnp.float32) for t in resid[2:]),
    )
    dc2, dh2 = cts
    do = dh2 * tc2
    dc2 = dc2 + dh2 * o * (1.0 - tc2 * tc2)
    df = dc2 * c
    dc = dc2 * f
    di = dc2 * g
    dg = dc2 * i
    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            do * o * (1.0 - o),
            dg * (1.0 - g * g),
        ],
        axis=-1,
    )
    dwx = jnp.dot(x.T, dgates, preferred_element_type=jnp.float32)
    dwh = jnp.dot(h.T, dgates, preferred_element_type=jnp.float32)
    db = jnp.sum(dgates, axis=0)
    dx = jnp.dot(dgates, wx.T, preferred_element_type=jnp.float32)
    dh = jnp.dot(dgates, wh.T, preferred_element_type=jnp.float32)
    return dwx, dwh, db, dx, dc, dh


_cell_bf16_resid.defvjp(_cell_bf16_resid_fwd, _cell_bf16_resid_bwd)


def lstm_stack_step(
    params: Sequence[LSTMLayerParams],
    x: jax.Array,
    state: Tuple[jax.Array, jax.Array],  # (c, h) each (L, N, H)
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-layer step. Inter-layer dropout on the input of layers L>1 only,
    matching misc/LSTM.lua:36-38 / LSTM_encoder.lua:27-29 (no dropout on the
    first layer's input and none on the recurrent path)."""
    c, h = state
    new_c: List[jax.Array] = []
    new_h: List[jax.Array] = []
    inp = x
    for layer_idx, layer in enumerate(params):
        if layer_idx > 0:
            if dropout_rate > 0.0 and not deterministic:
                rng, sub = jax.random.split(rng)
                inp = dropout(sub, inp, dropout_rate, deterministic=False)
        c_l, h_l = lstm_step(
            layer, inp, c[layer_idx], h[layer_idx], training=not deterministic
        )
        new_c.append(c_l)
        new_h.append(h_l)
        inp = h_l
    return jnp.stack(new_c), jnp.stack(new_h)


def pack_state(c: jax.Array, h: jax.Array) -> jax.Array:
    """Pack (L, N, H) c/h into the Torch packed-state vector layout
    [c1, h1, c2, h2, ...] of width 2*L*H (misc/LSTM.lua:21-23,70: ``nn.Narrow``
    reads prev_c at offset 2*(L-1)*H and prev_h at 2*(L-1)*H + H, and the
    output joins (c, h) per layer in order)."""
    num_layers = c.shape[0]
    parts = []
    for layer in range(num_layers):
        parts.append(c[layer])
        parts.append(h[layer])
    return jnp.concatenate(parts, axis=-1)


def unpack_state(packed: jax.Array, num_layers: int) -> Tuple[jax.Array, jax.Array]:
    """Inverse of :func:`pack_state`."""
    rnn_size = packed.shape[-1] // (2 * num_layers)
    cs, hs = [], []
    for layer in range(num_layers):
        off = 2 * layer * rnn_size
        cs.append(packed[..., off : off + rnn_size])
        hs.append(packed[..., off + rnn_size : off + 2 * rnn_size])
    return jnp.stack(cs), jnp.stack(hs)


def lstm_encode_layerwise(
    params: Sequence[LSTMLayerParams],
    xs: jax.Array,  # (T, N, in) time-major inputs
    mask: jax.Array,  # (T, N) 1.0 where the step is active for that row
    *,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    unroll: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Layer-by-layer masked encode (same math as :func:`lstm_encode`).

    Instead of scanning a stacked multi-layer cell over time (2 matmuls x L
    layers per step, all sequential), each layer runs over the WHOLE sequence
    before the next starts: the input-side projection ``xs @ Wx`` becomes ONE
    (T*N, in)@(in, 4H) MXU-sized matmul per layer — the only sequential work
    left is the (N, H)@(H, 4H) recurrence.  Under autodiff the same structure
    holds in reverse: dWx is one big matmul instead of T accumulated small
    ones.  This halves the sequential matmul chain and cuts the op count per
    step substantially (the arch1 train step is dispatch-overhead-bound —
    docs/PERF.md round-3 record).

    Inter-layer dropout (misc/LSTM.lua:36-38: input of layers > 1 only) is
    applied to the whole (T, N, H) sequence at once — per-timestep-distinct
    masks, statistically identical to the per-step split of the stacked path.

    Returns the final (c, h), each (L, N, H) — identical (up to float
    reassociation of the gate sum) to the stacked scan.
    """
    seq_len = xs.shape[0]
    batch = xs.shape[1]
    m = mask[:, :, None] > 0  # (T, N, 1)
    seq = xs
    final_c: List[jax.Array] = []
    final_h: List[jax.Array] = []
    for layer_idx, layer in enumerate(params):
        if layer_idx > 0 and dropout_rate > 0.0 and not deterministic:
            rng, sub = jax.random.split(rng)
            seq = dropout(sub, seq, dropout_rate, deterministic=False)
        rnn_size = layer["wh"].shape[0]
        gx = (
            jnp.dot(
                seq.reshape(seq_len * batch, -1),
                layer["wx"],
                preferred_element_type=jnp.float32,
            ).reshape(seq_len, batch, 4 * rnn_size)
            + layer["bx"]
            + layer["bh"]
        )
        wh = layer["wh"]

        def body(state, inputs):
            gx_t, m_t = inputs
            c, h = state
            gates = gx_t + jnp.dot(h, wh, preferred_element_type=jnp.float32)
            i = jax.nn.sigmoid(gates[..., 0 * rnn_size : 1 * rnn_size])
            f = jax.nn.sigmoid(gates[..., 1 * rnn_size : 2 * rnn_size])
            o = jax.nn.sigmoid(gates[..., 2 * rnn_size : 3 * rnn_size])
            g = jnp.tanh(gates[..., 3 * rnn_size : 4 * rnn_size])
            c_new = jnp.where(m_t, f * c + i * g, c).astype(c.dtype)
            h_new = jnp.where(m_t, o * jnp.tanh(c_new), h).astype(h.dtype)
            return (c_new, h_new), h_new

        zeros = jnp.zeros((batch, rnn_size), xs.dtype)
        (c_fin, h_fin), hs = jax.lax.scan(
            body, (zeros, zeros), (gx, m), unroll=unroll
        )
        final_c.append(c_fin)
        final_h.append(h_fin)
        seq = hs
    return jnp.stack(final_c), jnp.stack(final_h)


def lstm_encode(
    params: Sequence[LSTMLayerParams],
    xs: jax.Array,  # (T, N, in) time-major inputs
    mask: jax.Array,  # (T, N) 1.0 where the step is active for that row
    *,
    init_state: Optional[Tuple[jax.Array, jax.Array]] = None,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    return_sequence: bool = False,
    remat: bool = False,
) -> Any:
    """Masked dense scan over time.

    ``state = where(mask_t, stack_step(state, x_t), state)`` — rows stay at
    their previous (initially zero) state on inactive steps, which reproduces
    the reference's right-aligned ragged batching
    (misc/RNNUtils.lua:84-125,128-154) without any sorting or dynamic shapes.

    ``remat=True`` wraps the step in ``jax.checkpoint`` so the backward pass
    recomputes per-step activations instead of keeping all T of them in HBM
    — the standard FLOPs-for-memory trade for long sequences / big batches
    (irrelevant at the reference's 16-token lengths, available for scaled
    configs).

    Returns the final (c, h) state, or (final_state, (cs, hs)) per-step states
    when ``return_sequence``.
    """
    import os

    num_layers = len(params)
    seq_len, batch, _ = xs.shape
    rnn_size = params[0]["wh"].shape[0]

    # deterministic whole-sequence encodes route through the full-sequence
    # Pallas kernel on TPU (weights stay VMEM-resident across all T steps):
    # 412 us vs 485 us for the XLA per-step scan at reference sizes
    # (2x512, T=16, B=512, tile 64 — trace device time on a v5e)
    if (
        init_state is None
        and not return_sequence
        and not remat
        and rnn_size % 128 == 0  # lane-aligned H; tiny models stay on XLA
        and os.environ.get("NOVEL_VQA_PALLAS", "1") != "0"
        and jax.default_backend() == "tpu"
        and xs.dtype == jnp.float32  # bf16 mixed precision stays on XLA
    ):
        if deterministic:
            from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_encode

            return pallas_lstm_encode(params, xs, mask)
        if (
            os.environ.get("NOVEL_VQA_FUSED2", "0") == "1"
            and num_layers == 2
        ):
            # round-4 A/B route: both layers' recurrences in ONE Pallas
            # kernel (wavefront inside, weights VMEM-resident, bf16
            # storage) + a single combined hand-structured backward — the
            # fused-recurrence attempt at the 2.29 ms structural-floor
            # question (docs/PERF.md round-4 record)
            from novel_vqa_tpu.ops.pallas_lstm2 import fused2_encode_train

            return fused2_encode_train(params, xs, mask, dropout_rate, rng)
        if os.environ.get("NOVEL_VQA_SEQ_TRAIN", "0") == "1":
            # per-layer full-sequence kernels + hand-structured backward
            # (weight grads as single big matmuls) — A/B route; the per-step
            # path measured 3.01 vs 3.36 ms/step before rbg dropout masks,
            # re-evaluated per round (see docs/PERF.md)
            from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_encode_train

            return pallas_lstm_encode_train(params, xs, mask, dropout_rate, rng)
        # training falls through to the (unrolled) per-step scan, whose
        # cell is XLA by default (lstm_step routes Pallas only for eval or
        # under NOVEL_VQA_PALLAS=all); see the A/B record in docs/PERF.md.

    # layer-by-layer route (one big x-projection matmul per layer, only the
    # h@Wh recurrence stays sequential) — A/B knob, see lstm_encode_layerwise
    if (
        init_state is None
        and not return_sequence
        and not remat
        and os.environ.get("NOVEL_VQA_LAYERWISE", "0") == "1"
    ):
        unroll_env = os.environ.get("NOVEL_VQA_UNROLL", "")
        lw_unroll = (
            max(1, min(seq_len, int(unroll_env)))
            if unroll_env
            else (seq_len if seq_len <= 16 else 1)
        )
        return lstm_encode_layerwise(
            params, xs, mask, dropout_rate=dropout_rate, rng=rng,
            deterministic=deterministic, unroll=lw_unroll,
        )

    if init_state is None:
        zeros = jnp.zeros((num_layers, batch, rnn_size), xs.dtype)
        init_state = (zeros, zeros)

    if rng is not None:
        step_rngs = jax.random.split(rng, seq_len)
    else:
        step_rngs = jnp.zeros((seq_len, 2), dtype=jnp.uint32)

    def body(state, inputs):
        x_t, m_t, rng_t = inputs
        c, h = state
        c_new, h_new = lstm_stack_step(
            params,
            x_t,
            state,
            dropout_rate=dropout_rate,
            rng=None if rng is None else rng_t,
            deterministic=deterministic,
        )
        m = m_t[None, :, None]
        c = jnp.where(m > 0, c_new, c)
        h = jnp.where(m > 0, h_new, h)
        if return_sequence:
            return (c, h), (c, h)
        return (c, h), None

    if remat:
        body = jax.checkpoint(body)
    # fully unroll short time loops: at T=16 the unrolled program lets XLA
    # software-pipeline across timesteps, measured 3.01 vs 3.31 ms/train-step
    # on the v5e (device time, batch 500) — ~9%; keep the rolled loop for
    # long sequences (compile-size) and under remat (defeats the purpose).
    # NOVEL_VQA_UNROLL overrides for A/B runs ("0"/"1" = rolled, N = factor).
    unroll_env = os.environ.get("NOVEL_VQA_UNROLL", "")
    if unroll_env:
        unroll = max(1, min(seq_len, int(unroll_env)))
    else:
        unroll = seq_len if (seq_len <= 16 and not remat) else 1
    final_state, seq_states = jax.lax.scan(
        body, init_state, (xs, mask, step_rngs), unroll=unroll
    )
    if return_sequence:
        return final_state, seq_states
    return final_state
