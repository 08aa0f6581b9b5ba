"""Pallas TPU kernel: fused LSTM step.

The train-step hot loop is the per-timestep fused-gate computation
(misc/LSTM_encoder.lua:32-50 -> ops/lstm.lstm_step).  The XLA lowering
materializes the (N, 4H) pre-activation ``gates`` tensor in HBM between the
two GEMMs and the VPU epilogue; this kernel keeps the whole step on-chip:

    per batch tile (TILE_N rows):
        gates = x_tile @ Wx + h_tile @ Wh + (bx + bh)     (two MXU passes)
        i,f,o = sigmoid(gates[:, :3H]); g = tanh(gates[:, 3H:])
        c' = f*c + i*g; h' = o*tanh(c')                   (VPU, in-register)

Weights live in VMEM for the duration of the kernel (Wx: In x 4H, Wh: H x 4H
— 5.6 MB fp32 at the reference sizes, comfortably under the ~16 MB budget),
and only x/h/c tiles stream per grid step.

The op carries a custom VJP (the standard LSTM backward in XLA ops — the
backward is bandwidth-bound on dz and autodiff of the fused forward is not
available through ``pallas_call``), so it is a drop-in replacement for
``lstm_step`` under ``jax.grad``.  Selection: ``lstm_step_auto`` uses the
Pallas path on TPU and falls back to the XLA path elsewhere (tests run it in
interpreter mode for exactness).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from novel_vqa_tpu.ops.lstm import lstm_step as xla_lstm_step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fused_step_kernel(x_ref, h_ref, c_ref, wx_ref, wh_ref, b_ref, c_out_ref, h_out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    H = c_ref.shape[-1]
    gates = (
        jnp.dot(x_ref[:], wx_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h_ref[:], wh_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
    o = jax.nn.sigmoid(gates[:, 2 * H : 3 * H])
    g = jnp.tanh(gates[:, 3 * H : 4 * H])
    c_new = f * c_ref[:] + i * g
    c_out_ref[:] = c_new
    h_out_ref[:] = o * jnp.tanh(c_new)


def _pallas_forward(x, h, c, wx, wh, b, *, tile_n: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, In = x.shape
    H = c.shape[-1]
    pad_n = _round_up(max(N, 8), tile_n)
    if pad_n != N:
        x = jnp.pad(x, ((0, pad_n - N), (0, 0)))
        h = jnp.pad(h, ((0, pad_n - N), (0, 0)))
        c = jnp.pad(c, ((0, pad_n - N), (0, 0)))

    grid = (pad_n // tile_n,)
    spec_row = lambda width: pl.BlockSpec(
        (tile_n, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    c_new, h_new = pl.pallas_call(
        _fused_step_kernel,
        grid=grid,
        in_specs=[
            spec_row(In),
            spec_row(H),
            spec_row(H),
            full(wx.shape),
            full(wh.shape),
            full((1, b.shape[0])),
        ],
        out_specs=(spec_row(H), spec_row(H)),
        out_shape=(
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
        ),
        interpret=interpret,
    )(x, h, c, wx, wh, b.reshape(1, -1))
    return c_new[:N], h_new[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_lstm_step(x, h, c, wx, wh, b, tile_n, interpret):
    return _pallas_forward(x, h, c, wx, wh, b, tile_n=tile_n, interpret=interpret)


def _fwd(x, h, c, wx, wh, b, tile_n, interpret):
    c_new, h_new = _pallas_forward(x, h, c, wx, wh, b, tile_n=tile_n, interpret=interpret)
    return (c_new, h_new), (x, h, c, wx, wh, b, c_new)


def _bwd(tile_n, interpret, res, grads):
    x, h, c, wx, wh, b, c_new = res
    dc_new, dh_new = grads
    H = c.shape[-1]
    # recompute the gate activations (cheap, bandwidth-bound backward)
    gates = x @ wx + h @ wh + b
    i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
    o = jax.nn.sigmoid(gates[:, 2 * H : 3 * H])
    g = jnp.tanh(gates[:, 3 * H : 4 * H])
    tanh_c = jnp.tanh(c_new)
    dc_total = dc_new + dh_new * o * (1.0 - tanh_c * tanh_c)
    do = dh_new * tanh_c
    df = dc_total * c
    di = dc_total * g
    dg = dc_total * i
    dz = jnp.concatenate(
        [
            di * i * (1 - i),
            df * f * (1 - f),
            do * o * (1 - o),
            dg * (1 - g * g),
        ],
        axis=-1,
    )
    dx = dz @ wx.T
    dh = dz @ wh.T
    dc = dc_total * f
    dwx = x.T @ dz
    dwh = h.T @ dz
    db = jnp.sum(dz, axis=0)
    return dx, dh, dc, dwx, dwh, db


_fused_lstm_step.defvjp(_fwd, _bwd)


def pallas_lstm_step(
    params: Dict[str, jax.Array],
    x: jax.Array,
    c: jax.Array,
    h: jax.Array,
    *,
    tile_n: int = 256,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for :func:`ops.lstm.lstm_step`."""
    b = params["bx"] + params["bh"]
    return _fused_lstm_step(
        x, h, c, params["wx"], params["wh"], b, tile_n, interpret
    )


def lstm_step_auto(params, x, c, h):
    """Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return pallas_lstm_step(params, x, c, h)
    return xla_lstm_step(params, x, c, h)


# ---------------------------------------------------------------------------
# full-sequence kernel: weights stay VMEM-resident across ALL timesteps
# ---------------------------------------------------------------------------


def _seq_kernel(xs_ref, mask_ref, wx_ref, wh_ref, b_ref, c_out_ref, h_out_ref, hs_out_ref):
    """One batch tile, all T steps.  The per-step XLA scan re-fetches Wx/Wh
    from HBM every iteration (10.4 MB/step at reference sizes); here they load
    once and the T-step recurrence runs entirely on-chip."""
    T = xs_ref.shape[0]
    H = c_out_ref.shape[-1]

    def step(t, carry):
        c, h = carry
        x_t = xs_ref[t]
        gates = (
            jnp.dot(x_t, wx_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h, wh_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:]
        )
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        o = jax.nn.sigmoid(gates[:, 2 * H : 3 * H])
        g = jnp.tanh(gates[:, 3 * H : 4 * H])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[t]  # (tile_n, 1), broadcasts over H
        c = jnp.where(m > 0, c_new, c)
        h = jnp.where(m > 0, h_new, h)
        hs_out_ref[t] = h
        return c, h

    c0 = jnp.zeros(c_out_ref.shape, jnp.float32)
    c, h = jax.lax.fori_loop(0, T, step, (c0, c0))
    c_out_ref[:] = c
    h_out_ref[:] = h


def _pallas_seq_forward(xs, mask, wx, wh, b, *, tile_n: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, N, In = xs.shape
    H = wh.shape[0]
    pad_n = _round_up(max(N, 8), tile_n)
    if pad_n != N:
        xs = jnp.pad(xs, ((0, 0), (0, pad_n - N), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_n - N)))
    mask3 = mask[:, :, None]  # lane-compatible (T, N, 1) block layout

    grid = (pad_n // tile_n,)
    c, h, hs = pl.pallas_call(
        _seq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, tile_n, In), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, tile_n, 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wx.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wh.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, tile_n, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
            jax.ShapeDtypeStruct((pad_n, H), jnp.float32),
            jax.ShapeDtypeStruct((T, pad_n, H), jnp.float32),
        ),
        interpret=interpret,
    )(xs, mask3, wx, wh, b.reshape(1, -1))
    return c[:N], h[:N], hs[:, :N]


def _xla_seq_reference(xs, mask, wx, wh, b):
    """The mathematically identical XLA scan (used for the backward pass)."""
    T, N, _ = xs.shape
    H = wh.shape[0]

    def body(carry, inp):
        c, h = carry
        x_t, m_t = inp
        gates = x_t @ wx + h @ wh + b
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        o = jax.nn.sigmoid(gates[:, 2 * H : 3 * H])
        g = jnp.tanh(gates[:, 3 * H : 4 * H])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t[:, None]
        c = jnp.where(m > 0, c_new, c)
        h = jnp.where(m > 0, h_new, h)
        return (c, h), h

    zeros = jnp.zeros((N, H), xs.dtype)
    (c, h), hs = jax.lax.scan(body, (zeros, zeros), (xs, mask))
    return c, h, hs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_lstm_seq(xs, mask, wx, wh, b, tile_n, interpret):
    return _pallas_seq_forward(xs, mask, wx, wh, b, tile_n=tile_n, interpret=interpret)


def _seq_fwd(xs, mask, wx, wh, b, tile_n, interpret):
    out = _pallas_seq_forward(xs, mask, wx, wh, b, tile_n=tile_n, interpret=interpret)
    return out, (xs, mask, wx, wh, b, out[2])  # keep hs for the backward


def _seq_bwd(tile_n, interpret, res, grads):
    """Hand-structured backward: only the true recurrence stays sequential.

    Naive backprop-through-scan re-fetches Wx/Wh from HBM and runs small
    matmuls every timestep.  Here everything non-recurrent is hoisted into
    full-size matmuls XLA runs near peak:

      1. recompute all gate pre-activations in ONE pass from the saved
         per-step hidden states: gates = xs@Wx + shift(hs)@Wh + b;
      2. a cheap elementwise forward scan rebuilds the cell states;
      3. the reverse scan carries (dh, dc) with exactly ONE matmul per step
         (dgates_t @ Wh^T — the unavoidable recurrence);
      4. dWx/dWh/dxs/db are single big matmuls over the (T*N) axis.

    Measured on the v5e this halves the backward's sequential matmul FLOPs
    share from 100% to ~15% (one 4H x H product per step).
    """
    xs, mask, wx, wh, b, hs = res
    dc_fin, dh_fin, dhs = grads
    T, N, _ = xs.shape
    H = wh.shape[0]
    f32 = jnp.float32

    # h_{t-1} sequence: zeros at t=0, then the saved (post-mask) states
    h_prev = jnp.concatenate([jnp.zeros((1, N, H), hs.dtype), hs[:-1]], axis=0)
    gates = (
        jnp.einsum("tni,ij->tnj", xs, wx, preferred_element_type=f32)
        + jnp.einsum("tnh,hj->tnj", h_prev, wh, preferred_element_type=f32)
        + b
    )
    i = jax.nn.sigmoid(gates[..., 0 * H : 1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H : 2 * H])
    o = jax.nn.sigmoid(gates[..., 2 * H : 3 * H])
    g = jnp.tanh(gates[..., 3 * H : 4 * H])
    m = mask[..., None]  # (T, N, 1)

    # elementwise forward scan: per-step pre-mask candidate c_new and the
    # post-mask previous state c_{t-1} (both needed by the gate derivatives)
    def c_scan(c_prev, inp):
        i_t, f_t, g_t, m_t = inp
        c_new = f_t * c_prev + i_t * g_t
        c_state = jnp.where(m_t > 0, c_new, c_prev)
        return c_state, (c_new, c_prev)

    _, (c_new_seq, c_prev_seq) = jax.lax.scan(
        c_scan, jnp.zeros((N, H), f32), (i, f, g, m)
    )
    tanh_c = jnp.tanh(c_new_seq)

    wh_t = wh.T

    def bwd_step(carry, inp):
        dh_carry, dc_carry = carry
        dhs_t, i_t, f_t, o_t, g_t, c_prev, tanh_ct, m_t = inp
        dh_t = dhs_t + dh_carry
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
        dh_prev = (
            jnp.dot(dgates_t, wh_t, preferred_element_type=f32)
            + (1.0 - m_t) * dh_t
        )
        dc_prev = dc_new * f_t + (1.0 - m_t) * dc_t
        return (dh_prev, dc_prev), dgates_t

    (dh0, dc0), dgates = jax.lax.scan(
        bwd_step,
        (dh_fin, dc_fin),
        (dhs, i, f, o, g, c_prev_seq, tanh_c, m),
        reverse=True,
        unroll=T if T <= 16 else 1,
    )
    del dh0, dc0  # initial state is zeros: nothing to propagate

    # the heavy lifting: single full-size matmuls over the (T*N) axis
    dxs = jnp.einsum("tnj,ij->tni", dgates, wx, preferred_element_type=f32)
    dwx = jnp.einsum("tni,tnj->ij", xs, dgates, preferred_element_type=f32)
    dwh = jnp.einsum("tnh,tnj->hj", h_prev, dgates, preferred_element_type=f32)
    db = dgates.sum(axis=(0, 1))
    return dxs, None, dwx, dwh, db


_fused_lstm_seq.defvjp(_seq_fwd, _seq_bwd)


def pallas_lstm_seq(
    params: Dict[str, jax.Array],
    xs: jax.Array,  # (T, N, In) time-major inputs
    mask: jax.Array,  # (T, N)
    *,
    tile_n: int = 64,
    interpret: bool = False,
):
    """Full-sequence fused LSTM layer: returns (c, h, hs) with hs the
    per-step hidden states (the next layer's inputs).  VMEM budget at
    reference sizes (T=16, tile 128, In<=512, H=512): x block <=4.2 MB +
    weights 5.7 MB + hs block 4.2 MB + states — fits the ~16 MB budget; for
    longer sequences lower ``tile_n``."""
    b = params["bx"] + params["bh"]
    return _fused_lstm_seq(xs, mask, params["wx"], params["wh"], b, tile_n, interpret)


def pallas_lstm_encode(
    layers,
    xs: jax.Array,
    mask: jax.Array,
    *,
    tile_n: int = 64,
    interpret: bool = False,
):
    """Multi-layer masked encode via stacked full-sequence kernels — the
    drop-in equivalent of ops.lstm.lstm_encode in deterministic mode.
    Layer k+1 consumes layer k's per-step hidden states."""
    cs, hs_final = [], []
    inp = xs
    for layer in layers:
        c, h, hs = pallas_lstm_seq(layer, inp, mask, tile_n=tile_n, interpret=interpret)
        cs.append(c)
        hs_final.append(h)
        inp = hs
    return jnp.stack(cs), jnp.stack(hs_final)


def pallas_lstm_encode_train(
    layers,
    xs: jax.Array,
    mask: jax.Array,
    dropout_rate: float,
    rng: jax.Array,
    *,
    tile_n: int = 64,
    interpret: bool = False,
):
    """Training-mode multi-layer encode on the full-sequence kernels.

    The reference applies dropout only BETWEEN layers (on layer k's hidden
    state as it feeds layer k+1, misc/LSTM_encoder.lua:27-29) — never on the
    recurrent path — so the layer recurrences themselves are dropout-free
    and each can run as one fused seq kernel; the inter-layer dropout
    becomes a single (T, N, H) mask applied to the whole hidden sequence.
    Distribution-identical to the per-step path (independent Bernoulli per
    (t, n, h)); the draw order differs, which only matters for bitwise RNG
    coupling that is impossible vs the reference anyway (SURVEY.md §7).

    Gradients flow through the hand-structured _seq_bwd (one small matmul
    per step sequential; weight grads as full-size matmuls).
    """
    from novel_vqa_tpu.ops.dropout import dropout

    cs, hs_final = [], []
    inp = xs
    for li, layer in enumerate(layers):
        c, h, hs = pallas_lstm_seq(layer, inp, mask, tile_n=tile_n, interpret=interpret)
        cs.append(c)
        hs_final.append(h)
        if li + 1 < len(layers):
            if dropout_rate > 0.0:
                # rbg mask like ops.dropout (threefry masks cost ~0.4 ms/step
                # on the v5e) — one (T, N, H) draw for the whole sequence
                hs = dropout(
                    jax.random.fold_in(rng, li), hs, dropout_rate,
                    deterministic=False,
                )
            inp = hs
    return jnp.stack(cs), jnp.stack(hs_final)
