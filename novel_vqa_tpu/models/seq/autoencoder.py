"""LSTM sequence autoencoders — the novel-word-transfer models.

Variants (all share one embedding table between encoder and decoder, like the
reference's weight-shared lookup clones):

  * ``text_nostart`` — arch1 text AE (misc/AutoEncoder_text_nostart.lua):
    encoder consumes the seq_length token steps only (no image tick, no START,
    :250-291); lookup = LookupTable -> Dropout(0.5) -> Tanh (:28-32).
  * ``arch2`` — misc/AutoEncoder.lua: encoder consumes
    [image, START, w1..wL] (seq_length+2 steps, :258-309); plain LookupTable
    (:28); decoder states seeded from the final encoder state (:313-316).
  * ``vqa_arch`` — arch1 weak-paired AE (misc/AutoEncoder_vqa_arch.lua):
    1-layer text encoder; join(c, h) -> AxB(2H, nhimage, 2H, 0.5) -> Dropout
    (:35-38) -> split into (c, h) and added as a *skip connection* onto the
    encoder final state to seed the 1-layer decoder (:341-350); with
    ``encoder_skip_flag`` the precomputed mean sentence vector replaces the
    encoder output (:332-335); lookup tables are frozen (backward commented
    out, :404-416 — ``stop_gradient`` here); the mean sentence vector gets no
    gradient either.
  * ``null`` — arch2 weak-paired AE (misc/AutoEncoderNull.lua): forward takes
    a separate ``seq_input`` for the encoder (possibly zeroed) while the
    criterion still targets the true ``seq``; lookup frozen (:90-100).

TPU-first structure: encoder and decoder are each ONE ``lax.scan`` inside the
jitted step, replacing the reference's per-timestep weight-shared clone tables
(createClones, AutoEncoder.lua:60-80).  Faithfulness details:

  * the encoder does NOT mask per row: null tokens are redirected to token 1
    and processed (AutoEncoder.lua:285-289), polluting the state of
    already-ended sequences exactly as in the reference; only the *batch-wide*
    all-null tail is skipped (can_skip, :273-277), reproduced here with a
    scalar per-step activity mask so the final state equals the reference's
    ``state_enc[tmax]``;
  * the decoder runs all seq_length+1 steps; outputs at steps the reference
    skipped are unused by the masked criterion, so no masking is needed.
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from novel_vqa_tpu.ops import (
    axb_apply,
    dropout,
    embedding_lookup,
    lstm_stack_step,
)


class AEConfig(NamedTuple):
    vocab_size: int
    input_encoding_size: int = 512
    rnn_size: int = 512
    num_layers: int = 1
    seq_length: int = 16
    dropout: float = 0.5  # -drop_prob_ae
    variant: str = "text_nostart"  # text_nostart | arch2 | vqa_arch | null
    nhimage: int = 0  # vqa_arch image feature width
    # "bfloat16" = mixed precision, mirroring models/vqa/arch1.apply: bf16
    # weights + activations in the forward, f32 matmul accumulation via the
    # existing preferred_element_type pins (the logits/logsumexp/loss chain
    # stays f32), f32 master weights + optimizer state.  The target is HBM
    # traffic, not MXU rate: the (H, V+1) decoder projection is ~41 MB f32
    # at reference sizes and is re-fetched every decode-scan step, forward
    # and (recomputed) backward.  Default f32 — reference-parity numerics.
    compute_dtype: str = "float32"

    @property
    def start_token(self) -> int:
        return self.vocab_size + 1  # START == END == V+1

    @property
    def decoder_layers(self) -> int:
        # the weak-paired arch1 decoder is fixed to 1 layer
        # (AutoEncoder_vqa_arch.lua:33)
        return 1 if self.variant == "vqa_arch" else self.num_layers

    @property
    def lookup_has_dropout_tanh(self) -> bool:
        return self.variant in ("text_nostart", "vqa_arch")

    @property
    def lookup_frozen(self) -> bool:
        return self.variant in ("vqa_arch", "null")


def _torch_linear_init(rng, n_in, n_out, dtype=jnp.float32):
    """Torch nn.Linear default: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(float(n_in)))
    kw, kb = jax.random.split(rng)
    w = jax.random.uniform(kw, (n_in, n_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (n_out,), dtype, -bound, bound)
    return w, b


def _torch_lstm_layer_init(rng, n_in, rnn_size):
    k1, k2 = jax.random.split(rng)
    wx, bx = _torch_linear_init(k1, n_in, 4 * rnn_size)
    wh, bh = _torch_linear_init(k2, rnn_size, 4 * rnn_size)
    return {"wx": wx, "bx": bx, "wh": wh, "bh": bh}


def init_params(rng: jax.Array, cfg: AEConfig) -> Dict[str, Any]:
    n_keys = 2 + cfg.num_layers + cfg.decoder_layers + 2
    ks = list(jax.random.split(rng, n_keys))
    # Torch nn.LookupTable default init: normal(0, 1)
    lookup = jax.random.normal(
        ks[0], (cfg.vocab_size + 1, cfg.input_encoding_size), jnp.float32
    )
    encoder = []
    for i in range(cfg.num_layers):
        n_in = cfg.input_encoding_size if i == 0 else cfg.rnn_size
        encoder.append(_torch_lstm_layer_init(ks[1 + i], n_in, cfg.rnn_size))
    dec_layers = []
    for i in range(cfg.decoder_layers):
        n_in = cfg.input_encoding_size if i == 0 else cfg.rnn_size
        dec_layers.append(
            _torch_lstm_layer_init(ks[1 + cfg.num_layers + i], n_in, cfg.rnn_size)
        )
    proj_w, proj_b = _torch_linear_init(
        ks[-2], cfg.rnn_size, cfg.vocab_size + 1
    )
    params: Dict[str, Any] = {
        "lookup": lookup,
        "encoder": encoder,
        "decoder": {"layers": dec_layers, "proj_w": proj_w, "proj_b": proj_b},
    }
    if cfg.variant == "vqa_arch":
        H = cfg.rnn_size
        km1, km2 = jax.random.split(ks[-1])
        wq, bq = _torch_linear_init(km1, 2 * H, 2 * H)
        wi, bi = _torch_linear_init(km2, cfg.nhimage, 2 * H)
        params["multimodal"] = {"wq": wq, "bq": bq, "wi": wi, "bi": bi}
    return params


def _cast_compute(cfg: AEConfig, params, *arrays):
    """Apply ``cfg.compute_dtype`` at a public entry point: casts f32 param
    leaves and float inputs to bf16 (no-op for "float32").  Master params
    stay f32 outside the jitted step — the cast's transpose accumulates
    grads back to f32 for the optimizer, exactly as in arch1."""
    if cfg.compute_dtype == "float32":
        return (params,) + arrays
    if cfg.compute_dtype != "bfloat16":
        raise ValueError(
            f"cfg.compute_dtype={cfg.compute_dtype!r}: must be 'float32' or"
            " 'bfloat16'"
        )
    cdt = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda a: a.astype(cdt) if a.dtype == jnp.float32 else a, params
    )
    cast = lambda a: (
        a.astype(cdt)
        if a is not None and jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
        else a
    )
    return (params,) + tuple(cast(a) for a in arrays)


def _embed(
    params, cfg: AEConfig, tokens, rng, deterministic: bool
) -> jax.Array:
    """Token embedding with the variant's lookup pipeline; null tokens (0) are
    redirected to token 1 (embedding row 0), matching ``it[eq(it,0)]=1``."""
    x = embedding_lookup(params["lookup"], jnp.maximum(tokens, 1))
    if cfg.lookup_frozen:
        x = jax.lax.stop_gradient(x)
    if cfg.lookup_has_dropout_tanh:
        if not deterministic:
            x = dropout(rng, x, 0.5, deterministic=False)
        x = jnp.tanh(x)
    return x


def _scan_encoder(
    layers, xs, active, cfg: AEConfig, rng, deterministic: bool
) -> Tuple[jax.Array, jax.Array]:
    """Scan with a scalar per-step activity mask (the batch-wide can_skip)."""
    T, N, _ = xs.shape
    H = cfg.rnn_size
    zeros = jnp.zeros((len(layers), N, H), xs.dtype)
    state = (zeros, zeros)
    if rng is not None:
        step_rngs = jax.random.split(rng, T)
    else:
        step_rngs = jnp.zeros((T, 2), dtype=jnp.uint32)

    def body(state, inp):
        x_t, a_t, r_t = inp
        c_new, h_new = lstm_stack_step(
            layers,
            x_t,
            state,
            dropout_rate=cfg.dropout,
            rng=None if rng is None else r_t,
            deterministic=deterministic,
        )
        c = jnp.where(a_t, c_new, state[0])
        h = jnp.where(a_t, h_new, state[1])
        return (c, h), None

    # short time loops fully unroll (same ~9% device-time win as measured
    # for the arch1 trainer; see ops/lstm.lstm_encode)
    (c, h), _ = jax.lax.scan(
        body, state, (xs, active, step_rngs), unroll=T if T <= 18 else 1
    )
    return c, h


def encode(
    params,
    cfg: AEConfig,
    seq: jax.Array,  # (L, N) time-major tokens, 0 = null (suffix only)
    imgs: Optional[jax.Array] = None,  # (N, E) for arch2/null
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Run the variant's encoder; returns final (c, h) each (layers, N, H)."""
    params, imgs = _cast_compute(cfg, params, imgs)
    L, N = seq.shape
    if rng is not None:
        k_emb, k_start, k_scan = jax.random.split(rng, 3)
    else:
        k_emb = k_start = k_scan = None
    embs = _embed(params, cfg, seq, k_emb, deterministic)  # (L, N, E)
    token_active = jnp.any(seq != 0, axis=1)  # (L,) batch-wide can_skip

    if cfg.variant in ("arch2", "null"):
        start = jnp.full((N,), cfg.start_token, jnp.int32)
        start_emb = _embed(params, cfg, start, k_start, deterministic)
        xs = jnp.concatenate([imgs[None], start_emb[None], embs], axis=0)
        active = jnp.concatenate(
            [jnp.ones((2,), bool), token_active], axis=0
        )
    else:
        xs = embs
        active = token_active
    return _scan_encoder(params["encoder"], xs, active, cfg, k_scan, deterministic)


def decode_teacher_forced(
    params,
    cfg: AEConfig,
    init_state: Tuple[jax.Array, jax.Array],  # (c, h) each (dec_layers, N, H)
    seq: jax.Array,  # (L, N) target tokens fed teacher-forced
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Decoder scan -> (L+1, N, V+1) logprobs (step t predicts seq[t], the
    last step predicts END)."""
    L, N = seq.shape
    if rng is not None:
        k_emb, k_start, k_scan = jax.random.split(rng, 3)
        step_rngs = jax.random.split(k_scan, L + 1)
    else:
        k_emb = k_start = None
        step_rngs = jnp.zeros((L + 1, 2), dtype=jnp.uint32)

    start = jnp.full((N,), cfg.start_token, jnp.int32)
    start_emb = _embed(params, cfg, start, k_start, deterministic)
    embs = _embed(params, cfg, seq, k_emb, deterministic)
    xs = jnp.concatenate([start_emb[None], embs], axis=0)  # (L+1, N, E)

    dec = params["decoder"]

    def body(state, inp):
        x_t, r_t = inp
        if rng is not None:
            r_step, r_top = jax.random.split(r_t)
        else:
            r_step = r_top = None
        c, h = lstm_stack_step(
            dec["layers"],
            x_t,
            state,
            dropout_rate=cfg.dropout,
            rng=r_step,
            deterministic=deterministic,
        )
        top = h[-1]
        if not deterministic and cfg.dropout > 0:
            top = dropout(r_top, top, cfg.dropout, deterministic=False)
        logits = (
            jnp.dot(top, dec["proj_w"], preferred_element_type=jnp.float32)
            + dec["proj_b"]
        )
        return (c, h), jax.nn.log_softmax(logits, axis=-1)

    T_dec = xs.shape[0]
    _, logprobs = jax.lax.scan(
        body, init_state, (xs, step_rngs), unroll=T_dec if T_dec <= 18 else 1
    )
    return logprobs


def decode_teacher_forced_nll(
    params,
    cfg: AEConfig,
    init_state: Tuple[jax.Array, jax.Array],
    seq: jax.Array,  # (L, N)
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Fused decoder + LanguageModelCriterion: the masked NLL accumulates
    INSIDE the decode scan, so the (L+1, N, V+1) logprobs tensor — 1.4 GB at
    reference sizes (L=16, N=1000, V=20000) — is never materialized.  The
    scan body is rematerialized (``jax.checkpoint``) so the backward
    recomputes each step's logits instead of storing them; trading ~0.35
    TFLOP of recompute for ~gigabytes of HBM residual traffic is what cuts
    the text-AE train step (measured on the v5e: 28.5 -> see PERF.md).

    Identical math (and identical dropout RNG layout) to
    ``sequence_nll(decode_teacher_forced(...), seq)``; pinned by test.
    Returns (loss, n).
    """
    from novel_vqa_tpu.ops.losses import sequence_targets

    L, N = seq.shape
    if rng is not None:
        k_emb, k_start, k_scan = jax.random.split(rng, 3)
        step_rngs = jax.random.split(k_scan, L + 1)
    else:
        k_emb = k_start = None
        step_rngs = jnp.zeros((L + 1, 2), dtype=jnp.uint32)

    start = jnp.full((N,), cfg.start_token, jnp.int32)
    start_emb = _embed(params, cfg, start, k_start, deterministic)
    embs = _embed(params, cfg, seq, k_emb, deterministic)
    xs = jnp.concatenate([start_emb[None], embs], axis=0)  # (L+1, N, E)

    dec = params["decoder"]
    Mp1 = dec["proj_w"].shape[1]
    targets, scored = sequence_targets(seq, Mp1)
    gather_idx = jnp.clip(targets - 1, 0, Mp1 - 1)  # (L+1, N)

    def body(carry, inp):
        state, acc = carry
        x_t, r_t, idx_t, sc_t = inp
        if rng is not None:
            r_step, r_top = jax.random.split(r_t)
        else:
            r_step = r_top = None
        c, h = lstm_stack_step(
            dec["layers"],
            x_t,
            state,
            dropout_rate=cfg.dropout,
            rng=r_step,
            deterministic=deterministic,
        )
        top = h[-1]
        if not deterministic and cfg.dropout > 0:
            top = dropout(r_top, top, cfg.dropout, deterministic=False)
        logits = (
            jnp.dot(top, dec["proj_w"], preferred_element_type=jnp.float32)
            + dec["proj_b"]
        )
        # log_softmax gathered at the target, without storing the full row
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, idx_t[:, None], axis=-1)[:, 0] - lse
        acc = acc - jnp.sum(jnp.where(sc_t, picked, 0.0))
        return ((c, h), acc), None

    body = jax.checkpoint(body)
    # Default ROLLED: this scan's body is rematerialized, so unlike the
    # other short time loops (unrolled per the arch1 ~9% win) each unrolled
    # iteration here duplicates a checkpointed 20k-wide projection in the
    # HLO.  NOVEL_VQA_AE_NLL_UNROLL=1 is the on-device A/B knob (identical
    # math either way, pinned by test).
    T_dec = xs.shape[0]
    unroll = (
        T_dec
        if T_dec <= 18
        and os.environ.get("NOVEL_VQA_AE_NLL_UNROLL", "0") == "1"
        else 1
    )
    (_, loss_sum), _ = jax.lax.scan(
        body,
        (init_state, jnp.float32(0.0)),
        (xs, step_rngs, gather_idx, scored),
        unroll=unroll,
    )
    n = jnp.sum(scored)
    return loss_sum / n.astype(jnp.float32), n


def _vqa_arch_decoder_init(
    params, cfg: AEConfig, c_enc, h_enc, imgs, rng, deterministic
):
    """Multimodal skip-connected decoder seed (AutoEncoder_vqa_arch.lua:326-350)."""
    H = cfg.rnn_size
    c1, h1 = c_enc[-1], h_enc[-1]
    joined = jnp.concatenate([c1, h1], axis=-1)  # [c, h] (JoinTable order)
    mm = axb_apply(
        params["multimodal"],
        joined,
        imgs,
        dropout_rate=0.5,
        rng=rng,
        deterministic=deterministic,
    )
    if not deterministic:
        rng2 = jax.random.fold_in(rng, 1)
        mm = dropout(rng2, mm, 0.5, deterministic=False)
    c0 = c1 + mm[..., :H]
    h0 = h1 + mm[..., H:]
    return c0[None], h0[None]


def apply(
    params,
    cfg: AEConfig,
    seq: jax.Array,  # (L, N)
    *,
    imgs: Optional[jax.Array] = None,
    sent_input: Optional[jax.Array] = None,  # (N, 2H) mean vector, vqa_arch
    seq_input: Optional[jax.Array] = None,  # (L, N) encoder tokens, null variant
    encoder_skip: bool = False,  # vqa_arch encoder_skip_flag
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Full AE forward -> (L+1, N, V+1) decoder logprobs."""
    params, imgs, sent_input = _cast_compute(cfg, params, imgs, sent_input)
    state, k_dec = _decoder_start_state(
        params, cfg, seq, imgs, sent_input, seq_input, encoder_skip, rng,
        deterministic,
    )
    return decode_teacher_forced(
        params, cfg, state, seq, rng=k_dec, deterministic=deterministic
    )


def _decoder_start_state(
    params, cfg, seq, imgs, sent_input, seq_input, encoder_skip, rng,
    deterministic,
):
    """Encoder (+ multimodal seed for vqa_arch) -> (decoder init state, k_dec).
    The rng split layout is shared by apply/apply_nll so both draw identical
    dropout."""
    if rng is not None:
        k_enc, k_mm, k_dec = jax.random.split(rng, 3)
    else:
        k_enc = k_mm = k_dec = None

    if cfg.variant == "text_nostart":
        state = encode(params, cfg, seq, rng=k_enc, deterministic=deterministic)
    elif cfg.variant == "arch2":
        state = encode(params, cfg, seq, imgs, rng=k_enc, deterministic=deterministic)
    elif cfg.variant == "null":
        state = encode(
            params, cfg, seq_input, imgs, rng=k_enc, deterministic=deterministic
        )
    elif cfg.variant == "vqa_arch":
        H = cfg.rnn_size
        if encoder_skip:
            sent = jax.lax.stop_gradient(sent_input)
            c1, h1 = sent[..., :H], sent[..., H:]
            c_enc, h_enc = c1[None], h1[None]
        else:
            c_enc, h_enc = encode(
                params, cfg, seq, rng=k_enc, deterministic=deterministic
            )
        state = _vqa_arch_decoder_init(
            params, cfg, c_enc, h_enc, imgs, k_mm, deterministic
        )
    else:
        raise ValueError(cfg.variant)
    return state, k_dec


def apply_nll(
    params,
    cfg: AEConfig,
    seq: jax.Array,
    *,
    imgs: Optional[jax.Array] = None,
    sent_input: Optional[jax.Array] = None,
    seq_input: Optional[jax.Array] = None,
    encoder_skip: bool = False,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Full AE forward to the fused masked-NLL loss (never materializes the
    (L+1, N, V+1) logprobs — see decode_teacher_forced_nll).  Equal to
    ``sequence_nll(apply(...), seq)`` with the same rng."""
    params, imgs, sent_input = _cast_compute(cfg, params, imgs, sent_input)
    state, k_dec = _decoder_start_state(
        params, cfg, seq, imgs, sent_input, seq_input, encoder_skip, rng,
        deterministic,
    )
    return decode_teacher_forced_nll(
        params, cfg, state, seq, rng=k_dec, deterministic=deterministic
    )


def loss_fn(params, cfg: AEConfig, seq, rng, **kwargs) -> jax.Array:
    loss, _ = apply_nll(params, cfg, seq, rng=rng, deterministic=False, **kwargs)
    return loss


def sample(
    params,
    cfg: AEConfig,
    init_state: Tuple[jax.Array, jax.Array],
    *,
    rng: Optional[jax.Array] = None,
    sample_max: bool = True,
    temperature: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Autoregressive decoding (AutoEncoder.lua:173-212): START then feed back
    the arg-max (or temperature-sampled) token; returns
    (seq (L, N), logprobs-of-samples (L, N)).  Runs in evaluate mode."""
    c, h = init_state
    params, c, h = _cast_compute(cfg, params, c, h)
    N = c.shape[1]
    dec = params["decoder"]
    L = cfg.seq_length

    def step_logits(state, tokens):
        x = _embed(params, cfg, tokens, None, True)
        c, h = lstm_stack_step(dec["layers"], x, state, deterministic=True)
        top = h[-1]
        logits = (
            jnp.dot(top, dec["proj_w"], preferred_element_type=jnp.float32)
            + dec["proj_b"]
        )
        return (c, h), jax.nn.log_softmax(logits, axis=-1)

    start = jnp.full((N,), cfg.start_token, jnp.int32)
    state, logprobs = step_logits((c, h), start)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_rngs = jax.random.split(rng, L)

    def body(carry, r_t):
        state, logprobs = carry
        if sample_max:
            it = jnp.argmax(logprobs, axis=-1) + 1  # 1-indexed token
        else:
            it = (
                jax.random.categorical(r_t, logprobs / temperature, axis=-1) + 1
            )
        sample_lp = jnp.take_along_axis(logprobs, (it - 1)[:, None], axis=-1)[:, 0]
        state, logprobs = step_logits(state, it.astype(jnp.int32))
        return (state, logprobs), (it.astype(jnp.int32), sample_lp)

    (_, _), (tokens, lps) = jax.lax.scan(body, (state, logprobs), step_rngs)
    return tokens, lps
