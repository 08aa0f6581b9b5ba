"""Autoencoder parity tests: forward equivalence vs. a direct NumPy
transcription of the Lua AE loops (AutoEncoder_text_nostart.lua /
AutoEncoder.lua), gradient-freezing semantics of the weak-paired variants,
and learning sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from novel_vqa_tpu.models.seq import autoencoder as ae
from novel_vqa_tpu.ops import sequence_nll
from tests.test_ops_lstm import np_lstm_step


def np_embed(params, cfg, tokens, with_tanh):
    lookup = np.asarray(params["lookup"])
    idx = np.maximum(tokens, 1) - 1
    x = lookup[idx]
    return np.tanh(x) if with_tanh else x


def np_ae_forward(params, cfg, seq, imgs=None):
    """Literal loop transcription of the reference AE forward (eval mode)."""
    L, N = seq.shape
    H, E = cfg.rnn_size, cfg.input_encoding_size
    n_layers = cfg.num_layers
    with_tanh = cfg.lookup_has_dropout_tanh

    # encoder
    c = np.zeros((n_layers, N, H), np.float32)
    h = np.zeros((n_layers, N, H), np.float32)
    if cfg.variant in ("arch2", "null"):
        steps = []
        steps.append(imgs)
        steps.append(np_embed(params, cfg, np.full((N,), cfg.start_token), with_tanh))
        for t in range(L):
            steps.append(np_embed(params, cfg, seq[t], with_tanh))
        active = [True, True] + [bool((seq[t] != 0).any()) for t in range(L)]
    else:
        steps = [np_embed(params, cfg, seq[t], with_tanh) for t in range(L)]
        active = [bool((seq[t] != 0).any()) for t in range(L)]

    for x_t, a in zip(steps, active):
        if not a:
            continue  # can_skip: batch-wide null tail
        inp = x_t
        for li, layer in enumerate(params["encoder"]):
            c[li], h[li] = np_lstm_step(
                {k: np.asarray(v) for k, v in layer.items()}, inp, c[li], h[li]
            )
            inp = h[li]

    # decoder (1 layer per config)
    dec = params["decoder"]
    dl = len(dec["layers"])
    dc = c[-dl:].copy()
    dh = h[-dl:].copy()
    outs = []
    xs = [np_embed(params, cfg, np.full((N,), cfg.start_token), with_tanh)]
    for t in range(L):
        xs.append(np_embed(params, cfg, seq[t], with_tanh))
    for x_t in xs:
        inp = x_t
        for li, layer in enumerate(dec["layers"]):
            dc[li], dh[li] = np_lstm_step(
                {k: np.asarray(v) for k, v in layer.items()}, inp, dc[li], dh[li]
            )
            inp = dh[li]
        logits = dh[-1] @ np.asarray(dec["proj_w"]) + np.asarray(dec["proj_b"])
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        outs.append(logp)
    return np.stack(outs)


def make_seq(rs, L, N, V):
    lengths = rs.randint(1, L + 1, size=N)
    seq = np.zeros((L, N), np.int32)
    for b in range(N):
        seq[: lengths[b], b] = rs.randint(1, V + 1, size=lengths[b])
    return seq


@pytest.mark.parametrize("variant,layers", [("text_nostart", 1), ("arch2", 2)])
def test_forward_matches_numpy_loop(variant, layers):
    cfg = ae.AEConfig(
        vocab_size=20,
        input_encoding_size=8,
        rnn_size=12,
        num_layers=layers,
        seq_length=6,
        variant=variant,
    )
    params = jax.device_get(ae.init_params(jax.random.PRNGKey(0), cfg))
    rs = np.random.RandomState(0)
    seq = make_seq(rs, 6, 5, 20)
    imgs = (
        rs.randn(5, cfg.input_encoding_size).astype(np.float32)
        if variant == "arch2"
        else None
    )
    got = np.asarray(
        ae.apply(
            params,
            cfg,
            jnp.asarray(seq),
            imgs=None if imgs is None else jnp.asarray(imgs),
            deterministic=True,
        )
    )
    want = np_ae_forward(params, cfg, seq, imgs)
    assert got.shape == (7, 5, 21)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encoder_can_skip_semantics():
    """A batch whose max length < seq_length must stop updating state at the
    batch-wide null tail (state == reference state_enc[tmax])."""
    cfg = ae.AEConfig(vocab_size=10, input_encoding_size=4, rnn_size=6, seq_length=8)
    params = jax.device_get(ae.init_params(jax.random.PRNGKey(1), cfg))
    rs = np.random.RandomState(1)
    seq_short = np.zeros((8, 3), np.int32)
    seq_short[:3] = rs.randint(1, 11, size=(3, 3))  # all rows end at t=3
    c1, h1 = ae.encode(params, cfg, jnp.asarray(seq_short))

    # manually run only 3 steps
    want = np_ae_forward(params, cfg, seq_short)  # full fwd also validates
    c = np.zeros((1, 3, 6), np.float32)
    h = np.zeros((1, 3, 6), np.float32)
    for t in range(3):
        x = np_embed(params, cfg, seq_short[t], True)
        c[0], h[0] = np_lstm_step(
            {k: np.asarray(v) for k, v in params["encoder"][0].items()}, x, c[0], h[0]
        )
    np.testing.assert_allclose(np.asarray(c1), c, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), h, rtol=1e-4, atol=1e-6)


def test_vqa_arch_frozen_lookup_and_skip_gradients():
    cfg = ae.AEConfig(
        vocab_size=15,
        input_encoding_size=6,
        rnn_size=8,
        seq_length=5,
        variant="vqa_arch",
        nhimage=10,
    )
    params = ae.init_params(jax.random.PRNGKey(2), cfg)
    rs = np.random.RandomState(2)
    seq = jnp.asarray(make_seq(rs, 5, 4, 15))
    imgs = jnp.asarray(rs.randn(4, 10).astype(np.float32))
    sent = jnp.asarray(rs.randn(4, 16).astype(np.float32))

    def loss(params, encoder_skip):
        lp = ae.apply(
            params,
            cfg,
            seq,
            imgs=imgs,
            sent_input=sent,
            encoder_skip=encoder_skip,
            deterministic=True,
        )
        return sequence_nll(lp, seq)[0]

    g = jax.grad(loss)(params, False)
    # lookup frozen (AutoEncoder_vqa_arch backward comments out lookup bwd)
    assert float(jnp.abs(g["lookup"]).sum()) == 0.0
    # encoder + multimodal receive gradient
    assert float(jnp.abs(g["encoder"][0]["wx"]).sum()) > 0
    assert float(jnp.abs(g["multimodal"]["wq"]).sum()) > 0

    g_skip = jax.grad(loss)(params, True)
    # with encoder_skip the text encoder is bypassed entirely
    assert float(jnp.abs(g_skip["encoder"][0]["wx"]).sum()) == 0.0
    assert float(jnp.abs(g_skip["multimodal"]["wq"]).sum()) > 0

    def loss_imgs(imgs):
        lp = ae.apply(
            params, cfg, seq, imgs=imgs, sent_input=sent,
            encoder_skip=False, deterministic=True,
        )
        return sequence_nll(lp, seq)[0]

    gi = jax.grad(loss_imgs)(imgs)
    assert float(jnp.abs(gi).sum()) > 0  # image grads flow (for CNN finetune)


def test_null_variant_uses_seq_input():
    cfg = ae.AEConfig(
        vocab_size=12, input_encoding_size=6, rnn_size=8, seq_length=4, variant="null"
    )
    params = ae.init_params(jax.random.PRNGKey(3), cfg)
    rs = np.random.RandomState(3)
    seq = jnp.asarray(make_seq(rs, 4, 3, 12))
    zeros_inp = jnp.zeros_like(seq)
    imgs = jnp.asarray(rs.randn(3, 6).astype(np.float32))
    lp_true = ae.apply(params, cfg, seq, imgs=imgs, seq_input=seq, deterministic=True)
    lp_null = ae.apply(
        params, cfg, seq, imgs=imgs, seq_input=zeros_inp, deterministic=True
    )
    assert not np.allclose(np.asarray(lp_true), np.asarray(lp_null))
    # lookup frozen in the null variant too
    def loss(p):
        lp = ae.apply(p, cfg, seq, imgs=imgs, seq_input=seq, deterministic=True)
        return sequence_nll(lp, seq)[0]

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["lookup"]).sum()) == 0.0


def test_sample_greedy_shapes_and_determinism():
    cfg = ae.AEConfig(vocab_size=10, input_encoding_size=4, rnn_size=6, seq_length=5)
    params = ae.init_params(jax.random.PRNGKey(4), cfg)
    rs = np.random.RandomState(4)
    seq = jnp.asarray(make_seq(rs, 5, 3, 10))
    state = ae.encode(params, cfg, seq)
    toks1, lp1 = ae.sample(params, cfg, state)
    toks2, _ = ae.sample(params, cfg, state)
    assert toks1.shape == (5, 3)
    np.testing.assert_array_equal(np.asarray(toks1), np.asarray(toks2))
    assert int(jnp.min(toks1)) >= 1 and int(jnp.max(toks1)) <= 11


def test_text_ae_learns_identity():
    """A tiny text AE must reduce reconstruction loss with the reference adam."""
    from novel_vqa_tpu.ops import optim as ref_optim

    cfg = ae.AEConfig(vocab_size=8, input_encoding_size=16, rnn_size=24, seq_length=4)
    params = ae.init_params(jax.random.PRNGKey(5), cfg)
    tx = optax.chain(
        ref_optim.clamp(0.1),
        ref_optim.add_decayed_weights(1e-6),
        ref_optim.adam(5e-3, 0.8, 0.999, 1e-8),
    )
    opt_state = tx.init(params)
    rs = np.random.RandomState(5)
    seq = jnp.asarray(make_seq(rs, 4, 32, 8))

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(ae.loss_fn)(params, cfg, seq, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(6)
    losses = []
    for i in range(80):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_apply_nll_matches_sequence_nll_all_variants():
    """The fused in-scan decoder loss (apply_nll) must equal
    sequence_nll(apply(...)) — same rng, every variant, training mode —
    and produce matching gradients (it replaces the materialized
    (L+1, N, V+1) logprobs path in all trainers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from novel_vqa_tpu.models.seq import autoencoder as ae
    from novel_vqa_tpu.ops import sequence_nll

    rs = np.random.RandomState(0)
    L, N, V = 6, 10, 25
    seq_np = np.zeros((L, N), np.int32)
    for i in range(N):
        ln = rs.randint(1, L + 1)
        seq_np[:ln, i] = rs.randint(1, V + 1, size=ln)
    seq = jnp.asarray(seq_np)

    for variant, kwargs in (
        ("text_nostart", {}),
        ("arch2", {"imgs": jnp.asarray(rs.randn(N, 12).astype(np.float32))}),
        ("null", {
            "imgs": jnp.asarray(rs.randn(N, 12).astype(np.float32)),
            "seq_input": jnp.asarray(np.where(rs.rand(L, N) < 0.5, seq_np, 0)),
        }),
        ("vqa_arch", {
            "imgs": jnp.asarray(rs.randn(N, 16).astype(np.float32)),
            "sent_input": jnp.zeros((N, 2 * 14), jnp.float32),
        }),
    ):
        cfg = ae.AEConfig(
            vocab_size=V, input_encoding_size=12, rnn_size=14, num_layers=1,
            seq_length=L, variant=variant, nhimage=16 if variant == "vqa_arch" else 0,
        )
        params = ae.init_params(jax.random.PRNGKey(3), cfg)
        rng = jax.random.PRNGKey(4)

        lp = ae.apply(params, cfg, seq, rng=rng, deterministic=False, **kwargs)
        ref_loss, ref_n = sequence_nll(lp, seq)
        loss, n = ae.apply_nll(params, cfg, seq, rng=rng, deterministic=False, **kwargs)
        assert int(n) == int(ref_n), variant
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, err_msg=variant)

        def f_ref(p):
            return sequence_nll(
                ae.apply(p, cfg, seq, rng=rng, deterministic=False, **kwargs), seq
            )[0]

        def f_fused(p):
            return ae.apply_nll(p, cfg, seq, rng=rng, deterministic=False, **kwargs)[0]

        g_ref = jax.grad(f_ref)(params)
        g_fused = jax.grad(f_fused)(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_fused)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6, err_msg=variant
            )


def test_bf16_compute_close_to_f32_and_trains():
    """compute_dtype="bfloat16" (mixed precision mirroring arch1): the fused
    NLL stays close to f32, gradients w.r.t. the f32 masters stay f32, and a
    few adam steps still reduce the loss.  Covers every variant's forward;
    the training check runs the flagship text_nostart variant."""
    rs = np.random.RandomState(7)
    L, N, V = 6, 10, 25
    seq_np = np.zeros((L, N), np.int32)
    for i in range(N):
        ln = rs.randint(1, L + 1)
        seq_np[:ln, i] = rs.randint(1, V + 1, size=ln)
    seq = jnp.asarray(seq_np)

    for variant, kwargs in (
        ("text_nostart", {}),
        ("arch2", {"imgs": jnp.asarray(rs.randn(N, 12).astype(np.float32))}),
        ("null", {
            "imgs": jnp.asarray(rs.randn(N, 12).astype(np.float32)),
            "seq_input": jnp.asarray(np.where(rs.rand(L, N) < 0.5, seq_np, 0)),
        }),
        ("vqa_arch", {
            "imgs": jnp.asarray(rs.randn(N, 16).astype(np.float32)),
            "sent_input": jnp.zeros((N, 2 * 14), jnp.float32),
        }),
    ):
        mk = lambda dt: ae.AEConfig(
            vocab_size=V, input_encoding_size=12, rnn_size=14, num_layers=1,
            seq_length=L, variant=variant,
            nhimage=16 if variant == "vqa_arch" else 0, compute_dtype=dt,
        )
        params = ae.init_params(jax.random.PRNGKey(3), mk("float32"))
        rng = jax.random.PRNGKey(4)
        loss32, n32 = ae.apply_nll(
            params, mk("float32"), seq, rng=rng, deterministic=False, **kwargs
        )
        loss16, n16 = ae.apply_nll(
            params, mk("bfloat16"), seq, rng=rng, deterministic=False, **kwargs
        )
        assert loss16.dtype == jnp.float32, variant  # loss chain stays f32
        assert int(n16) == int(n32), variant
        np.testing.assert_allclose(
            float(loss16), float(loss32), rtol=3e-2, err_msg=variant
        )

    # masters stay f32: grads of the bf16 forward w.r.t. the f32 params
    cfg16 = ae.AEConfig(
        vocab_size=V, input_encoding_size=12, rnn_size=14, num_layers=1,
        seq_length=L, variant="text_nostart", compute_dtype="bfloat16",
    )
    params = ae.init_params(jax.random.PRNGKey(3), cfg16)
    grads = jax.grad(
        lambda p: ae.apply_nll(
            p, cfg16, seq, rng=jax.random.PRNGKey(4), deterministic=False
        )[0]
    )(params)
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(g)))

    # trains: a few adam steps reduce the deterministic loss
    tx = optax.adam(5e-2)
    opt_state = tx.init(params)
    det = lambda p: float(ae.apply_nll(p, cfg16, seq, deterministic=True)[0])
    loss0 = det(params)

    @jax.jit
    def step(params, opt_state, rng):
        loss, g = jax.value_and_grad(
            lambda p: ae.apply_nll(
                p, cfg16, seq, rng=rng, deterministic=False
            )[0]
        )(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(9)
    for i in range(20):
        params, opt_state, _ = step(params, opt_state, jax.random.fold_in(rng, i))
    assert det(params) < loss0 - 0.2


def test_compute_dtype_validated():
    cfg = ae.AEConfig(vocab_size=5, compute_dtype="bf16")  # typo must raise
    seq = jnp.zeros((3, 2), jnp.int32)
    with pytest.raises(ValueError, match="compute_dtype"):
        ae.apply_nll(cfg=cfg, params=ae.init_params(jax.random.PRNGKey(0),
                     cfg._replace(compute_dtype="float32")), seq=seq)


def test_nll_unroll_knob_matches(monkeypatch):
    """NOVEL_VQA_AE_NLL_UNROLL=1 (on-device A/B knob) is the identical
    computation — same loss and gradients as the default rolled scan."""
    rs = np.random.RandomState(1)
    L, N, V = 5, 6, 20
    seq = jnp.asarray(
        np.where(np.arange(L)[:, None] < rs.randint(1, L + 1, size=N)[None, :],
                 rs.randint(1, V + 1, size=(L, N)), 0).astype(np.int32)
    )
    cfg = ae.AEConfig(
        vocab_size=V, input_encoding_size=8, rnn_size=10, num_layers=1,
        seq_length=L, variant="text_nostart",
    )
    params = ae.init_params(jax.random.PRNGKey(0), cfg)
    rng = jax.random.PRNGKey(2)
    f = lambda p: ae.apply_nll(p, cfg, seq, rng=rng, deterministic=False)[0]
    loss_rolled, g_rolled = jax.value_and_grad(f)(params)
    monkeypatch.setenv("NOVEL_VQA_AE_NLL_UNROLL", "1")
    loss_unrolled, g_unrolled = jax.value_and_grad(f)(params)
    np.testing.assert_allclose(
        float(loss_rolled), float(loss_unrolled), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(g_rolled), jax.tree_util.tree_leaves(g_unrolled)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
