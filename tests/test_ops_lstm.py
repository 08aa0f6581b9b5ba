"""Unit parity for the LSTM kernels vs. the reference equations
(001_train_autoencoder/misc/LSTM_encoder.lua:32-50)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from novel_vqa_tpu.ops import (
    lstm_encode,
    lstm_layer_init,
    lstm_step,
    lstm_stack_step,
    pack_state,
    unpack_state,
)


def np_lstm_step(p, x, c, h):
    """Direct NumPy transcription of the Lua cell: gate order [i, f, o, g]."""
    H = c.shape[-1]
    gates = x @ np.asarray(p["wx"]) + np.asarray(p["bx"]) + h @ np.asarray(p["wh"]) + np.asarray(p["bh"])
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    i = sig(gates[..., 0 * H : 1 * H])
    f = sig(gates[..., 1 * H : 2 * H])
    o = sig(gates[..., 2 * H : 3 * H])
    g = np.tanh(gates[..., 3 * H : 4 * H])
    c_new = f * c + i * g
    h_new = o * np.tanh(c_new)
    return c_new, h_new


def test_lstm_step_matches_equations():
    rng = jax.random.PRNGKey(0)
    p = lstm_layer_init(rng, 16, 32)
    x = np.random.RandomState(1).randn(4, 16).astype(np.float32)
    c = np.random.RandomState(2).randn(4, 32).astype(np.float32)
    h = np.random.RandomState(3).randn(4, 32).astype(np.float32)
    c_j, h_j = lstm_step(p, jnp.asarray(x), jnp.asarray(c), jnp.asarray(h))
    c_n, h_n = np_lstm_step(p, x, c, h)
    np.testing.assert_allclose(np.asarray(c_j), c_n, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_n, rtol=1e-5, atol=1e-5)


def test_pack_unpack_roundtrip():
    c = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    h = -jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    packed = pack_state(c, h)
    assert packed.shape == (3, 16)
    # layout [c1, h1, c2, h2] per misc/LSTM.lua:21-23
    np.testing.assert_array_equal(np.asarray(packed[:, 0:4]), np.asarray(c[0]))
    np.testing.assert_array_equal(np.asarray(packed[:, 4:8]), np.asarray(h[0]))
    np.testing.assert_array_equal(np.asarray(packed[:, 8:12]), np.asarray(c[1]))
    c2, h2 = unpack_state(packed, 2)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c))
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h))


def test_masked_scan_equals_per_sequence_loop():
    """Right-aligned dense masked scan == running each sequence alone
    (the ragged-batching equivalence claimed vs RNNUtils.lua:84-154)."""
    rng = jax.random.PRNGKey(42)
    k1, k2 = jax.random.split(rng)
    E, H, D, N = 8, 12, 6, 5
    params = [lstm_layer_init(k1, E, H), lstm_layer_init(k2, H, H)]

    rs = np.random.RandomState(0)
    lengths = np.array([6, 3, 1, 4, 6])
    embs = rs.randn(N, D, E).astype(np.float32)  # right-aligned inputs
    mask = np.zeros((N, D), np.float32)
    for i, L in enumerate(lengths):
        mask[i, D - L :] = 1.0
        embs[i, : D - L] = 0.0

    xs = jnp.swapaxes(jnp.asarray(embs), 0, 1)
    m = jnp.swapaxes(jnp.asarray(mask), 0, 1)
    c, h = lstm_encode(params, xs, m)

    for i, L in enumerate(lengths):
        seq = embs[i, D - L :]  # the real tokens only
        ci = np.zeros((2, 1, H), np.float32)
        hi = np.zeros((2, 1, H), np.float32)
        for t in range(L):
            x_t = seq[t : t + 1]
            inp = x_t
            new_c, new_h = [], []
            for layer_idx, p in enumerate(params):
                c_l, h_l = np_lstm_step(p, inp, ci[layer_idx], hi[layer_idx])
                new_c.append(c_l)
                new_h.append(h_l)
                inp = h_l
            ci, hi = np.stack(new_c), np.stack(new_h)
        np.testing.assert_allclose(np.asarray(c[:, i]), ci[:, 0], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h[:, i]), hi[:, 0], rtol=1e-4, atol=1e-5)


def test_scan_gradients_flow():
    rng = jax.random.PRNGKey(7)
    params = [lstm_layer_init(rng, 4, 8)]
    xs = jnp.ones((3, 2, 4))
    mask = jnp.ones((3, 2))

    def f(p):
        c, h = lstm_encode(p, xs, mask)
        return jnp.sum(h)

    grads = jax.grad(f)(params)
    total = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree_util.tree_leaves(grads))
    assert total > 0


def test_layerwise_encode_matches_stacked_scan():
    """lstm_encode_layerwise (one big x-projection matmul per layer, only the
    h@Wh recurrence sequential — the dispatch-overhead fix for the arch1
    train step, docs/PERF.md round 3) is the same math as the stacked scan:
    identical final states and parameter gradients on ragged masks."""
    from novel_vqa_tpu.ops.lstm import lstm_encode_layerwise

    rs = np.random.RandomState(0)
    T, N, E, H = 16, 8, 20, 16
    params = [
        lstm_layer_init(jax.random.PRNGKey(i), E if i == 0 else H, H)
        for i in range(2)
    ]
    xs = jnp.asarray(rs.randn(T, N, E).astype(np.float32))
    lengths = rs.randint(1, T + 1, size=N)
    mask = jnp.asarray(
        (np.arange(T)[:, None] >= (T - lengths[None, :])).astype(np.float32)
    )

    c0, h0 = lstm_encode(params, xs, mask, deterministic=True)
    c1, h1 = lstm_encode_layerwise(params, xs, mask, deterministic=True, unroll=4)
    np.testing.assert_allclose(np.asarray(c0), np.asarray(c1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)

    def loss(enc_fn, p):
        c, h = enc_fn(p, xs, mask, deterministic=True)
        return jnp.sum(c**2) + jnp.sum(jnp.tanh(h))

    g0 = jax.grad(lambda p: loss(lstm_encode, p))(params)
    g1 = jax.grad(lambda p: loss(lstm_encode_layerwise, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_resid_cell_grads_match(monkeypatch):
    """NOVEL_VQA_BF16_RESID=1 routes training steps through the custom-VJP
    cell that stores backward residuals in bf16 (f32 compute both
    directions — the A/B knob behind the docs/PERF.md record).  Gradients
    must match autodiff to bf16-rounding tolerance on ragged masks."""
    rs = np.random.RandomState(0)
    T, N, E, H = 16, 8, 20, 16
    params = [
        lstm_layer_init(jax.random.PRNGKey(i), E if i == 0 else H, H)
        for i in range(2)
    ]
    xs = jnp.asarray(rs.randn(T, N, E).astype(np.float32))
    lengths = rs.randint(1, T + 1, size=N)
    mask = jnp.asarray(
        (np.arange(T)[:, None] >= (T - lengths[None, :])).astype(np.float32)
    )

    def loss(p):
        # deterministic=False exercises the TRAINING cell route
        c, h = lstm_encode(p, xs, mask, deterministic=False, dropout_rate=0.0)
        return jnp.sum(c**2) + jnp.sum(jnp.tanh(h))

    g0 = jax.grad(loss)(params)
    monkeypatch.setenv("NOVEL_VQA_BF16_RESID", "1")
    jax.clear_caches()  # the env gate is read at trace time
    g1 = jax.grad(loss)(params)
    jax.clear_caches()
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
        assert rel < 2e-2, rel
