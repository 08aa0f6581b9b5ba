"""Pallas fused LSTM step: interpreter-mode parity with the XLA step,
forward and backward (custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.ops.lstm import lstm_layer_init, lstm_step
from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_step


def make_inputs(N=20, In=16, H=32, seed=0):
    params = jax.device_get(lstm_layer_init(jax.random.PRNGKey(seed), In, H))
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(N, In).astype(np.float32))
    c = jnp.asarray(rs.randn(N, H).astype(np.float32))
    h = jnp.asarray(rs.randn(N, H).astype(np.float32))
    return params, x, c, h


def test_forward_matches_xla():
    params, x, c, h = make_inputs()
    c1, h1 = lstm_step(params, x, c, h)
    c2, h2 = pallas_lstm_step(params, x, c, h, tile_n=8, interpret=True)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)


def test_forward_with_batch_padding():
    # N not a multiple of the tile: padding path
    params, x, c, h = make_inputs(N=13)
    c1, h1 = lstm_step(params, x, c, h)
    c2, h2 = pallas_lstm_step(params, x, c, h, tile_n=8, interpret=True)
    assert c2.shape == (13, 32)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff():
    params, x, c, h = make_inputs(N=8, In=12, H=16, seed=1)

    def loss_ref(params, x, c, h):
        c2, h2 = lstm_step(params, x, c, h)
        return jnp.sum(jnp.sin(c2)) + jnp.sum(h2 * h2)

    def loss_pl(params, x, c, h):
        c2, h2 = pallas_lstm_step(params, x, c, h, tile_n=8, interpret=True)
        return jnp.sum(jnp.sin(c2)) + jnp.sum(h2 * h2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, x, c, h)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(params, x, c, h)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_seq_kernel_matches_lstm_encode():
    from novel_vqa_tpu.ops import lstm_encode
    from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_encode

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    layers = [lstm_layer_init(k1, 8, 16), lstm_layer_init(k2, 16, 16)]
    rs = np.random.RandomState(3)
    T, N = 6, 10
    xs = jnp.asarray(rs.randn(T, N, 8).astype(np.float32))
    mask_np = np.zeros((T, N), np.float32)
    for i in range(N):
        L = rs.randint(1, T + 1)
        mask_np[T - L :, i] = 1.0  # right-aligned activity
        xs = xs.at[: T - L, i].set(0.0)
    mask = jnp.asarray(mask_np)

    c_ref, h_ref = lstm_encode(layers, xs, mask)
    c_pl, h_pl = pallas_lstm_encode(layers, xs, mask, tile_n=8, interpret=True)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref), rtol=1e-5, atol=1e-5)


def test_seq_bwd_matches_autodiff_ragged_mask_all_cotangents():
    """The hand-structured _seq_bwd (gates recomputed in one matmul, a
    reverse scan carrying (dh, dc) with one matmul/step) must match
    autodiff through the identical XLA scan — including the masked
    pass-through paths and cotangents on ALL THREE outputs (c, h, hs)."""
    from novel_vqa_tpu.ops.pallas_lstm import _xla_seq_reference, pallas_lstm_seq

    params = jax.device_get(lstm_layer_init(jax.random.PRNGKey(5), 6, 8))
    rs = np.random.RandomState(5)
    T, N = 7, 9
    xs = jnp.asarray(rs.randn(T, N, 6).astype(np.float32))
    mask_np = np.zeros((T, N), np.float32)
    for i in range(N):
        L = rs.randint(1, T + 1)
        mask_np[T - L :, i] = 1.0
    mask = jnp.asarray(mask_np)
    wc = jnp.asarray(rs.randn(N, 8).astype(np.float32))
    wh_ = jnp.asarray(rs.randn(N, 8).astype(np.float32))
    whs = jnp.asarray(rs.randn(T, N, 8).astype(np.float32))

    def loss_of(outs):
        c, h, hs = outs
        return jnp.sum(c * wc) + jnp.sum(jnp.sin(h) * wh_) + jnp.sum(hs * whs)

    def loss_ref(p, xs):
        b = p["bx"] + p["bh"]
        return loss_of(_xla_seq_reference(xs, mask, p["wx"], p["wh"], b))

    def loss_pl(p, xs):
        return loss_of(pallas_lstm_seq(p, xs, mask, tile_n=8, interpret=True))

    v_ref = float(loss_ref(params, xs))
    v_pl = float(loss_pl(params, xs))
    np.testing.assert_allclose(v_pl, v_ref, rtol=1e-5)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, xs)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(params, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_encode_train_matches_per_step_path_no_dropout():
    """pallas_lstm_encode_train with rate 0 equals the per-step training
    scan (value and grads) on ragged masks — the restructured training
    route is the same function."""
    from novel_vqa_tpu.ops import lstm_encode
    from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_encode_train

    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    layers = [lstm_layer_init(k1, 5, 8), lstm_layer_init(k2, 8, 8)]
    rs = np.random.RandomState(6)
    T, N = 6, 7
    xs = jnp.asarray(rs.randn(T, N, 5).astype(np.float32))
    mask_np = np.zeros((T, N), np.float32)
    for i in range(N):
        mask_np[T - rs.randint(1, T + 1) :, i] = 1.0
    mask = jnp.asarray(mask_np)
    rng = jax.random.PRNGKey(7)

    def loss_ref(p):
        c, h = lstm_encode(p, xs, mask, dropout_rate=0.0, rng=rng, deterministic=False)
        return jnp.sum(h * h) + jnp.sum(jnp.sin(c))

    def loss_pl(p):
        c, h = pallas_lstm_encode_train(p, xs, mask, 0.0, rng, tile_n=8, interpret=True)
        return jnp.sum(h * h) + jnp.sum(jnp.sin(c))

    np.testing.assert_allclose(float(loss_pl(layers)), float(loss_ref(layers)), rtol=1e-5)
    g_ref = jax.grad(loss_ref)(layers)
    g_pl = jax.grad(loss_pl)(layers)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_encode_train_dropout_statistics():
    """Inter-layer dropout in the train route: correct keep rate and
    inverted scaling on layer 1's hidden sequence feeding layer 2."""
    from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_encode_train

    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    layers = [lstm_layer_init(k1, 4, 8), lstm_layer_init(k2, 8, 8)]
    rs = np.random.RandomState(8)
    xs = jnp.asarray(rs.randn(5, 64, 4).astype(np.float32))
    mask = jnp.ones((5, 64))

    outs = {}
    for rate in (0.0, 0.5):
        c, h = pallas_lstm_encode_train(
            layers, xs, mask, rate, jax.random.PRNGKey(9), tile_n=8, interpret=True
        )
        outs[rate] = np.asarray(h)
    # layer 1 (index 0) sees no dropout anywhere -> identical
    np.testing.assert_allclose(outs[0.0][0], outs[0.5][0], rtol=1e-6)
    # layer 2 differs (its input sequence was masked)
    assert not np.allclose(outs[0.0][1], outs[0.5][1])


def test_seq_kernel_gradients():
    from novel_vqa_tpu.ops import lstm_encode
    from novel_vqa_tpu.ops.pallas_lstm import pallas_lstm_encode

    layers = [lstm_layer_init(jax.random.PRNGKey(4), 6, 8)]
    rs = np.random.RandomState(4)
    xs = jnp.asarray(rs.randn(4, 8, 6).astype(np.float32))
    mask = jnp.ones((4, 8))

    def loss_ref(p, xs):
        c, h = lstm_encode(p, xs, mask)
        return jnp.sum(h * h) + jnp.sum(jnp.sin(c))

    def loss_pl(p, xs):
        c, h = pallas_lstm_encode(p, xs, mask, tile_n=8, interpret=True)
        return jnp.sum(h * h) + jnp.sum(jnp.sin(c))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(layers, xs)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(layers, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused2_encode_matches_reference_with_same_mask():
    """The fused 2-layer wavefront kernel (ops/pallas_lstm2, interpreter
    mode) must match an XLA reference computing the same math with the SAME
    dropout multiplier — outputs and all input/weight grads (bf16 storage =>
    loose-ish tolerances)."""
    import jax

    from novel_vqa_tpu.ops import pallas_lstm2 as pl2
    from novel_vqa_tpu.ops.lstm import lstm_layer_init

    rs = np.random.RandomState(0)
    T, N, In, H = 5, 12, 24, 16
    k = jax.random.PRNGKey(0)
    layers = [
        lstm_layer_init(jax.random.fold_in(k, 1), In, H),
        lstm_layer_init(jax.random.fold_in(k, 2), H, H),
    ]
    xs = jnp.asarray(rs.randn(T, N, In), jnp.float32)
    lengths = rs.randint(1, T + 1, size=N)
    mask = jnp.asarray(
        (np.arange(T)[:, None] >= (T - lengths[None, :])).astype(np.float32)
    )
    drop = jnp.asarray(rs.binomial(1, 0.5, size=(T, N, H)) * 2.0, jnp.float32)

    def ref(args):
        l1wx, l1wh, l1b, l2wx, l2wh, l2b, xs_ = args
        c1 = h1 = c2 = h2 = jnp.zeros((N, H), jnp.float32)
        for t in range(T):
            g1 = xs_[t] @ l1wx + h1 @ l1wh + l1b
            i, f, o, g = (jax.nn.sigmoid(g1[:, :H]), jax.nn.sigmoid(g1[:, H:2*H]),
                          jax.nn.sigmoid(g1[:, 2*H:3*H]), jnp.tanh(g1[:, 3*H:]))
            c1n = f * c1 + i * g
            h1n = o * jnp.tanh(c1n)
            m = mask[t][:, None]
            c1 = jnp.where(m > 0, c1n, c1)
            h1 = jnp.where(m > 0, h1n, h1)
            d = h1 * drop[t]
            g2 = d @ l2wx + h2 @ l2wh + l2b
            i, f, o, g = (jax.nn.sigmoid(g2[:, :H]), jax.nn.sigmoid(g2[:, H:2*H]),
                          jax.nn.sigmoid(g2[:, 2*H:3*H]), jnp.tanh(g2[:, 3*H:]))
            c2n = f * c2 + i * g
            h2n = o * jnp.tanh(c2n)
            c2 = jnp.where(m > 0, c2n, c2)
            h2 = jnp.where(m > 0, h2n, h2)
        return c1, h1, c2, h2

    def fused(args):
        l1wx, l1wh, l1b, l2wx, l2wh, l2b, xs_ = args
        bf = jnp.bfloat16
        return pl2._fused2(
            xs_.astype(bf), mask, drop.astype(bf),
            l1wx.astype(bf), l1wh.astype(bf), l1b.astype(bf),
            l2wx.astype(bf), l2wh.astype(bf), l2b.astype(bf),
            8, True,  # tile_n=8, interpret
        )

    args = (
        layers[0]["wx"], layers[0]["wh"], layers[0]["bx"] + layers[0]["bh"],
        layers[1]["wx"], layers[1]["wh"], layers[1]["bx"] + layers[1]["bh"],
        xs,
    )
    out_r = ref(args)
    out_f = fused(args)
    for a, b in zip(out_r, out_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-2, atol=3e-2)

    # grads of a scalar functional of all four outputs
    cot = [jnp.asarray(rs.randn(N, H), jnp.float32) for _ in range(4)]

    def scal(f):
        def g(args):
            out = f(args)
            return sum(jnp.sum(o.astype(jnp.float32) * c) for o, c in zip(out, cot))
        return g

    g_r = jax.grad(scal(ref))(args)
    g_f = jax.grad(scal(fused))(args)
    for a, b in zip(g_r, g_f):
        d = np.abs(np.asarray(a) - np.asarray(b))
        scale = np.abs(np.asarray(a)).max() + 1e-3
        assert d.max() / scale < 5e-2, (d.max(), scale)


def test_fused2_encode_train_wrapper():
    """The NOVEL_VQA_FUSED2 routing wrapper itself (pallas_lstm2.
    fused2_encode_train: rbg dropout-mask draw, per-layer bx+bh summing,
    bf16 casts, (2, N, H) stacking) — the inner-kernel test above cannot
    catch wrapper wiring bugs (wrong layer's biases, wrong keep-rate), and
    the lstm_encode route is TPU-gated so the CPU suite never reaches it."""
    from novel_vqa_tpu.ops import pallas_lstm2 as pl2
    from novel_vqa_tpu.ops.dropout import dropout
    from novel_vqa_tpu.ops.lstm import lstm_encode

    rs = np.random.RandomState(1)
    T, N, In, H = 5, 8, 12, 16
    k = jax.random.PRNGKey(3)
    layers = [
        lstm_layer_init(jax.random.fold_in(k, 1), In, H),
        lstm_layer_init(jax.random.fold_in(k, 2), H, H),
    ]
    xs = jnp.asarray(rs.randn(T, N, In), jnp.float32)
    lengths = rs.randint(1, T + 1, size=N)
    mask = jnp.asarray(
        (np.arange(T)[:, None] >= (T - lengths[None, :])).astype(np.float32)
    )

    # rate 0: must match the XLA encode (independent oracle; bf16 tolerance)
    c_f, h_f = pl2.fused2_encode_train(
        layers, xs, mask, 0.0, None, tile_n=8, interpret=True
    )
    c_r, h_r = lstm_encode(layers, xs, mask, deterministic=True)
    assert c_f.shape == tuple(c_r.shape) == (2, N, H)
    np.testing.assert_allclose(
        np.asarray(c_f, np.float32), np.asarray(c_r), rtol=3e-2, atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(h_f, np.float32), np.asarray(h_r), rtol=3e-2, atol=3e-2
    )

    # rate 0.5, fixed rng: the wrapper must equal the inner kernel fed the
    # ONE whole-sequence rbg multiplier it documents (same draw) with the
    # per-layer bias sums; the multiplier itself must be {0, 1/keep}-scaled
    rng = jax.random.PRNGKey(7)
    c_f, h_f = pl2.fused2_encode_train(
        layers, xs, mask, 0.5, rng, tile_n=8, interpret=True
    )
    drop_f32 = dropout(rng, jnp.ones((T, N, H), jnp.float32), 0.5, False)
    vals = set(np.unique(np.asarray(drop_f32)))
    assert vals <= {0.0, 2.0} and len(vals) == 2, vals
    bf = jnp.bfloat16
    c1, h1, c2, h2 = pl2._fused2(
        xs.astype(bf), mask, drop_f32.astype(bf),
        layers[0]["wx"].astype(bf), layers[0]["wh"].astype(bf),
        (layers[0]["bx"] + layers[0]["bh"]).astype(bf),
        layers[1]["wx"].astype(bf), layers[1]["wh"].astype(bf),
        (layers[1]["bx"] + layers[1]["bh"]).astype(bf),
        8, True,  # tile_n=8, interpret
    )
    np.testing.assert_array_equal(np.asarray(c_f), np.asarray(jnp.stack([c1, c2])))
    np.testing.assert_array_equal(np.asarray(h_f), np.asarray(jnp.stack([h1, h2])))
