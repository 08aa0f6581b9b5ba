"""Optimizer parity vs. NumPy transcriptions of
001_train_autoencoder/misc/optim_updates.lua."""

import numpy as np
import jax.numpy as jnp
import optax

from novel_vqa_tpu.ops import optim as ref_optim


def run_tx(tx, params, grads_list):
    state = tx.init(params)
    p = params
    for g in grads_list:
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
    return p


def make_data(steps=4, shape=(6,), seed=0):
    rs = np.random.RandomState(seed)
    params = {"a": jnp.asarray(rs.randn(*shape).astype(np.float32))}
    grads = [
        {"a": jnp.asarray(rs.randn(*shape).astype(np.float32))} for _ in range(steps)
    ]
    return params, grads


def test_rmsprop_matches_lua():
    params, grads = make_data()
    lr, alpha, eps = 0.01, 0.99, 1e-8
    x = np.asarray(params["a"]).copy()
    m = np.zeros_like(x)
    for g in grads:
        gn = np.asarray(g["a"])
        m = alpha * m + (1 - alpha) * gn * gn  # optim_updates.lua:66-67
        x = x - lr * gn / (np.sqrt(m) + eps)  # :69-74
    got = run_tx(ref_optim.rmsprop(lr, alpha, eps), params, grads)
    np.testing.assert_allclose(np.asarray(got["a"]), x, rtol=1e-6, atol=1e-7)


def test_adam_matches_lua():
    params, grads = make_data(steps=5, seed=1)
    lr, b1, b2, eps = 0.001, 0.9, 0.999, 1e-8
    x = np.asarray(params["a"]).copy()
    m = np.zeros_like(x)
    v = np.zeros_like(x)
    t = 0
    for g in grads:
        gn = np.asarray(g["a"])
        m = b1 * m + (1 - b1) * gn  # optim_updates.lua:95
        v = b2 * v + (1 - b2) * gn * gn  # :96
        t += 1
        step = lr * np.sqrt(1 - b2**t) / (1 - b1**t)  # :100-102
        x = x - step * m / (np.sqrt(v) + eps)  # :97,105-109
    got = run_tx(ref_optim.adam(lr, b1, b2, eps), params, grads)
    np.testing.assert_allclose(np.asarray(got["a"]), x, rtol=1e-6, atol=1e-7)


def test_sgdmom_matches_lua():
    params, grads = make_data(steps=4, seed=2)
    lr, alpha = 0.1, 0.9
    x = np.asarray(params["a"]).copy()
    m = np.zeros_like(x)
    for g in grads:
        gn = np.asarray(g["a"])
        tmp = m.copy()  # optim_updates.lua:32
        m = alpha * m - lr * gn  # :34
        x = x - alpha * tmp + (1 + alpha) * m  # :38-39
    got = run_tx(ref_optim.sgdmom(lr, alpha), params, grads)
    np.testing.assert_allclose(np.asarray(got["a"]), x, rtol=1e-6, atol=1e-7)


def test_adagrad_matches_lua():
    params, grads = make_data(steps=4, seed=3)
    lr, eps = 0.05, 1e-8
    x = np.asarray(params["a"]).copy()
    m = np.zeros_like(x)
    for g in grads:
        gn = np.asarray(g["a"])
        m = m + gn * gn  # optim_updates.lua:48
        x = x - lr * gn / (np.sqrt(m) + eps)  # :50-55
    got = run_tx(ref_optim.adagrad(lr, eps), params, grads)
    np.testing.assert_allclose(np.asarray(got["a"]), x, rtol=1e-6, atol=1e-7)


def test_rmsprop_with_lr_scale():
    """Per-parameter lr scale vector (rmsprop_lrscale.lua:1-38)."""
    params, grads = make_data(steps=3, seed=4)
    lrs = {"a": jnp.asarray(np.linspace(0.0, 1.0, 6).astype(np.float32))}
    lr, alpha, eps = 0.01, 0.99, 1e-8
    x = np.asarray(params["a"]).copy()
    m = np.zeros_like(x)
    s = np.asarray(lrs["a"])
    for g in grads:
        gn = np.asarray(g["a"])
        m = alpha * m + (1 - alpha) * gn * gn
        x = x - lr * (gn / (np.sqrt(m) + eps)) * s  # addcmul(-lr, upd, lrs)
    got = run_tx(ref_optim.rmsprop(lr, alpha, eps, lrs=lrs), params, grads)
    np.testing.assert_allclose(np.asarray(got["a"]), x, rtol=1e-6, atol=1e-7)


def test_clamp_and_weight_decay():
    tx = optax.chain(ref_optim.clamp(0.1), ref_optim.add_decayed_weights(0.0))
    params = {"a": jnp.asarray([1.0, -1.0])}
    state = tx.init(params)
    upd, _ = tx.update({"a": jnp.asarray([5.0, -5.0])}, state, params)
    np.testing.assert_allclose(np.asarray(upd["a"]), [0.1, -0.1])


def test_exponential_decay_schedule():
    sched = ref_optim.exponential_decay_schedule(3e-4, 0.99997592083)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 3e-4, rtol=1e-6)
    # 0.99997592083^50000 = 0.29999... (the "-- 50000" comment at
    # 002_train_baseline.lua:78 notwithstanding, the true half-life is
    # ~28786 iterations)
    np.testing.assert_allclose(
        float(sched(jnp.asarray(50000))), 9.0e-5, rtol=1e-3
    )


def test_half_life_schedule_continuous():
    sched = ref_optim.half_life_schedule(1e-4, decay_start=10, decay_every=100)
    np.testing.assert_allclose(float(sched(jnp.asarray(10))), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(110))), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(
        float(sched(jnp.asarray(60))), 1e-4 * 0.5**0.5, rtol=1e-6
    )
    off = ref_optim.half_life_schedule(1e-4, decay_start=-1, decay_every=100)
    np.testing.assert_allclose(float(off(jnp.asarray(1000))), 1e-4, rtol=1e-6)
