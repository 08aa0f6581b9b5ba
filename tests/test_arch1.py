"""Arch1 model tests: shapes, determinism, and learning on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.models.vqa import arch1


def tiny_cfg():
    return arch1.Arch1Config(
        vocab_size=50,
        input_encoding_size=16,
        rnn_size=24,
        rnn_layer=2,
        nhimage=32,
        common_embedding_size=20,
        num_output=8,
    )


def test_forward_shapes_and_determinism():
    cfg = tiny_cfg()
    params = arch1.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 50, size=(4, 6)))
    image = jnp.asarray(np.random.RandomState(1).randn(4, 32).astype(np.float32))
    s1 = arch1.apply(params, cfg, tokens, image, deterministic=True)
    s2 = arch1.apply(params, cfg, tokens, image, deterministic=True)
    assert s1.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_train_step_learns_synthetic_mapping():
    """Loss must drop on a separable synthetic task: the answer is determined
    by the image feature cluster."""
    cfg = tiny_cfg()
    params = arch1.init_params(jax.random.PRNGKey(0), cfg)
    tx = arch1.make_optimizer(learning_rate=3e-3)
    opt_state = tx.init(params)

    rs = np.random.RandomState(0)
    N = 64
    labels = rs.randint(1, 9, size=N).astype(np.int32)
    image = (np.eye(8)[labels - 1] @ rs.randn(8, 32)).astype(np.float32)
    image += 0.01 * rs.randn(N, 32).astype(np.float32)
    tokens = np.zeros((N, 6), np.int32)
    tokens[:, -3:] = rs.randint(1, 50, size=(N, 3))

    losses = []
    rng = jax.random.PRNGKey(1)
    for step in range(60):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = arch1.train_step(
            cfg,
            tx,
            params,
            opt_state,
            jnp.asarray(tokens),
            jnp.asarray(image),
            jnp.asarray(labels),
            sub,
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses[::10]


def test_eval_step_scores():
    cfg = tiny_cfg()
    params = arch1.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((4, 6), jnp.int32).at[:, -1].set(3)
    image = jnp.ones((4, 32), jnp.float32)
    labels = jnp.ones((4,), jnp.int32)
    loss, scores = arch1.eval_step(cfg, params, tokens, image, labels)
    assert scores.shape == (4, 8)
    assert np.isfinite(float(loss))


def test_askipb_variant_runs():
    cfg = tiny_cfg()._replace(fusion="askipb")
    params = arch1.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((2, 6), jnp.int32).at[:, -1].set(1)
    image = jnp.ones((2, 32), jnp.float32)
    s = arch1.apply(params, cfg, tokens, image, deterministic=True)
    assert s.shape == (2, 8)


def test_bf16_mixed_precision_close_to_f32_and_trains():
    """compute_dtype="bfloat16": bf16 weights/activations with f32
    accumulation + f32 master params.  Forward stays close to f32 (bf16 has
    ~3 decimal digits), grads land in f32 on the master tree, and the train
    step still learns the synthetic mapping."""
    cfg32 = tiny_cfg()
    cfg16 = cfg32._replace(compute_dtype="bfloat16")
    params = arch1.init_params(jax.random.PRNGKey(0), cfg32)
    tokens = jnp.asarray(np.random.RandomState(0).randint(0, 50, size=(8, 6)))
    image = jnp.asarray(np.random.RandomState(1).randn(8, 32).astype(np.float32))

    s32 = np.asarray(arch1.apply(params, cfg32, tokens, image, deterministic=True))
    s16 = np.asarray(arch1.apply(params, cfg16, tokens, image, deterministic=True))
    assert s16.dtype == np.float32  # loss-side scores stay f32
    np.testing.assert_allclose(s16, s32, atol=0.05, rtol=0.05)

    labels = jnp.asarray(np.random.RandomState(2).randint(1, 9, size=8))
    grads = jax.grad(arch1.loss_fn)(
        params, cfg16, tokens, image, labels, jax.random.PRNGKey(3)
    )
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32  # master-weight grads are f32
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0

    tx = arch1.make_optimizer(learning_rate=3e-3)
    opt_state = tx.init(params)
    rs = np.random.RandomState(0)
    N = 64
    lab = rs.randint(1, 9, size=N).astype(np.int32)
    img = (np.eye(8)[lab - 1] @ rs.randn(8, 32)).astype(np.float32)
    tok = np.zeros((N, 6), np.int32)
    tok[:, -3:] = rs.randint(1, 50, size=(N, 3))
    losses = []
    rng = jax.random.PRNGKey(1)
    p, o = params, opt_state
    for _ in range(60):
        rng, sub = jax.random.split(rng)
        p, o, loss = arch1.train_step(
            cfg16, tx, p, o, jnp.asarray(tok), jnp.asarray(img), jnp.asarray(lab), sub
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.6, losses[::10]


def test_unknown_fusion_raises():
    """A typo'd --fusion must raise at trace time, not silently route to the
    wp fusion head (wrong scores, no error — round-4 review finding)."""
    import pytest

    cfg = tiny_cfg()._replace(fusion="aXb")
    params = arch1.init_params(jax.random.PRNGKey(0), cfg._replace(fusion="axb"))
    tokens = jnp.zeros((2, 6), jnp.int32)
    image = jnp.zeros((2, 32), jnp.float32)
    with pytest.raises(ValueError, match="fusion"):
        arch1.apply(params, cfg, tokens, image, deterministic=True)
