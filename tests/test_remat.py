"""jax.checkpoint rematerialization: identical values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.models.vqa import arch1
from novel_vqa_tpu.ops import lstm_encode
from novel_vqa_tpu.ops.lstm import lstm_layer_init


def test_lstm_encode_remat_matches():
    params = [lstm_layer_init(jax.random.PRNGKey(0), 8, 12)]
    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.randn(5, 4, 8).astype(np.float32))
    mask = jnp.ones((5, 4))

    def loss(p, remat):
        c, h = lstm_encode(p, xs, mask, remat=remat)
        return jnp.sum(h * h) + jnp.sum(jnp.sin(c))

    v1, g1 = jax.value_and_grad(loss)(params, False)
    v2, g2 = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_arch1_remat_config():
    cfg = arch1.Arch1Config(
        vocab_size=20, input_encoding_size=8, rnn_size=10, rnn_layer=1,
        nhimage=8, common_embedding_size=8, num_output=4, remat=True,
    )
    params = arch1.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((4, 5), jnp.int32).at[:, -1].set(3)
    image = jnp.ones((4, 8), jnp.float32)
    labels = jnp.ones((4,), jnp.int32)

    def loss(p):
        return arch1.loss_fn(p, cfg, tokens, image, labels, jax.random.PRNGKey(1))

    cfg_plain = cfg._replace(remat=False)

    def loss_plain(p):
        return arch1.loss_fn(p, cfg_plain, tokens, image, labels, jax.random.PRNGKey(1))

    g1 = jax.grad(loss)(params)
    g2 = jax.grad(loss_plain)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
