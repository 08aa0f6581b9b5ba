"""-lr_scale gradient downweighting (003_train_ae_based_wp.lua:344)."""

import jax
import jax.numpy as jnp
import numpy as np

from novel_vqa_tpu.models.vqa import arch1


def test_lr_scale_zero_freezes_encoder_and_embedding():
    cfg = arch1.Arch1Config(
        vocab_size=20, input_encoding_size=8, rnn_size=10, rnn_layer=1,
        nhimage=8, common_embedding_size=8, num_output=4,
    )
    params = arch1.init_params(jax.random.PRNGKey(0), cfg)
    grad_scales = jax.tree_util.tree_map(lambda _: 1.0, params)
    for block in ("embedding", "encoder"):
        grad_scales[block] = jax.tree_util.tree_map(
            lambda _: 0.0, grad_scales[block]
        )
    tx = arch1.make_optimizer(learning_rate=1e-2, grad_scales=grad_scales)
    opt_state = tx.init(params)

    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(1, 21, size=(8, 5)), jnp.int32)
    image = jnp.asarray(rs.randn(8, 8).astype(np.float32))
    labels = jnp.asarray(rs.randint(1, 5, size=8), jnp.int32)

    p2, _, loss = arch1.train_step(
        cfg, tx, params, opt_state, tokens, image, labels, jax.random.PRNGKey(1)
    )
    params_h = jax.device_get(arch1.init_params(jax.random.PRNGKey(0), cfg))
    # frozen blocks unchanged
    for block in ("embedding", "encoder"):
        for a, b in zip(
            jax.tree_util.tree_leaves(params_h[block]),
            jax.tree_util.tree_leaves(p2[block]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the rest moved
    moved = sum(
        float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(params_h["fusion"]),
            jax.tree_util.tree_leaves(p2["fusion"]),
        )
    )
    assert moved > 0
