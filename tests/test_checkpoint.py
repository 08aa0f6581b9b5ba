"""Checkpoint interop: flat-vector (Torch getParameters layout) roundtrips."""

import jax
import numpy as np
import pytest

from novel_vqa_tpu.core import checkpoint as ckpt
from novel_vqa_tpu.models.vqa import arch1


def small_cfg():
    return arch1.Arch1Config(
        vocab_size=30,
        input_encoding_size=8,
        rnn_size=10,
        rnn_layer=2,
        nhimage=12,
        common_embedding_size=14,
        num_output=7,
    )


def test_arch1_flat_roundtrip():
    cfg = small_cfg()
    params = jax.device_get(arch1.init_params(jax.random.PRNGKey(0), cfg))
    vecs = ckpt.arch1_to_flat(params)
    # sizes match the Torch getParameters totals
    E, V, H, L = cfg.input_encoding_size, cfg.vocab_size, cfg.rnn_size, cfg.rnn_layer
    assert vecs["embedding_w_q"].size == E * V + E
    per_layer = lambda n_in: (4 * H * n_in + 4 * H) + (4 * H * H + 4 * H)
    assert vecs["encoder_w_q"].size == per_layer(E) + per_layer(H)
    back = ckpt.arch1_from_flat(vecs, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_flat_h5_roundtrip(tmp_path):
    cfg = small_cfg()
    params = jax.device_get(arch1.init_params(jax.random.PRNGKey(1), cfg))
    vecs = ckpt.arch1_to_flat(params)
    path = str(tmp_path / "lstm.h5")
    ckpt.save_flat_h5(path, vecs)
    loaded = ckpt.load_flat_h5(path)
    assert set(loaded) == {"encoder_w_q", "embedding_w_q", "multimodal_w"}
    for k in vecs:
        np.testing.assert_array_equal(vecs[k], loaded[k])


def test_npz_roundtrip(tmp_path):
    cfg = small_cfg()
    params = jax.device_get(arch1.init_params(jax.random.PRNGKey(2), cfg))
    path = str(tmp_path / "ckpt.npz")
    ckpt.save_npz(path, params, meta={"cfg": cfg._asdict()})
    flat, meta = ckpt.load_npz(path)
    assert meta["cfg"]["vocab_size"] == 30
    back = ckpt.unflatten_like(params, flat)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ae_transfer_roundtrip(tmp_path):
    rng = jax.random.PRNGKey(3)
    from novel_vqa_tpu.ops import lstm_layer_init

    layers = jax.device_get([lstm_layer_init(rng, 8, 10)])
    lookup = np.random.RandomState(0).randn(31, 8).astype(np.float32)
    path = str(tmp_path / "ae.h5")
    ckpt.ae_transfer_to_h5(path, lookup, layers, multimodal_flat=np.arange(5.0, dtype=np.float32))
    import h5py

    with h5py.File(path) as f:
        # stored transposed like the reference converter (lookup:t())
        assert f["lookup"].shape == (8, 31)
    back = ckpt.ae_transfer_from_h5(path, 8, 10, 1)
    np.testing.assert_allclose(back["lookup"], lookup, rtol=1e-6)
    for k in ("wx", "bx", "wh", "bh"):
        np.testing.assert_allclose(
            back["encoder"][0][k], np.asarray(layers[0][k]), rtol=1e-6
        )
    np.testing.assert_array_equal(back["multimodal"], np.arange(5.0, dtype=np.float32))


def test_orbax_roundtrip(tmp_path):
    """Optional orbax backend (production checkpointing)."""
    pytest.importorskip("orbax.checkpoint")
    from novel_vqa_tpu.core.checkpoint import load_orbax, save_orbax

    cfg = small_cfg()
    params = jax.device_get(arch1.init_params(jax.random.PRNGKey(5), cfg))
    path = str(tmp_path / "orbax_ckpt")
    save_orbax(path, params)
    back = load_orbax(path, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
