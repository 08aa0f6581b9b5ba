"""Weak-paired AE trainer tests: loader with images, device prepro crop math,
and both trainer variants (vqa_arch w/ encoder-skip, null w/ zeroing) running
end-to-end with a small VGG trunk, plus the finetune gate."""

import json
import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from novel_vqa_tpu.data.weakpaired import (
    WeakPairedLoader,
    center_crop_offsets,
    prepro_wp_images,
    random_crop_offsets,
)

V, L = 20, 5


@pytest.fixture(scope="module")
def wp_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wp")
    rs = np.random.RandomState(0)
    n_train, n_val, img_side = 40, 10, 40

    def split(n):
        lengths = rs.randint(1, L + 1, size=n)
        labels = np.zeros((n, L), np.uint32)
        for i, ln in enumerate(lengths):
            labels[i, :ln] = rs.randint(1, V + 1, size=ln)
        imgs = rs.randint(0, 255, size=(n, 3, img_side, img_side), dtype=np.uint8)
        return labels, imgs

    h5_path = str(tmp / "data.h5")
    with h5py.File(h5_path, "w") as f:
        for name, n in (("train", n_train), ("val", n_val), ("test", n_val)):
            labels, imgs = split(n)
            f.create_dataset(f"labels/{name}", dtype="uint32", data=labels)
            f.create_dataset(f"images/{name}", dtype="uint8", data=imgs)
    json_path = str(tmp / "data.json")
    with open(json_path, "w") as f:
        json.dump(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
                "num_train": n_train,
                "num_val": n_val,
                "num_test": n_val,
            },
            f,
        )
    # mean LSTM vector h5 (2 * rnn_size = 2 * 12)
    mean_path = str(tmp / "lstm_mean.h5")
    with h5py.File(mean_path, "w") as f:
        f.create_dataset("mean_vector", data=rs.randn(1, 24).astype(np.float32))
    return {"tmp": tmp, "h5": h5_path, "json": json_path, "mean": mean_path}


def test_loader_images_nhwc(wp_files):
    loader = WeakPairedLoader(wp_files["h5"], wp_files["json"])
    labels, imgs, bounds = loader.get_batch_with_images("train", 8)
    assert labels.shape == (L, 8)
    assert imgs.shape == (8, 40, 40, 3) and imgs.dtype == np.uint8
    loader.close()


def test_prepro_crop_math():
    u8 = np.zeros((2, 8, 8, 3), np.uint8)
    u8[0, 2, 3] = [200, 150, 100]
    offsets = np.asarray([[2, 3], [0, 0]], np.int32)
    out = np.asarray(prepro_wp_images(jnp.asarray(u8), jnp.asarray(offsets), 4))
    assert out.shape == (2, 4, 4, 3)
    # pixel (2,3) lands at (0,0) of the crop; RGB mean subtracted in RGB order
    np.testing.assert_allclose(out[0, 0, 0], [200 - 123.68, 150 - 116.779, 100 - 103.939], rtol=1e-5)

    off = center_crop_offsets(3, 256, 224)
    assert (off == 16).all()
    rng = np.random.default_rng(0)
    off = random_crop_offsets(rng, 100, 256, 224)
    assert off.min() >= 0 and off.max() <= 32


@pytest.mark.parametrize("variant", ["vqa_arch", "null"])
def test_wp_trainer_runs(wp_files, variant):
    from novel_vqa_tpu.train import train_weakpaired_ae

    ckpt = str(wp_files["tmp"] / f"wp_{variant}")
    os.makedirs(ckpt, exist_ok=True)
    args = [
        "--input_h5", wp_files["h5"],
        "--input_json", wp_files["json"],
        "--variant", variant,
        "--rnn_size", "12",
        "--input_encoding_size", "16",
        "--batch_size", "8",
        "--max_iters", "6",
        "--save_checkpoint_every", "5",
        "--val_sentences_use", "10",
        "--losses_log_every", "2",
        "--checkpoint_path", ckpt,
        "--image_size", "40",
        "--crop_size", "32",
        "--nhimage", "4096",
        "--finetune_cnn_after", "3",  # exercise the gate flip mid-run
        "--cnn_learning_rate", "1e-6",
    ]
    if variant == "vqa_arch":
        args += ["--lstm_average_path", wp_files["mean"]]
    train_weakpaired_ae.main(args)
    assert os.path.exists(os.path.join(ckpt, "model_id.npz"))

    # the wp checkpoint converts to the VQA transfer h5 (005_convert path)
    from novel_vqa_tpu.train import convert_ae

    out = os.path.join(ckpt, "converted.h5")
    conv_args = ["--ae_model", os.path.join(ckpt, "model_id.npz"), "--out", out]
    if variant == "vqa_arch":
        conv_args += ["--include_multimodal", "1"]
    convert_ae.main(conv_args)
    with h5py.File(out) as f:
        assert "lookup" in f and "encoder" in f
        if variant == "vqa_arch":
            assert "multimodal" in f


@pytest.mark.slow
def test_wp_trainer_inception(tmp_path):
    """arch2-null weak-paired with the Inception trunk (2048-d pool,
    004_train_arch2_weakpaired_autoencoder_inc.lua)."""
    import h5py as _h5py

    from novel_vqa_tpu.train import train_weakpaired_ae

    rs = np.random.RandomState(0)
    V_, L_, n_train, n_val, side = 15, 4, 12, 6, 112

    def split(n):
        lengths = rs.randint(1, L_ + 1, size=n)
        labels = np.zeros((n, L_), np.uint32)
        for i, ln in enumerate(lengths):
            labels[i, :ln] = rs.randint(1, V_ + 1, size=ln)
        imgs = rs.randint(0, 255, size=(n, 3, side, side), dtype=np.uint8)
        return labels, imgs

    with _h5py.File(tmp_path / "data.h5", "w") as f:
        for name, n in (("train", n_train), ("val", n_val), ("test", n_val)):
            lab, im = split(n)
            f.create_dataset(f"labels/{name}", dtype="uint32", data=lab)
            f.create_dataset(f"images/{name}", dtype="uint8", data=im)
    import json as _json

    (tmp_path / "data.json").write_text(
        _json.dumps(
            {"ix_to_word": {str(i): f"w{i}" for i in range(1, V_ + 1)},
             "num_train": n_train, "num_val": n_val, "num_test": n_val}
        )
    )
    ckpt = str(tmp_path / "wp_inc")
    os.makedirs(ckpt, exist_ok=True)
    train_weakpaired_ae.main(
        [
            "--input_h5", str(tmp_path / "data.h5"),
            "--input_json", str(tmp_path / "data.json"),
            "--variant", "null", "--cnn_arch", "inception",
            "--rnn_size", "10", "--input_encoding_size", "12",
            "--batch_size", "4", "--max_iters", "2",
            "--save_checkpoint_every", "1", "--val_sentences_use", "4",
            "--losses_log_every", "1",
            "--image_size", str(side), "--crop_size", "96",
            "--nhimage", "2048", "--checkpoint_path", ckpt,
        ]
    )
    assert os.path.exists(os.path.join(ckpt, "model_id.npz"))


@pytest.mark.slow
def test_wp_trainer_cli_data_parallel(wp_files):
    """--data_parallel wiring through the CLI: the joint CNN+AE step runs
    batch-sharded on the virtual 8-device mesh, through the finetune gate."""
    from novel_vqa_tpu.train import train_weakpaired_ae

    ckpt = str(wp_files["tmp"] / "wp_dp")
    os.makedirs(ckpt, exist_ok=True)
    train_weakpaired_ae.main(
        [
            "--input_h5", wp_files["h5"],
            "--input_json", wp_files["json"],
            "--variant", "vqa_arch",
            "--rnn_size", "12",
            "--input_encoding_size", "16",
            "--batch_size", "8",
            "--max_iters", "4",
            "--save_checkpoint_every", "3",
            "--val_sentences_use", "10",
            "--losses_log_every", "2",
            "--checkpoint_path", ckpt,
            "--image_size", "40",
            "--crop_size", "32",
            "--nhimage", "4096",
            "--finetune_cnn_after", "2",
            "--cnn_learning_rate", "1e-6",
            "--lstm_average_path", wp_files["mean"],
            "--data_parallel", "1",
        ]
    )
    assert os.path.exists(os.path.join(ckpt, "model_id.npz"))


def test_wp_trainer_bf16_cnn_storage(wp_files):
    """--compute_dtype bfloat16: bf16 storage for the CNN trunk inside the
    jitted step, f32 master weights + optimizer states + AE side.  The
    trainer must run through both finetune-gate phases, the checkpoint must
    stay f32, and the CNN must actually update in the finetune phase."""
    from novel_vqa_tpu.core.checkpoint import load_npz
    from novel_vqa_tpu.train import train_weakpaired_ae

    ckpt = str(wp_files["tmp"] / "wp_bf16")
    os.makedirs(ckpt, exist_ok=True)
    train_weakpaired_ae.main([
        "--input_h5", wp_files["h5"],
        "--input_json", wp_files["json"],
        "--variant", "vqa_arch",
        "--rnn_size", "12",
        "--input_encoding_size", "16",
        "--batch_size", "8",
        "--max_iters", "5",
        "--save_checkpoint_every", "4",
        "--val_sentences_use", "10",
        "--losses_log_every", "2",
        "--checkpoint_path", ckpt,
        "--image_size", "40",
        "--crop_size", "32",
        "--nhimage", "4096",
        "--finetune_cnn_after", "2",
        "--cnn_learning_rate", "1e-3",
        "--lstm_average_path", wp_files["mean"],
        "--compute_dtype", "bfloat16",
    ])
    flat, _ = load_npz(os.path.join(ckpt, "model_id.npz"))
    cnn_leaves = {k: v for k, v in flat.items() if k.startswith("cnn/")}
    assert cnn_leaves
    # master weights stay f32 despite the in-step bf16 cast
    assert all(v.dtype == np.float32 for v in cnn_leaves.values())

    # the finetune-phase CNN update actually moved the trunk: retrain with
    # the gate closed and compare a first-conv leaf
    ckpt2 = str(wp_files["tmp"] / "wp_bf16_nofinetune")
    os.makedirs(ckpt2, exist_ok=True)
    train_weakpaired_ae.main([
        "--input_h5", wp_files["h5"],
        "--input_json", wp_files["json"],
        "--variant", "vqa_arch",
        "--rnn_size", "12",
        "--input_encoding_size", "16",
        "--batch_size", "8",
        "--max_iters", "5",
        "--save_checkpoint_every", "4",
        "--val_sentences_use", "10",
        "--losses_log_every", "2",
        "--checkpoint_path", ckpt2,
        "--image_size", "40",
        "--crop_size", "32",
        "--nhimage", "4096",
        "--finetune_cnn_after", "-1",  # never finetune
        "--cnn_learning_rate", "1e-3",
        "--lstm_average_path", wp_files["mean"],
        "--compute_dtype", "bfloat16",
    ])
    flat2, _ = load_npz(os.path.join(ckpt2, "model_id.npz"))
    key = sorted(cnn_leaves)[0]
    assert np.abs(flat[key] - flat2[key]).sum() > 0


def test_wp_remat_matches_plain_step():
    """--remat rematerializes the CNN forward in the finetune backward
    (jax.checkpoint) — pure memory/FLOP trade, identical updates."""
    import jax

    from novel_vqa_tpu.models.seq import autoencoder as ae
    from novel_vqa_tpu.train.train_weakpaired_ae import (
        WPTrainConfig, build_cnn, make_ae_tx, make_cnn_tx, make_train_step,
    )

    rs = np.random.RandomState(0)
    batch = 4
    opt = WPTrainConfig(batch_size=batch, crop_size=32, image_size=40,
                        variant="vqa_arch", rnn_size=12, input_encoding_size=16)
    cfg = ae.AEConfig(
        vocab_size=V, input_encoding_size=16, rnn_size=12, num_layers=1,
        seq_length=L, variant="vqa_arch", nhimage=4096,
    )
    rng0 = jnp.asarray(np.asarray([0, 123], np.uint32))
    ae_params = ae.init_params(rng0, cfg)
    cnn_params, cnn_apply, _ = build_cnn(opt, False, rng0)
    ae_tx, cnn_tx = make_ae_tx(opt), make_cnn_tx(opt)
    ae_opt, cnn_opt = ae_tx.init(ae_params), cnn_tx.init(cnn_params)

    images = jnp.asarray(rs.randint(0, 256, size=(batch, 40, 40, 3), dtype=np.uint8))
    offsets = jnp.asarray(rs.randint(0, 9, size=(batch, 2)), jnp.int32)
    seq = jnp.asarray(rs.randint(1, V + 1, size=(L, batch)), jnp.int32)
    sent = jnp.zeros((batch, 2 * cfg.rnn_size), jnp.float32)
    key = jnp.asarray(np.asarray([0, 7], np.uint32))

    outs = []
    for remat in (False, True):
        step = make_train_step(cfg, "vqa_arch", 32, cnn_apply, ae_tx, cnn_tx,
                               remat=remat)
        outs.append(step(False, True, ae_params, ae_opt, cnn_params, cnn_opt,
                         images, offsets, seq, sent, None, key))
    np.testing.assert_allclose(float(outs[0][4]), float(outs[1][4]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][2]),
                    jax.tree_util.tree_leaves(outs[1][2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
