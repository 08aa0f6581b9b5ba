"""Integration: AE training CLI -> conversion -> AE-initialized VQA trainer
(the stage-001 -> stage-002 transfer path, BASELINE configs[2,3])."""

import json
import os

import h5py
import numpy as np
import pytest

V = 25  # shared question/corpus vocab
L = 5


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("corpus")
    rs = np.random.RandomState(0)
    n_train, n_val = 300, 60

    def split(n):
        lengths = rs.randint(1, L + 1, size=n)
        labels = np.zeros((n, L), np.uint32)
        for i, ln in enumerate(lengths):
            labels[i, :ln] = rs.randint(1, V + 1, size=ln)
        return labels

    h5_path = str(tmp / "data.h5")
    with h5py.File(h5_path, "w") as f:
        # schema of 000_prepro_book_corpus.py:343-356
        f.create_dataset("labels/train", dtype="uint32", data=split(n_train))
        f.create_dataset("labels/val", dtype="uint32", data=split(n_val))
        f.create_dataset("labels/test", dtype="uint32", data=split(n_val))
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
    return {"tmp": tmp, "h5": h5_path, "json": json_path}


@pytest.mark.parametrize("variant", ["text_nostart", "arch2"])
def test_train_ae_cli(corpus, variant):
    from novel_vqa_tpu.train import train_text_ae

    ckpt = str(corpus["tmp"] / f"ae_{variant}")
    os.makedirs(ckpt, exist_ok=True)
    train_text_ae.main(
        [
            "--input_h5", corpus["h5"],
            "--input_json", corpus["json"],
            "--variant", variant,
            "--rnn_size", "16",
            "--input_encoding_size", "12",
            "--batch_size", "30",
            "--max_iters", "60",
            "--save_checkpoint_every", "50",
            "--learning_rate", "1e-3",
            "--val_sentences_use", "60",
            "--losses_log_every", "20",
            "--checkpoint_path", ckpt,
            "--sample_print", "2",
        ]
    )
    assert os.path.exists(os.path.join(ckpt, "model_id.npz"))
    assert os.path.exists(os.path.join(ckpt, "model_id.json"))


def test_convert_and_vqa_init(corpus, tmp_path):
    """Convert the trained text AE and initialize an arch1 VQA model from it
    (003_train_ae_based.lua path: 1-layer, embed = rnn of AE)."""
    from novel_vqa_tpu.train import convert_ae, train_vqa_arch1

    ckpt = str(corpus["tmp"] / "ae_text_nostart" / "model_id.npz")
    assert os.path.exists(ckpt), "run test_train_ae_cli first (module-scoped)"
    conv = str(tmp_path / "converted.h5")
    convert_ae.main(["--ae_model", ckpt, "--out", conv])
    assert os.path.exists(conv)

    # tiny VQA dataset with the SAME vocab (oracle-vocab flow)
    rs = np.random.RandomState(1)
    n, n_img, n_ans = 120, 10, 4
    img_ans = rs.randint(1, n_ans + 1, size=n_img)
    feats = np.eye(n_ans)[img_ans - 1] @ rs.randn(n_ans, 8)
    ques_h5 = str(tmp_path / "data_prepro.h5")

    def mk(nn):
        img_pos = rs.randint(1, n_img + 1, size=nn).astype(np.uint32)
        lens = rs.randint(1, L + 1, size=nn).astype(np.uint32)
        q = np.zeros((nn, L), np.uint32)
        for i, ln in enumerate(lens):
            q[i, :ln] = rs.randint(1, V + 1, size=ln)
        return q, lens, np.arange(1, nn + 1, dtype=np.uint32), img_pos, img_ans[
            img_pos - 1
        ].astype(np.uint32)

    tr, va = mk(n), mk(40)
    with h5py.File(ques_h5, "w") as f:
        for name, s in (("train", tr), ("val", va)):
            f.create_dataset(f"ques_{name}", dtype="uint32", data=s[0])
            f.create_dataset(f"ques_length_{name}", dtype="uint32", data=s[1])
            f.create_dataset(f"question_id_{name}", dtype="uint32", data=s[2])
            f.create_dataset(f"img_pos_{name}", dtype="uint32", data=s[3])
        f.create_dataset("answers", dtype="uint32", data=tr[4])
        f.create_dataset("answers_val", dtype="uint32", data=va[4])
    img_h5 = str(tmp_path / "data_img.h5")
    with h5py.File(img_h5, "w") as f:
        f.create_dataset("images_train", dtype="float32", data=feats)
        f.create_dataset("images_val", dtype="float32", data=feats)
    meta = str(tmp_path / "data_prepro.json")
    with open(meta, "w") as f:
        json.dump(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
                "ix_to_ans": {str(i): f"a{i}" for i in range(1, n_ans + 1)},
                "unique_img_train": [],
                "unique_img_val": [],
                "unique_img_test": [],
            },
            f,
        )

    ckpt_dir = str(tmp_path / "vqa") + "/"
    train_vqa_arch1.main(
        [
            "--input_img_h5", img_h5,
            "--input_ques_h5", ques_h5,
            "--input_json", meta,
            "--checkpoint_path", ckpt_dir,
            "--init_from", conv,
            "--rnn_layer", "1",
            "--input_encoding_size", "12",  # must equal the AE embedding size
            "--rnn_size", "16",  # must equal the AE rnn size
            "--nhimage", "8",
            "--common_embedding_size", "16",
            "--num_output", "4",
            "--batch_size", "32",
            "--max_iters", "30",
            "--save_checkpoint_every", "30",
            "--log_every", "10",
        ]
    )
    assert os.path.exists(ckpt_dir + "lstm.h5")

    # verify the AE weights actually landed in the model: embedding == lookup
    # minus its last row, zero bias (003_train_ae_based.lua:177-183)
    from novel_vqa_tpu.core.checkpoint import load_npz
    from novel_vqa_tpu.models.vqa import arch1
    from novel_vqa_tpu.train.train_vqa_arch1 import TrainConfig, build_params

    flat, _ = load_npz(ckpt)
    opt = TrainConfig(
        init_from=conv, rnn_layer=1, input_encoding_size=12, rnn_size=16,
        nhimage=8, common_embedding_size=16, num_output=4,
    )
    cfg = arch1.Arch1Config(
        vocab_size=V, input_encoding_size=12, rnn_size=16, rnn_layer=1,
        nhimage=8, common_embedding_size=16, num_output=4,
    )
    params = build_params(opt, cfg)
    np.testing.assert_allclose(
        np.asarray(params["embedding"]["w"]), flat["lookup"][:-1], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["encoder"][0]["wx"]), flat["encoder/0/wx"], rtol=1e-6
    )
    assert float(np.abs(np.asarray(params["embedding"]["b"])).sum()) == 0.0
