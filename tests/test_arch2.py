"""Arch2 VQA tests: model semantics, flat-vector roundtrip, trainer/eval CLIs
on synthetic data, and the late-fusion ensemble path."""

import json
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from novel_vqa_tpu.core import checkpoint as ckpt
from novel_vqa_tpu.models.vqa import arch2


def tiny_cfg():
    return arch2.Arch2Config(
        vocab_size=30,
        input_encoding_size=12,
        rnn_size=16,
        num_layers=1,
        nhimage=8,
        num_output=5,
        seq_length=6,
    )


def test_forward_shapes():
    cfg = tiny_cfg()
    params = arch2.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((4, 6), jnp.int32).at[:, 0].set(3)  # left-aligned
    image = jnp.ones((4, 8), jnp.float32)
    s = arch2.apply(params, cfg, tokens, image, deterministic=True)
    assert s.shape == (4, 5)


def test_image_affects_output():
    """The image enters at encoder t=1, so different images must change
    scores even with identical questions."""
    cfg = tiny_cfg()
    params = arch2.init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((2, 6), jnp.int32).at[:, 0].set(7)
    im1 = jnp.ones((2, 8), jnp.float32)
    im2 = -jnp.ones((2, 8), jnp.float32)
    s1 = arch2.apply(params, cfg, tokens, im1, deterministic=True)
    s2 = arch2.apply(params, cfg, tokens, im2, deterministic=True)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_arch2_flat_roundtrip():
    cfg = tiny_cfg()
    params = jax.device_get(arch2.init_params(jax.random.PRNGKey(1), cfg))
    vecs = ckpt.arch2_to_flat(params)
    assert set(vecs) == {"cnn_w", "encoder_w_q", "multimodal_w"}
    back = ckpt.arch2_from_flat(vecs, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.fixture(scope="module")
def vqa_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("arch2")
    rs = np.random.RandomState(0)
    V, L, n_ans, n_img = 30, 6, 5, 12
    img_ans = rs.randint(1, n_ans + 1, size=n_img)
    feats = (np.eye(n_ans)[img_ans - 1] @ rs.randn(n_ans, 8)).astype(np.float32)

    def mk(n, qid0=0):
        img_pos = rs.randint(1, n_img + 1, size=n).astype(np.uint32)
        lens = rs.randint(1, L + 1, size=n).astype(np.uint32)
        q = np.zeros((n, L), np.uint32)
        for i, ln in enumerate(lens):
            q[i, :ln] = rs.randint(1, V + 1, size=ln)
        return q, lens, np.arange(qid0 + 1, qid0 + n + 1, dtype=np.uint32), img_pos, img_ans[img_pos - 1].astype(np.uint32)

    tr, va, te = mk(200), mk(40), mk(40, 500)
    mc = np.zeros((40, 18), np.uint32)
    mc[:, 0] = te[4]
    mc[:, 1] = (te[4] % n_ans) + 1
    ques_h5 = str(tmp / "data_prepro.h5")
    with h5py.File(ques_h5, "w") as f:
        for name, s in (("train", tr), ("val", va), ("test", te)):
            f.create_dataset(f"ques_{name}", dtype="uint32", data=s[0])
            f.create_dataset(f"ques_length_{name}", dtype="uint32", data=s[1])
            f.create_dataset(f"question_id_{name}", dtype="uint32", data=s[2])
            f.create_dataset(f"img_pos_{name}", dtype="uint32", data=s[3])
        f.create_dataset("answers", dtype="uint32", data=tr[4])
        f.create_dataset("answers_val", dtype="uint32", data=va[4])
        f.create_dataset("MC_ans_test", dtype="uint32", data=mc)
    img_h5 = str(tmp / "data_img.h5")
    with h5py.File(img_h5, "w") as f:
        for s in ("train", "val", "test"):
            f.create_dataset(f"images_{s}", dtype="float32", data=feats)
    meta = str(tmp / "data_prepro.json")
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
    return {"tmp": tmp, "ques_h5": ques_h5, "img_h5": img_h5, "meta": meta}


def test_arch2_train_eval_cli(vqa_files):
    from novel_vqa_tpu.train import train_vqa_arch2, eval_vqa_arch2

    d = vqa_files
    ckpt_dir = str(d["tmp"] / "model") + "/"
    train_vqa_arch2.main(
        [
            "--input_img_h5", d["img_h5"],
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta"],
            "--checkpoint_path", ckpt_dir,
            "--batch_size", "50",
            "--max_iters", "60",
            "--save_checkpoint_every", "60",
            "--learning_rate", "3e-3",
            "--nhimage", "8",
            "--input_encoding_size", "12",
            "--rnn_size", "16",
            "--num_output", "5",
            "--log_every", "20",
        ]
    )
    assert os.path.exists(ckpt_dir + "lstm.h5")
    with h5py.File(ckpt_dir + "lstm.h5") as f:
        assert set(f.keys()) == {"cnn_w", "encoder_w_q", "multimodal_w"}

    out_dir = str(d["tmp"] / "result") + "/"
    eval_vqa_arch2.main(
        [
            "--input_img_h5", d["img_h5"],
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta"],
            "--model_path", ckpt_dir + "lstm.h5",
            "--batch_size", "50",
            "--nhimage", "8",
            "--input_encoding_size", "12",
            "--rnn_size", "16",
            "--num_output", "5",
            "--out_path", out_dir,
        ]
    )
    oe = json.load(open(out_dir + "OpenEnded_mscoco_val2014_lstm_novel_new_2_results.json"))
    assert len(oe) == 40
    assert {"question_id", "answer"} <= set(oe[0])


def test_lf_ensemble(vqa_files, tmp_path):
    """compute scores with two arch1 models, then weighted-sum eval."""
    from novel_vqa_tpu.core.checkpoint import arch1_to_flat, save_flat_h5
    from novel_vqa_tpu.models.vqa import arch1
    from novel_vqa_tpu.train import lf_ensemble

    d = vqa_files
    cfg = arch1.Arch1Config(
        vocab_size=30, input_encoding_size=12, rnn_size=16, rnn_layer=1,
        nhimage=8, common_embedding_size=16, num_output=5,
    )
    m1 = str(tmp_path / "m1.h5")
    m2 = str(tmp_path / "m2.h5")
    save_flat_h5(m1, arch1_to_flat(jax.device_get(arch1.init_params(jax.random.PRNGKey(0), cfg))))
    save_flat_h5(m2, arch1_to_flat(jax.device_get(arch1.init_params(jax.random.PRNGKey(1), cfg))))

    out_h5 = str(tmp_path / "outputVectors.h5")
    common = [
        "--input_img_h5", d["img_h5"],
        "--input_ques_h5", d["ques_h5"],
        "--input_json", d["meta"],
        "--out_h5", out_h5,
        "--splits", "test",
        "--batch_size", "50",
        "--input_encoding_size", "12",
        "--rnn_size", "16",
        "--rnn_layer", "1",
        "--nhimage", "8",
        "--common_embedding_size", "16",
        "--num_output", "5",
    ]
    lf_ensemble.cli(["compute", "--model_path", m1, "--prefix", "VGG"] + common)
    lf_ensemble.cli(["compute", "--model_path", m2, "--prefix", "Inception"] + common)
    with h5py.File(out_h5) as f:
        assert f["VGGOutTest"].shape == (40, 5)
        assert f["InceptionOutTest"].shape == (40, 5)
        vgg = f["VGGOutTest"][()]
        inc = f["InceptionOutTest"][()]

    # the streaming (--hbm_resident 0) and DP (--data_parallel 1) data-
    # movement modes of the shared driver must reproduce the default
    # whole-split-scan scores (run_full_split's three branches)
    # (DP batch must divide the 8-device CPU mesh: 40, not 50; argparse
    # keeps the last --batch_size occurrence)
    for tag, extra in (("stream", ["--hbm_resident", "0"]),
                       ("dp", ["--data_parallel", "1", "--batch_size", "40"])):
        alt_h5 = str(tmp_path / f"outputVectors_{tag}.h5")
        alt = [a if a != out_h5 else alt_h5 for a in common]
        lf_ensemble.cli(["compute", "--model_path", m1, "--prefix", "VGG"]
                        + alt + extra)
        with h5py.File(alt_h5) as f:
            np.testing.assert_allclose(f["VGGOutTest"][()], vgg,
                                       rtol=1e-5, atol=1e-5)

    out_dir = str(tmp_path / "lf") + "/"
    lf_ensemble.cli(
        [
            "eval",
            "--scores_h5", out_h5,
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta"],
            "--weight_vgg", "0.7",
            "--weight_inception", "0.3",
            "--out_path", out_dir,
        ]
    )
    oe = json.load(open(out_dir + "OpenEnded_mscoco_lstm_results.json"))
    assert len(oe) == 40
    # verify the weighting math
    fused = 0.7 * vgg + 0.3 * inc
    with h5py.File(d["ques_h5"]) as f:
        qids = f["question_id_test"][()]
    meta = json.load(open(d["meta"]))
    expect = meta["ix_to_ans"][str(int(fused[0].argmax() + 1))]
    assert oe[0]["answer"] == expect and oe[0]["question_id"] == int(qids[0])


def test_arch2_cli_steps_per_dispatch(vqa_files, tmp_path):
    from novel_vqa_tpu.train import train_vqa_arch2

    d = vqa_files
    ckpt_dir = str(tmp_path / "scan_model") + "/"
    train_vqa_arch2.main(
        [
            "--input_img_h5", d["img_h5"],
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta"],
            "--checkpoint_path", ckpt_dir,
            "--batch_size", "25",
            "--max_iters", "30",
            "--save_checkpoint_every", "30",
            "--steps_per_dispatch", "10",
            "--nhimage", "8",
            "--input_encoding_size", "12",
            "--rnn_size", "16",
            "--num_output", "5",
            "--log_every", "10",
        ]
    )
    assert os.path.exists(ckpt_dir + "lstm.h5")

def test_arch2_cli_data_parallel(vqa_files, tmp_path):
    """--data_parallel wiring: per-step DP (dp indexed step) and the DP
    multi-step scan, on the virtual 8-device mesh."""
    from novel_vqa_tpu.train import train_vqa_arch2

    d = vqa_files
    common = [
        "--input_img_h5", d["img_h5"],
        "--input_ques_h5", d["ques_h5"],
        "--input_json", d["meta"],
        "--batch_size", "16",
        "--save_checkpoint_every", "20",
        "--nhimage", "8",
        "--input_encoding_size", "12",
        "--rnn_size", "16",
        "--num_output", "5",
        "--log_every", "10",
        "--data_parallel", "1",
    ]
    ckpt1 = str(tmp_path / "dp_step") + "/"
    train_vqa_arch2.main(
        common + ["--checkpoint_path", ckpt1, "--max_iters", "6"]
    )
    assert os.path.exists(ckpt1 + "lstm.h5")
    ckpt2 = str(tmp_path / "dp_scan") + "/"
    train_vqa_arch2.main(
        common + [
            "--checkpoint_path", ckpt2,
            "--max_iters", "13",  # 2 full chunks + a shorter tail chunk
            "--steps_per_dispatch", "5",
        ]
    )
    assert os.path.exists(ckpt2 + "lstm.h5")
