"""Resume/warm-restart coverage for the arch2 and weak-paired trainers
(VERDICT round-1 item 8) — mirrors tests/test_resume.py for the state most
likely to be reconstructed wrong: arch2's flat-vector --start_from
(003_train_vqa_arch2/003_train_ae_based_wp_vgg.lua diff :198-204) and the
weak-paired trainer's mid-run state (TWO optimizers + the finetune-gate
phase + the iteration counter; the reference reloads protos wholesale,
004_train_arch1_weakpaired_autoencoder_vgg.lua:121-127).
"""

import json
import os

import h5py
import numpy as np
import pytest


# ------------------------------------------------------------------ arch2


def make_arch2_dataset(tmp_path):
    rs = np.random.RandomState(0)
    V, L, n_ans, n_img = 20, 5, 3, 8
    img_ans = rs.randint(1, n_ans + 1, size=n_img)
    feats = (np.eye(n_ans)[img_ans - 1] @ rs.randn(n_ans, 8)).astype(np.float32)

    def mk(n):
        img_pos = rs.randint(1, n_img + 1, size=n).astype(np.uint32)
        lens = rs.randint(1, L + 1, size=n).astype(np.uint32)
        q = np.zeros((n, L), np.uint32)
        for i, ln in enumerate(lens):
            q[i, :ln] = rs.randint(1, V + 1, size=ln)
        return q, lens, np.arange(1, n + 1, dtype=np.uint32), img_pos, img_ans[img_pos - 1].astype(np.uint32)

    tr, va = mk(60), mk(20)
    ques_h5 = str(tmp_path / "q.h5")
    with h5py.File(ques_h5, "w") as f:
        for name, s in (("train", tr), ("val", va)):
            f.create_dataset(f"ques_{name}", dtype="uint32", data=s[0])
            f.create_dataset(f"ques_length_{name}", dtype="uint32", data=s[1])
            f.create_dataset(f"question_id_{name}", dtype="uint32", data=s[2])
            f.create_dataset(f"img_pos_{name}", dtype="uint32", data=s[3])
        f.create_dataset("answers", dtype="uint32", data=tr[4])
        f.create_dataset("answers_val", dtype="uint32", data=va[4])
    img_h5 = str(tmp_path / "i.h5")
    with h5py.File(img_h5, "w") as f:
        f.create_dataset("images_train", dtype="float32", data=feats)
        f.create_dataset("images_val", dtype="float32", data=feats)
    meta = str(tmp_path / "m.json")
    with open(meta, "w") as f:
        json.dump(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
                "ix_to_ans": {str(i): f"a{i}" for i in range(1, n_ans + 1)},
                "unique_img_train": [], "unique_img_val": [], "unique_img_test": [],
            },
            f,
        )
    return ques_h5, img_h5, meta


ARCH2_DIMS = [
    "--nhimage", "8", "--input_encoding_size", "10", "--rnn_size", "12",
    "--num_output", "3", "--batch_size", "20", "--log_every", "10",
]


def test_arch2_start_from_roundtrip(tmp_path):
    """--start_from reloads the three flat vectors verbatim (wp_vgg diff
    :198-204); with lr 0 the re-saved checkpoint must be identical."""
    from novel_vqa_tpu.core.checkpoint import load_flat_h5
    from novel_vqa_tpu.train import train_vqa_arch2

    ques_h5, img_h5, meta = make_arch2_dataset(tmp_path)
    common = [
        "--input_img_h5", img_h5, "--input_ques_h5", ques_h5,
        "--input_json", meta,
    ] + ARCH2_DIMS

    d1 = str(tmp_path / "m1") + "/"
    train_vqa_arch2.main(
        common + ["--checkpoint_path", d1, "--max_iters", "12",
                  "--save_checkpoint_every", "12"]
    )
    assert os.path.exists(d1 + "lstm.h5")

    d2 = str(tmp_path / "m2") + "/"
    train_vqa_arch2.main(
        common + ["--checkpoint_path", d2, "--max_iters", "1",
                  "--save_checkpoint_every", "5",
                  "--start_from", d1 + "lstm.h5", "--learning_rate", "0"]
    )
    v1 = load_flat_h5(d1 + "lstm.h5")
    v2 = load_flat_h5(d2 + "lstm.h5")
    assert set(v1) == {"cnn_w", "encoder_w_q", "multimodal_w"} == set(v2)
    for k in v1:
        np.testing.assert_allclose(v2[k], v1[k], rtol=1e-6)


# ------------------------------------------------------------- weak-paired


@pytest.fixture(scope="module")
def wp_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wp_resume")
    rs = np.random.RandomState(0)
    V, L = 15, 4
    n_train, n_val, img_side = 24, 8, 40

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
            {"ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
             "num_train": n_train, "num_val": n_val, "num_test": n_val},
            f,
        )
    mean_path = str(tmp / "lstm_mean.h5")
    with h5py.File(mean_path, "w") as f:
        f.create_dataset("mean_vector", data=rs.randn(1, 24).astype(np.float32))
    return {"tmp": tmp, "h5": h5_path, "json": json_path, "mean": mean_path}


WP_DIMS = [
    "--rnn_size", "12", "--input_encoding_size", "16", "--batch_size", "8",
    "--val_sentences_use", "8", "--losses_log_every", "2",
    "--image_size", "40", "--crop_size", "32", "--nhimage", "4096",
    "--variant", "vqa_arch",
]


def test_wp_full_state_resume(wp_files, capsys):
    """Full-state resume restores BOTH optimizer accumulator sets, the
    iteration counter, and (through it) the finetune-gate phase."""
    from novel_vqa_tpu.core.checkpoint import load_npz
    from novel_vqa_tpu.train import train_weakpaired_ae

    d1 = str(wp_files["tmp"] / "r1")
    os.makedirs(d1, exist_ok=True)
    train_weakpaired_ae.main(
        WP_DIMS + [
            "--input_h5", wp_files["h5"], "--input_json", wp_files["json"],
            "--lstm_average_path", wp_files["mean"],
            "--checkpoint_path", d1, "--max_iters", "6",
            "--save_checkpoint_every", "5", "--save_train_state", "1",
            "--finetune_cnn_after", "3", "--cnn_learning_rate", "1e-6",
        ]
    )
    state_path = os.path.join(d1, "train_state.npz")
    assert os.path.exists(state_path)
    flat, meta = load_npz(state_path)
    assert meta["iter"] == 5
    # the sequential-with-wrap batch window position is checkpointed so a
    # resumed run continues mid-epoch (batch order is NOT i.i.d. — it is
    # the reference's DataLoaderWeakPaired window); bs 8 over 24 train rows
    # means a multiple of 8 up to and including 24 (the loader wraps
    # lazily, so position == max is reachable before the next fetch)
    assert "train_it_pos" in meta
    assert int(meta["train_it_pos"]) in (0, 8, 16, 24)
    # both optimizer states persisted with non-trivial accumulators: the AE
    # adam second moments must be nonzero, and the CNN optimizer tree exists
    # (its accumulators are nonzero iff the finetune gate had opened)
    ae_m = [v for k, v in flat.items() if k.startswith("ae_opt/") and "/nu/" in k or
            (k.startswith("ae_opt/") and "/m/" in k)]
    assert ae_m and any(np.abs(v).sum() > 0 for v in ae_m)
    assert any(k.startswith("cnn_opt/") for k in flat)
    cnn_acc = [v for k, v in flat.items() if k.startswith("cnn_opt/") and v.ndim > 0]
    # gate opened at iter 3 and steps 3..5 ran with finetune=True
    assert cnn_acc and any(np.abs(v).sum() > 0 for v in cnn_acc)

    d2 = str(wp_files["tmp"] / "r2")
    os.makedirs(d2, exist_ok=True)
    train_weakpaired_ae.main(
        WP_DIMS + [
            "--input_h5", wp_files["h5"], "--input_json", wp_files["json"],
            "--lstm_average_path", wp_files["mean"],
            "--checkpoint_path", d2, "--max_iters", "8",
            "--save_checkpoint_every", "2",
            "--resume", state_path,
            "--finetune_cnn_after", "3", "--cnn_learning_rate", "1e-6",
        ]
    )
    out = capsys.readouterr().out
    assert "resumed from" in out and "at iteration 6" in out
    # the finetune gate phase was restored: every post-resume step logs
    # finetune=True (iter 6..7 >= gate 3)
    logged = [l for l in out.splitlines() if "finetune=" in l and "iter 6" in l or
              ("finetune=" in l and "iter 7" in l)]
    assert logged and all("finetune=True" in l for l in logged)
    assert os.path.exists(os.path.join(d2, "model_id.npz"))


def test_wp_start_from_warm_restart(wp_files):
    """--start_from reloads BOTH nets from a best checkpoint
    (004_..._vgg.lua:121-127); with tiny lr the warm-started params stay
    close to the loaded ones and far from a fresh init."""
    from novel_vqa_tpu.core.checkpoint import load_npz
    from novel_vqa_tpu.train import train_weakpaired_ae

    src = os.path.join(str(wp_files["tmp"] / "r1"), "model_id.npz")
    assert os.path.exists(src), "run test_wp_full_state_resume first (module order)"

    d2 = str(wp_files["tmp"] / "s2")
    os.makedirs(d2, exist_ok=True)
    train_weakpaired_ae.main(
        WP_DIMS + [
            "--input_h5", wp_files["h5"], "--input_json", wp_files["json"],
            "--lstm_average_path", wp_files["mean"],
            "--checkpoint_path", d2, "--max_iters", "1",
            "--save_checkpoint_every", "1",
            "--start_from", src,
            "--learning_rate", "1e-12", "--cnn_learning_rate", "1e-12",
        ]
    )
    flat_src, _ = load_npz(src)
    flat_new, _ = load_npz(os.path.join(d2, "model_id.npz"))
    # spot-check a few leaves from each net
    keys = [k for k in flat_src if k.startswith("ae/")][:3] + \
           [k for k in flat_src if k.startswith("cnn/")][:3]
    assert keys
    for k in keys:
        np.testing.assert_allclose(flat_new[k], flat_src[k], rtol=1e-3, atol=1e-5)
