"""Checkpoint/resume of the arch1 trainer: --start_from (params-only warm
restart) and --resume (full train state incl. optimizer and iteration)."""

import json
import os

import h5py
import numpy as np


def make_dataset(tmp_path):
    rs = np.random.RandomState(0)
    n, n_img, V, L, n_ans = 80, 6, 15, 4, 3
    img_ans = rs.randint(1, n_ans + 1, size=n_img)
    feats = (np.eye(n_ans)[img_ans - 1] @ rs.randn(n_ans, 8)).astype(np.float32)

    def mk(nn):
        img_pos = rs.randint(1, n_img + 1, size=nn).astype(np.uint32)
        lens = rs.randint(1, L + 1, size=nn).astype(np.uint32)
        q = np.zeros((nn, L), np.uint32)
        for i, ln in enumerate(lens):
            q[i, :ln] = rs.randint(1, V + 1, size=ln)
        return q, lens, np.arange(1, nn + 1, dtype=np.uint32), img_pos, img_ans[img_pos - 1].astype(np.uint32)

    tr, va = mk(n), mk(20)
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


COMMON_DIMS = [
    "--nhimage", "8", "--input_encoding_size", "8", "--rnn_size", "10",
    "--rnn_layer", "1", "--common_embedding_size", "8", "--num_output", "3",
    "--batch_size", "20", "--log_every", "10",
]


def test_start_from_and_resume(tmp_path):
    from novel_vqa_tpu.core.checkpoint import load_flat_h5, load_npz
    from novel_vqa_tpu.train import train_vqa_arch1

    ques_h5, img_h5, meta = make_dataset(tmp_path)
    common = [
        "--input_img_h5", img_h5, "--input_ques_h5", ques_h5,
        "--input_json", meta,
    ] + COMMON_DIMS

    d1 = str(tmp_path / "m1") + "/"
    train_vqa_arch1.main(
        common + ["--checkpoint_path", d1, "--max_iters", "15",
                  "--save_checkpoint_every", "15", "--save_train_state", "1"]
    )
    assert os.path.exists(d1 + "train_state.npz")

    # params-only warm restart loads the saved flat vectors verbatim
    d2 = str(tmp_path / "m2") + "/"
    train_vqa_arch1.main(
        common + ["--checkpoint_path", d2, "--max_iters", "1",
                  "--save_checkpoint_every", "5",
                  "--start_from", d1 + "lstm.h5", "--learning_rate", "0"]
    )
    v1 = load_flat_h5(d1 + "lstm.h5")
    v2 = load_flat_h5(d2 + "lstm.h5")
    for k in v1:
        np.testing.assert_allclose(v2[k], v1[k], rtol=1e-6)

    # full-state resume continues from the recorded iteration
    d3 = str(tmp_path / "m3") + "/"
    train_vqa_arch1.main(
        common + ["--checkpoint_path", d3, "--max_iters", "25",
                  "--save_checkpoint_every", "25",
                  "--resume", d1 + "train_state.npz"]
    )
    assert os.path.exists(d3 + "lstm.h5")
    # the resumed run restored the optimizer state: rmsprop second-moment
    # accumulators are nonzero from the start
    flat, meta_d = load_npz(d1 + "train_state.npz")
    assert meta_d["iter"] == 15
    m_leaves = [v for k, v in flat.items() if k.startswith("opt_state/") and "/m/" in k]
    assert m_leaves and any(np.abs(v).sum() > 0 for v in m_leaves)
