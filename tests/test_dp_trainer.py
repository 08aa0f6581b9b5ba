"""--data_parallel trainer path on the 8-device CPU mesh."""

import json
import os

import h5py
import numpy as np


def test_arch1_cli_data_parallel(tmp_path):
    from novel_vqa_tpu.train import train_vqa_arch1

    rs = np.random.RandomState(0)
    n, n_img, V, L, n_ans = 120, 8, 20, 5, 4
    img_ans = rs.randint(1, n_ans + 1, size=n_img)
    feats = (np.eye(n_ans)[img_ans - 1] @ rs.randn(n_ans, 8)).astype(np.float32)

    def mk(nn):
        img_pos = rs.randint(1, n_img + 1, size=nn).astype(np.uint32)
        lens = rs.randint(1, L + 1, size=nn).astype(np.uint32)
        q = np.zeros((nn, L), np.uint32)
        for i, ln in enumerate(lens):
            q[i, :ln] = rs.randint(1, V + 1, size=ln)
        return q, lens, np.arange(1, nn + 1, dtype=np.uint32), img_pos, img_ans[img_pos - 1].astype(np.uint32)

    tr, va = mk(n), mk(24)
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

    ckpt = str(tmp_path / "m") + "/"
    train_vqa_arch1.main(
        [
            "--input_img_h5", img_h5,
            "--input_ques_h5", ques_h5,
            "--input_json", meta,
            "--checkpoint_path", ckpt,
            "--batch_size", "32",  # divisible by the 8 CPU devices
            "--max_iters", "20",
            "--save_checkpoint_every", "20",
            "--data_parallel", "1",
            "--nhimage", "8",
            "--input_encoding_size", "8",
            "--rnn_size", "12",
            "--rnn_layer", "1",
            "--common_embedding_size", "8",
            "--num_output", str(n_ans),
            "--log_every", "10",
        ]
    )
    assert os.path.exists(ckpt + "lstm.h5")


def test_eval_cli_data_parallel_matches_single_device(tmp_path):
    """eval_vqa_arch1 --data_parallel 1 must emit byte-identical result JSONs
    to the single-device run (VERDICT round-3 item 5: DP-complete inference)."""
    import jax

    from novel_vqa_tpu.core.checkpoint import arch1_to_flat, save_flat_h5
    from novel_vqa_tpu.models.vqa import arch1
    from novel_vqa_tpu.train import eval_vqa_arch1

    rs = np.random.RandomState(3)
    n, n_img, V, L, n_ans = 50, 6, 20, 5, 4
    ques_h5 = str(tmp_path / "q.h5")
    lens = rs.randint(1, L + 1, size=n).astype(np.uint32)
    q = np.zeros((n, L), np.uint32)
    for i, ln in enumerate(lens):
        q[i, :ln] = rs.randint(1, V + 1, size=ln)
    mc = np.zeros((n, 18), np.uint32)
    mc[:, :3] = rs.randint(1, n_ans + 1, size=(n, 3))
    with h5py.File(ques_h5, "w") as f:
        f.create_dataset("ques_test", dtype="uint32", data=q)
        f.create_dataset("ques_length_test", dtype="uint32", data=lens)
        f.create_dataset("question_id_test", dtype="uint32",
                         data=np.arange(1, n + 1, dtype=np.uint32))
        f.create_dataset("img_pos_test", dtype="uint32",
                         data=rs.randint(1, n_img + 1, size=n).astype(np.uint32))
        f.create_dataset("MC_ans_test", dtype="uint32", data=mc)
    img_h5 = str(tmp_path / "i.h5")
    with h5py.File(img_h5, "w") as f:
        f.create_dataset("images_test", dtype="float32",
                         data=rs.randn(n_img, 8).astype(np.float32))
    meta = str(tmp_path / "m.json")
    with open(meta, "w") as f:
        json.dump(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, V + 1)},
                "ix_to_ans": {str(i): f"a{i}" for i in range(1, n_ans + 1)},
            },
            f,
        )

    cfg = arch1.Arch1Config(
        vocab_size=V, input_encoding_size=8, rnn_size=12, rnn_layer=1,
        nhimage=8, common_embedding_size=8, num_output=n_ans,
    )
    model_h5 = str(tmp_path / "lstm.h5")
    save_flat_h5(model_h5, arch1_to_flat(
        jax.device_get(arch1.init_params(jax.random.PRNGKey(0), cfg))
    ))

    common = [
        "--input_img_h5", img_h5, "--input_ques_h5", ques_h5,
        "--input_json", meta, "--model_path", model_h5,
        "--batch_size", "16",  # divisible by the 8 CPU devices
        "--nhimage", "8", "--input_encoding_size", "8", "--rnn_size", "12",
        "--rnn_layer", "1", "--common_embedding_size", "8",
        "--num_output", str(n_ans),
    ]
    out1 = str(tmp_path / "r1") + "/"
    out2 = str(tmp_path / "r2") + "/"
    eval_vqa_arch1.main(common + ["--out_path", out1])
    eval_vqa_arch1.main(common + ["--out_path", out2, "--data_parallel", "1"])
    for name in (
        "OpenEnded_mscoco_val2014_lstm_novel_new_2_results.json",
        "MultipleChoice_mscoco_val2014_lstm_novel_new_2_results.json",
    ):
        with open(out1 + name) as f1, open(out2 + name) as f2:
            assert f1.read() == f2.read(), name
