"""M1 end-to-end slice (SURVEY.md section 7 step 4): synthetic VQA data in the
byte-identical prepro schema -> arch1 train CLI -> eval CLI result JSONs ->
official VQAEval parity harness.  Exercises config, data, ops, the jitted
train step, checkpointing, and both evaluation paths on the CPU mesh."""

import json
import os

import h5py
import numpy as np
import pytest


V_Q = 40  # question vocab
N_ANS = 6
D = 8


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    """Tiny learnable VQA set: the answer is a deterministic function of the
    image feature cluster; questions are random tokens."""
    tmp = tmp_path_factory.mktemp("m1")
    rs = np.random.RandomState(0)

    n_train, n_val, n_test, n_img = 400, 60, 60, 30
    img_ans = rs.randint(1, N_ANS + 1, size=n_img)  # answer per image
    feats = np.eye(N_ANS)[img_ans - 1] @ rs.randn(N_ANS, 16) + 0.05 * rs.randn(n_img, 16)
    feats = feats.astype(np.float32)

    def make_split(n):
        img_pos = rs.randint(1, n_img + 1, size=n).astype(np.uint32)
        lengths = rs.randint(1, D + 1, size=n).astype(np.uint32)
        ques = np.zeros((n, D), np.uint32)
        for i, L in enumerate(lengths):
            ques[i, :L] = rs.randint(1, V_Q + 1, size=L)
        qid = np.arange(1, n + 1, dtype=np.uint32)
        answers = img_ans[img_pos - 1].astype(np.uint32)
        return ques, lengths, qid, img_pos, answers

    tr = make_split(n_train)
    va = make_split(n_val)
    te = make_split(n_test)
    te_qid = te[2] + 10000

    mc = np.zeros((n_test, 18), np.uint32)
    for i in range(n_test):
        wrong = rs.choice(
            [a for a in range(1, N_ANS + 1) if a != te[4][i]], size=3, replace=False
        )
        choices = np.concatenate([[te[4][i]], wrong])
        rs.shuffle(choices)
        mc[i, : len(choices)] = choices

    # data_prepro.h5 with the exact schema (000_prepro_vqa.py:273-293)
    ques_h5 = str(tmp / "data_prepro.h5")
    with h5py.File(ques_h5, "w") as f:
        f.create_dataset("ques_train", dtype="uint32", data=tr[0])
        f.create_dataset("ques_length_train", dtype="uint32", data=tr[1])
        f.create_dataset("answers", dtype="uint32", data=tr[4])
        f.create_dataset("question_id_train", dtype="uint32", data=tr[2])
        f.create_dataset("img_pos_train", dtype="uint32", data=tr[3])
        f.create_dataset("ques_val", dtype="uint32", data=va[0])
        f.create_dataset("ques_length_val", dtype="uint32", data=va[1])
        f.create_dataset("answers_val", dtype="uint32", data=va[4])
        f.create_dataset("question_id_val", dtype="uint32", data=va[2])
        f.create_dataset("img_pos_val", dtype="uint32", data=va[3])
        f.create_dataset("ques_test", dtype="uint32", data=te[0])
        f.create_dataset("ques_length_test", dtype="uint32", data=te[1])
        f.create_dataset("question_id_test", dtype="uint32", data=te_qid)
        f.create_dataset("img_pos_test", dtype="uint32", data=te[3])
        f.create_dataset("MC_ans_test", dtype="uint32", data=mc)

    img_h5 = str(tmp / "data_img.h5")
    with h5py.File(img_h5, "w") as f:
        f.create_dataset("images_train", dtype="float32", data=feats)
        f.create_dataset("images_val", dtype="float32", data=feats)
        f.create_dataset("images_test", dtype="float32", data=feats)

    meta = {
        "ix_to_word": {str(i): f"w{i}" for i in range(1, V_Q + 1)},
        "ix_to_ans": {str(i): f"ans{i}" for i in range(1, N_ANS + 1)},
        "unique_img_train": [f"im{i}.jpg" for i in range(n_img)],
        "unique_img_val": [f"im{i}.jpg" for i in range(n_img)],
        "unique_img_test": [f"im{i}.jpg" for i in range(n_img)],
    }
    meta_json = str(tmp / "data_prepro.json")
    with open(meta_json, "w") as f:
        json.dump(meta, f)

    # official annotations/questions for the test split
    ann = {
        "info": {},
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "annotations": [
            {
                "question_id": int(q),
                "image_id": int(p),
                "question_type": "what is",
                "answer_type": "other",
                "multiple_choice_answer": f"ans{a}",
                "answers": [
                    {"answer": f"ans{a}", "answer_confidence": "yes", "answer_id": j + 1}
                    for j in range(10)
                ],
            }
            for q, p, a in zip(te_qid, te[3], te[4])
        ],
    }
    ques = {
        "info": {},
        "task_type": "Open-Ended",
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "questions": [
            {"question_id": int(q), "image_id": int(p), "question": "what?"}
            for q, p in zip(te_qid, te[3])
        ],
    }
    ann_json = str(tmp / "ann.json")
    ques_json = str(tmp / "ques.json")
    with open(ann_json, "w") as f:
        json.dump(ann, f)
    with open(ques_json, "w") as f:
        json.dump(ques, f)

    return {
        "tmp": tmp,
        "ques_h5": ques_h5,
        "img_h5": img_h5,
        "meta_json": meta_json,
        "ann_json": ann_json,
        "ques_json": ques_json,
    }


def test_m1_train_eval_accuracy(synthetic_dataset):
    d = synthetic_dataset
    ckpt_dir = str(d["tmp"] / "model") + "/"

    from novel_vqa_tpu.train import train_vqa_arch1, eval_vqa_arch1

    train_vqa_arch1.main(
        [
            "--input_img_h5", d["img_h5"],
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta_json"],
            "--checkpoint_path", ckpt_dir,
            "--batch_size", "64",
            "--max_iters", "400",
            "--save_checkpoint_every", "400",
            "--learning_rate", "3e-3",
            "--nhimage", "16",
            "--input_encoding_size", "12",
            "--rnn_size", "16",
            "--rnn_layer", "2",
            "--common_embedding_size", "16",
            "--num_output", str(N_ANS),
            "--log_every", "100",
        ]
    )
    assert os.path.exists(ckpt_dir + "lstm.h5")
    assert os.path.exists(ckpt_dir + "save/lstm_save_iter400.h5")
    assert os.path.exists(ckpt_dir + "save/logFile.txt")

    out_dir = str(d["tmp"] / "result") + "/"
    eval_vqa_arch1.main(
        [
            "--input_img_h5", d["img_h5"],
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta_json"],
            "--model_path", ckpt_dir + "lstm.h5",
            "--batch_size", "64",
            "--nhimage", "16",
            "--input_encoding_size", "12",
            "--rnn_size", "16",
            "--rnn_layer", "2",
            "--common_embedding_size", "16",
            "--num_output", str(N_ANS),
            "--out_path", out_dir,
        ]
    )
    oe_path = out_dir + "OpenEnded_mscoco_val2014_lstm_novel_new_2_results.json"
    mc_path = out_dir + "MultipleChoice_mscoco_val2014_lstm_novel_new_2_results.json"
    assert os.path.exists(oe_path) and os.path.exists(mc_path)

    # the default eval path is HBM-resident (device-side gather); the
    # streaming path (--hbm_resident 0) must produce the identical result
    # JSON — same math, different data movement
    out_dir_s = str(d["tmp"] / "result_stream") + "/"
    eval_vqa_arch1.main(
        [
            "--input_img_h5", d["img_h5"],
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta_json"],
            "--model_path", ckpt_dir + "lstm.h5",
            "--batch_size", "64",
            "--nhimage", "16",
            "--input_encoding_size", "12",
            "--rnn_size", "16",
            "--rnn_layer", "2",
            "--common_embedding_size", "16",
            "--num_output", str(N_ANS),
            "--out_path", out_dir_s,
            "--hbm_resident", "0",
        ]
    )
    with open(oe_path) as f1, open(
        out_dir_s + "OpenEnded_mscoco_val2014_lstm_novel_new_2_results.json"
    ) as f2:
        assert json.load(f1) == json.load(f2)
    # the MC path differs more between modes (device-side argmax-over-
    # choices vs the host numpy loop) — must also be identical
    with open(mc_path) as f1, open(
        out_dir_s + "MultipleChoice_mscoco_val2014_lstm_novel_new_2_results.json"
    ) as f2:
        assert json.load(f1) == json.load(f2)

    # --data_parallel: per-batch index vector sharded over the 8-device CPU
    # mesh through eval_loop.run_full_split's DP branch (store placed once,
    # deferred fetches) — same result JSONs again
    out_dir_dp = str(d["tmp"] / "result_dp") + "/"
    eval_vqa_arch1.main(
        [
            "--input_img_h5", d["img_h5"],
            "--input_ques_h5", d["ques_h5"],
            "--input_json", d["meta_json"],
            "--model_path", ckpt_dir + "lstm.h5",
            "--batch_size", "64",
            "--nhimage", "16",
            "--input_encoding_size", "12",
            "--rnn_size", "16",
            "--rnn_layer", "2",
            "--common_embedding_size", "16",
            "--num_output", str(N_ANS),
            "--out_path", out_dir_dp,
            "--data_parallel", "1",
        ]
    )
    for name in (
        "OpenEnded_mscoco_val2014_lstm_novel_new_2_results.json",
        "MultipleChoice_mscoco_val2014_lstm_novel_new_2_results.json",
    ):
        with open(out_dir + name) as f1, open(out_dir_dp + name) as f2:
            assert json.load(f1) == json.load(f2)

    from novel_vqa_tpu.eval.drivers import evaluate

    acc = evaluate(d["ann_json"], d["ques_json"], oe_path)
    # the synthetic task is fully determined by the image feature; the tiny
    # model must get well above chance (100/6 ~ 17%)
    assert acc["overall"] > 60, acc
    acc_mc = evaluate(d["ann_json"], d["ques_json"], mc_path)
    assert acc_mc["overall"] >= acc["overall"] - 5
