"""Full-pipeline integration (BASELINE configs[4] in miniature):

corpus prepro -> text-AE pretrain -> AE->VQA conversion -> VQA prepro with a
shared external vocab -> fc7 extraction over real JPEGs (random VGG weights;
features are random-but-fixed per image, so the answer mapping stays
learnable) -> AE-initialized arch1 training -> test inference -> official
VQAEval accuracy.  Every stage runs through its public CLI.
"""

import json
import os

import h5py
import numpy as np
import pytest

N_ANS = 4
N_IMG = 10
WORDS = [f"w{i}" for i in range(1, 13)]
VOCAB = ["what", "is", "the", "a", "this"] + WORDS + ["UNK"]


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    rs = np.random.RandomState(0)

    # ---- vocab + corpus -> data.{h5,json} ------------------------------
    vocab_path = tmp_path / "vocab.json"
    vocab_path.write_text(json.dumps(VOCAB))
    corpus_path = tmp_path / "corpus.txt"
    lines = [
        " ".join(rs.choice(WORDS, size=rs.randint(2, 6)))
        for _ in range(120)
    ]
    corpus_path.write_text("\n".join(lines) + "\n")

    from novel_vqa_tpu.pipeline import prepro_book_corpus

    corpus_h5 = str(tmp_path / "data.h5")
    corpus_json = str(tmp_path / "data.json")
    prepro_book_corpus.cli(
        [
            "--corpus", str(corpus_path),
            "--output_h5", corpus_h5,
            "--output_json", corpus_json,
            "--num_val", "10",
            "--num_test", "10",
            "--max_length", "6",
            "--ext_vocab", str(vocab_path),
        ]
    )

    # ---- text-AE pretrain + conversion ---------------------------------
    from novel_vqa_tpu.train import convert_ae, train_text_ae

    ae_dir = str(tmp_path / "ae")
    os.makedirs(ae_dir, exist_ok=True)
    train_text_ae.main(
        [
            "--input_h5", corpus_h5,
            "--input_json", corpus_json,
            "--variant", "text_nostart",
            "--rnn_size", "20",
            "--input_encoding_size", "16",
            "--batch_size", "25",
            "--max_iters", "60",
            "--save_checkpoint_every", "50",
            "--learning_rate", "2e-3",
            "--val_sentences_use", "10",
            "--losses_log_every", "20",
            "--checkpoint_path", ae_dir,
        ]
    )
    converted = str(tmp_path / "converted.h5")
    convert_ae.main(["--ae_model", os.path.join(ae_dir, "model_id.npz"), "--out", converted])

    # ---- raw VQA JSONs -> data_prepro.{json,h5} ------------------------
    from PIL import Image

    img_dir = tmp_path / "images" / "train2014"
    img_dir.mkdir(parents=True)
    img_ans = rs.randint(1, N_ANS + 1, size=N_IMG)
    for i in range(N_IMG):
        Image.fromarray(
            rs.randint(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(str(img_dir / f"im{i}.jpg"))

    def raw_item(qid, img_idx, with_ans=True):
        rec = {
            "ques_id": qid,
            "img_path": f"train2014/im{img_idx}.jpg",
            "question": f"what is the {rs.choice(WORDS)}",
            "MC_ans": [f"ans{k}" for k in range(1, N_ANS + 1)],
        }
        if with_ans:
            rec["ans"] = f"ans{img_ans[img_idx]}"
        return rec

    raw_train = [raw_item(i, rs.randint(0, N_IMG)) for i in range(260)]
    raw_test = [raw_item(1000 + i, i % N_IMG, with_ans=False) for i in range(40)]
    test_ans = [f"ans{img_ans[i % N_IMG]}" for i in range(40)]
    (tmp_path / "raw_train.json").write_text(json.dumps(raw_train))
    (tmp_path / "raw_test.json").write_text(json.dumps(raw_test))
    ans_vocab = tmp_path / "ans_vocab.json"
    ans_vocab.write_text(json.dumps([f"ans{k}" for k in range(1, N_ANS + 1)]))

    from novel_vqa_tpu.pipeline import prepro_vqa

    prepro_json = str(tmp_path / "data_prepro.json")
    prepro_h5 = str(tmp_path / "data_prepro.h5")
    prepro_vqa.cli(
        [
            "--input_train_json", str(tmp_path / "raw_train.json"),
            "--input_test_json", str(tmp_path / "raw_test.json"),
            "--num_ans", str(N_ANS),
            "--extern_vocab", str(vocab_path),
            "--extern_ans_vocab", str(ans_vocab),
            "--output_json", prepro_json,
            "--output_h5", prepro_h5,
            "--num_val", "30",
            "--max_length", "6",
        ]
    )

    # ---- fc7 extraction (random VGG; fixed per image) ------------------
    from novel_vqa_tpu.train import extract_features

    img_h5 = str(tmp_path / "data_img.h5")
    extract_features.main(
        [
            "--input_json", prepro_json,
            "--image_root", str(tmp_path / "images") + "/",
            "--model", "vgg16",
            "--batch_size", "4",
            "--out_name", img_h5,
        ]
    )
    with h5py.File(img_h5) as f:
        assert f["images_train"].shape[1] == 4096

    # ---- AE-initialized arch1 training + inference ---------------------
    from novel_vqa_tpu.train import eval_vqa_arch1, train_vqa_arch1

    model_dir = str(tmp_path / "model") + "/"
    common = [
        "--input_img_h5", img_h5,
        "--input_ques_h5", prepro_h5,
        "--input_json", prepro_json,
        "--nhimage", "4096",
        "--input_encoding_size", "16",
        "--rnn_size", "20",
        "--rnn_layer", "1",
        "--common_embedding_size", "24",
        "--num_output", str(N_ANS),
    ]
    train_vqa_arch1.main(
        common
        + [
            "--checkpoint_path", model_dir,
            "--init_from", converted,
            "--batch_size", "64",
            "--max_iters", "400",
            "--save_checkpoint_every", "400",
            "--learning_rate", "3e-3",
            "--steps_per_dispatch", "20",
            "--log_every", "100",
        ]
    )

    result_dir = str(tmp_path / "result") + "/"
    eval_vqa_arch1.main(
        common
        + [
            "--model_path", model_dir + "lstm.h5",
            "--batch_size", "40",
            "--out_path", result_dir,
        ]
    )

    # ---- official evaluation -------------------------------------------
    ann = {
        "info": {}, "data_type": "mscoco", "data_subtype": "val2014", "license": {},
        "annotations": [
            {
                "question_id": el["ques_id"],
                "image_id": int(el["img_path"].split("im")[-1].split(".")[0]),
                "question_type": "what is the",
                "answer_type": "other",
                "multiple_choice_answer": test_ans[i],
                "answers": [
                    {"answer": test_ans[i], "answer_confidence": "yes", "answer_id": j + 1}
                    for j in range(10)
                ],
            }
            for i, el in enumerate(raw_test)
        ],
    }
    ques = {
        "info": {}, "task_type": "Open-Ended", "data_type": "mscoco",
        "data_subtype": "val2014", "license": {},
        "questions": [
            {"question_id": el["ques_id"], "image_id": 0, "question": el["question"]}
            for el in raw_test
        ],
    }
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    (tmp_path / "ques.json").write_text(json.dumps(ques))

    from novel_vqa_tpu.eval.drivers import evaluate

    acc = evaluate(
        str(tmp_path / "ann.json"),
        str(tmp_path / "ques.json"),
        result_dir + "OpenEnded_mscoco_val2014_lstm_novel_new_2_results.json",
    )
    # the answer is a deterministic function of the (random-but-fixed) image
    # features; far above the 25% chance level proves the whole chain works
    assert acc["overall"] > 60, acc
