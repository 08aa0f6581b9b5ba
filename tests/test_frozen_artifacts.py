"""Frozen-artifact interop: the published vocabs/, Clusters/, Statistics/ and
QuestionTypes files from the reference load unchanged through our entry
points, with the scale anchors from BASELINE.md."""

import json
import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mirror not mounted"
)


def load(path):
    with open(os.path.join(REF, path)) as f:
        return json.load(f)


def test_vocab_scale_anchors():
    assert len(load("vocabs/vocab_train.json")) == 12782
    assert len(load("vocabs/vocab_oracle.json")) == 14773
    assert len(load("vocabs/vocab_general.json")) == 55783
    assert len(load("vocabs/oracle_extern_ans_vocab.json")) == 1000
    assert len(load("vocabs/list_of_novel_words.json")) == 813


def test_vocabs_contain_unk():
    """The extern-vocab flow requires UNK in-vocab (000_prepro_vqa.py:104)."""
    for name in ("vocab_train", "vocab_oracle", "vocab_general"):
        assert "UNK" in load(f"vocabs/{name}.json"), name


def test_clusters_load():
    clusters = load("000_create_dataset/Clusters/clusteredNouns.json")
    assert len(clusters) == 14
    sizes = sorted(len(v) for v in clusters.values())
    assert sizes[0] >= 1 and sum(sizes) > 3000


def test_noun_lists():
    train = load("000_create_dataset/trainNouns.json")
    test = load("000_create_dataset/testNouns.json")
    assert len(train) == 3279 and len(test) == 813
    assert not (set(train) & set(test))


def test_question_types_loader():
    from novel_vqa_tpu.pipeline.novel_split import get_question_type, load_question_types

    qt = load_question_types(
        os.path.join(REF, "004_vqa_evaluation/QuestionTypes/mscoco_question_types.txt")
    )
    assert len(qt) == 64
    # longest-first ordering; "what color is the" must match before "what"
    idx = get_question_type("what color is the car".split(), qt)
    assert " ".join(qt[idx]) == "what color is the"


def test_ques_id_hist_novel_bucket():
    hist = load("004_vqa_evaluation/PythonEvaluationTools/ques_id_hist.json")
    assert len(hist["0"]) == 32452  # novel subset qids (BASELINE.md)


def test_extern_vocab_through_prepro(tmp_path):
    """A tiny raw set preprocessed with the published oracle vocab + answer
    vocab produces a valid data_prepro pair."""
    import h5py

    from novel_vqa_tpu.pipeline import prepro_vqa

    raw_train = [
        {
            "ques_id": i,
            "img_path": f"train2014/im{i}.jpg",
            "question": "What color is the cat?",
            "MC_ans": ["red", "blue"],
            "ans": "red",
        }
        for i in range(8)
    ]
    raw_test = [
        {
            "ques_id": 100 + i,
            "img_path": f"val2014/im{i}.jpg",
            "question": "Is this a dog?",
            "MC_ans": ["yes", "no"],
        }
        for i in range(3)
    ]
    tr = tmp_path / "raw_train.json"
    te = tmp_path / "raw_test.json"
    tr.write_text(json.dumps(raw_train))
    te.write_text(json.dumps(raw_test))
    out_json = str(tmp_path / "p.json")
    out_h5 = str(tmp_path / "p.h5")
    prepro_vqa.cli(
        [
            "--input_train_json", str(tr),
            "--input_test_json", str(te),
            "--num_ans", "1000",
            "--extern_vocab", os.path.join(REF, "vocabs/vocab_oracle.json"),
            "--extern_ans_vocab", os.path.join(REF, "vocabs/oracle_extern_ans_vocab.json"),
            "--output_json", out_json,
            "--output_h5", out_h5,
        ]
    )
    meta = json.load(open(out_json))
    assert len(meta["ix_to_word"]) == 14773
    assert len(meta["ix_to_ans"]) == 1000
    with h5py.File(out_h5) as f:
        assert f["ques_train"].shape[1] == 16
        assert f["ques_train"][:].max() <= 14773
