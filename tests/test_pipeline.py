"""Pipeline stage tests: tokenizers, VQA/corpus prepro schemas + quirks,
dataset creation, and the correction stage."""

import json
import os

import h5py
import numpy as np
import pytest

from novel_vqa_tpu.pipeline import tokenize as T
from novel_vqa_tpu.pipeline import pos


def test_prepro_sentence():
    assert T.prepro_sentence("What is the man's hat?") == [
        "what", "is", "the", "mans", "hat",
    ]
    assert T.prepro_sentence_ascii("café table!") == ["caf", "table"]


def test_tokenize_regex():
    assert T.tokenize_regex("what's this?") == ["what", "'", "s", "this", "?"]


def test_word_tokenize_data_free():
    assert T.word_tokenize("what is the man doing?") == [
        "what", "is", "the", "man", "doing", "?",
    ]


def test_spacy_tokenize_with_fake_pipeline(monkeypatch):
    """The spaCy branch (000_prepro_vqa.py:48-49,212-214) is functional when
    spaCy is importable: tokens are the pipeline's ``norm_`` values.  spaCy
    itself is absent offline, so install a minimal fake module."""
    import sys
    import types

    class _Tok:
        def __init__(self, norm):
            self.norm_ = norm

    def blank(lang):
        assert lang == "en"
        return lambda s: [_Tok(w.lower()) for w in s.split()]

    fake = types.ModuleType("spacy")
    fake.blank = blank
    monkeypatch.setitem(sys.modules, "spacy", fake)
    monkeypatch.setattr(T, "_spacy_pipe", None)
    tok = T.get_tokenizer("spacy")
    assert tok("What IS this") == ["what", "is", "this"]
    monkeypatch.setattr(T, "_spacy_pipe", None)


def test_spacy_tokenize_clear_error_when_absent(monkeypatch):
    import sys

    monkeypatch.setattr(T, "_spacy_pipe", None)
    monkeypatch.setitem(sys.modules, "spacy", None)  # force ImportError
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="requires spaCy"):
        T.get_tokenizer("spacy")("hello there")


def test_pluralize():
    assert pos.pluralize("cat") == "cats"
    assert pos.pluralize("box") == "boxes"
    assert pos.pluralize("city") == "cities"
    assert pos.pluralize("knife") == "knives"
    assert pos.pluralize("man") == "men"
    assert pos.pluralize("sheep") == "sheep"


def _raw_item(qid, img, question, ans, n_mc=4):
    return {
        "ques_id": qid,
        "img_path": img,
        "question": question,
        "MC_ans": [ans] + [f"mc{i}" for i in range(n_mc - 1)],
        "ans": ans,
    }


@pytest.fixture
def raw_vqa(tmp_path):
    train = [
        _raw_item(i, f"train2014/im{i % 4}.jpg", f"what is the {w}?", a)
        for i, (w, a) in enumerate(
            [("cat", "cat"), ("dog", "dog"), ("cat", "cat"), ("hat", "red"),
             ("dog", "dog"), ("cat", "cat"), ("sun", "yes"), ("dog", "no")] * 5
        )
    ]
    test = [
        {
            "ques_id": 1000 + i,
            "img_path": f"val2014/im{i}.jpg",
            "question": f"is this a {w}?",
            "MC_ans": ["yes", "no", "cat", "dog"],
        }
        for i, w in enumerate(["cat", "dog", "pizza"])
    ]
    tr, te = tmp_path / "raw_train.json", tmp_path / "raw_test.json"
    tr.write_text(json.dumps(train))
    te.write_text(json.dumps(test))
    return str(tr), str(te), tmp_path


def test_prepro_vqa_schema_and_quirks(raw_vqa):
    from novel_vqa_tpu.pipeline import prepro_vqa

    tr, te, tmp = raw_vqa
    out_json = str(tmp / "data_prepro.json")
    out_h5 = str(tmp / "data_prepro.h5")
    prepro_vqa.cli(
        [
            "--input_train_json", tr,
            "--input_test_json", te,
            "--num_ans", "4",
            "--output_json", out_json,
            "--output_h5", out_h5,
            "--num_val", "6",
            "--max_length", "8",
        ]
    )
    with h5py.File(out_h5) as f:
        keys = set(f.keys())
        assert {
            "ques_train", "ques_length_train", "answers", "question_id_train",
            "img_pos_train", "ques_val", "ques_length_val", "answers_val",
            "question_id_val", "img_pos_val", "ques_test", "ques_length_test",
            "question_id_test", "img_pos_test", "MC_ans_test",
        } <= keys
        for k in keys:
            assert f[k].dtype == np.uint32, k
        n_train = f["ques_train"].shape[0]
        n_val = f["ques_val"].shape[0]
        assert n_val == 6
        # num_val off-by-one: one overlapping example (train + val > total)
        # filtered total is the number of train items with top-4 answers
        assert f["img_pos_train"][:].min() >= 1  # 1-indexed

    with open(out_json) as f:
        meta = json.load(f)
    assert "ix_to_word" in meta and "ix_to_ans" in meta
    assert len(meta["ix_to_ans"]) == 4
    # 1-indexed vocab: no "0" key
    assert "0" not in meta["ix_to_word"]


def test_prepro_vqa_extern_vocab_oov_answers(raw_vqa, tmp_path):
    from novel_vqa_tpu.pipeline import prepro_vqa

    tr, te, tmp = raw_vqa
    ans_vocab = tmp_path / "ans_vocab.json"
    ans_vocab.write_text(json.dumps(["cat", "nonexistent"]))
    vocab = tmp_path / "vocab.json"
    # the published extern vocabs include UNK; without it the reference's
    # encode_question would KeyError identically
    vocab.write_text(json.dumps(["what", "is", "the", "cat", "dog", "UNK"]))
    out_json = str(tmp_path / "o.json")
    out_h5 = str(tmp_path / "o.h5")
    prepro_vqa.cli(
        [
            "--input_train_json", tr,
            "--input_test_json", te,
            "--num_ans", "2",
            "--output_json", out_json,
            "--output_h5", out_h5,
            "--extern_vocab", str(vocab),
            "--extern_ans_vocab", str(ans_vocab),
        ]
    )
    with open(out_json) as f:
        meta = json.load(f)
    # extern vocab + UNK appended? reference keeps the loaded list as-is for
    # extern vocab (UNK not appended; words map to 'UNK' which must be in the
    # vocab). Our vocab has no UNK -> wtoi misses it.
    # The reference would KeyError in that case too; so the external vocab
    # must contain 'UNK' — this asserts the filter worked:
    assert len(meta["ix_to_ans"]) == 2


def test_prepro_book_corpus(tmp_path):
    from novel_vqa_tpu.pipeline import prepro_book_corpus

    corpus = tmp_path / "corpus.txt"
    lines = [
        "the cat sat on the mat",
        "a dog ran fast",
        "the bird flew high over the trees",
        "cats and dogs live together",
    ] * 10
    corpus.write_text("\n".join(lines) + "\n")
    out_h5 = str(tmp_path / "data.h5")
    out_json = str(tmp_path / "data.json")
    prepro_book_corpus.cli(
        [
            "--corpus", str(corpus),
            "--output_h5", out_h5,
            "--output_json", out_json,
            "--num_val", "5",
            "--num_test", "5",
            "--word_count_threshold", "0",
            "--max_length", "6",
        ]
    )
    with h5py.File(out_h5) as f:
        assert f["labels/train"].shape == (30, 6)
        assert f["labels/val"].shape == (5, 6)
        assert f["labels/test"].shape == (5, 6)
        assert f["labels/train"].dtype == np.uint32
        assert f["label_length/train"][:].min() >= 1
    with open(out_json) as f:
        meta = json.load(f)
    assert meta["num_train"] == 30
    assert "ix_to_word" in meta and "0" not in meta["ix_to_word"]


def test_vqa_preprocessing_flatten(tmp_path):
    from novel_vqa_tpu.pipeline import vqa_preprocessing

    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()

    def write(name, obj):
        (ann_dir / name).write_text(json.dumps(obj))

    def anno(subtype, qids):
        return {
            "annotations": [
                {
                    "question_id": q,
                    "image_id": q * 7,
                    "multiple_choice_answer": "yes",
                    "answers": [],
                }
                for q in qids
            ]
        }

    def ques(qids):
        return {
            "questions": [
                {
                    "question_id": q,
                    "image_id": q * 7,
                    "question": "really?",
                    "multiple_choices": ["yes", "no"],
                }
                for q in qids
            ]
        }

    write("mscoco_train2014_annotations.json", anno("train2014", [1, 2]))
    write("mscoco_val2014_annotations.json", anno("val2014", [3]))
    write("MultipleChoice_mscoco_train2014_questions.json", ques([1, 2]))
    write("MultipleChoice_mscoco_val2014_questions.json", ques([3]))

    out_tr = str(tmp_path / "raw_train.json")
    out_te = str(tmp_path / "raw_test.json")
    vqa_preprocessing.cli(
        [
            "--annotations_dir", str(ann_dir),
            "--split", "1",
            "--output_train", out_tr,
            "--output_test", out_te,
        ]
    )
    with open(out_tr) as f:
        train = json.load(f)
    with open(out_te) as f:
        test = json.load(f)
    assert len(train) == 2 and len(test) == 1
    assert train[0]["ans"] == "yes"
    assert "ans" not in test[0]  # split-1 test has no single answer (:73)
    assert train[0]["img_path"] == "train2014/COCO_train2014_%012d.jpg" % 7


def test_novel_split_pipeline(tmp_path):
    """stats -> cluster -> split on synthetic data with the heuristic tagger."""
    from novel_vqa_tpu.pipeline import novel_split

    qt = tmp_path / "question_types.txt"
    qt.write_text("what is\nis this\nwhat\n")

    nouns = ["cat", "dog", "pizza", "guitar", "chair", "tree", "car", "boat"]
    train = [
        _raw_item(i, f"train2014/im{i}.jpg", f"what is the {nouns[i % 8]}", nouns[i % 8])
        for i in range(40)
    ]
    test = [
        {
            "ques_id": 100 + i,
            "img_path": f"val2014/im{i}.jpg",
            "question": f"is this {nouns[i % 8]}",
            "MC_ans": ["yes", "no"],
        }
        for i in range(8)
    ]
    (tmp_path / "raw_train.json").write_text(json.dumps(train))
    (tmp_path / "raw_test.json").write_text(json.dumps(test))

    stats_dir = str(tmp_path / "Statistics") + "/"
    novel_split.cli(
        [
            "stats",
            "--question_types", str(qt),
            "--raw_train", str(tmp_path / "raw_train.json"),
            "--raw_test", str(tmp_path / "raw_test.json"),
            "--out_dir", stats_dir,
            "--min_count", "2",
            "--tagger", "heuristic",
        ]
    )
    feats = json.loads((tmp_path / "Statistics" / "featureVectors.json").read_text())
    assert len(feats) >= 4

    clusters_dir = str(tmp_path / "Clusters") + "/"
    novel_split.cli(
        [
            "cluster",
            "--stats_dir", stats_dir,
            "--out_dir", clusters_dir,
            "--num_clusters", "2",
            "--n_init", "5",
            "--max_iter", "50",
        ]
    )
    clustered = json.loads((tmp_path / "Clusters" / "clusteredNouns.json").read_text())
    assert sum(len(v) for v in clustered.values()) == len(feats)

    # annotations/questions files for split construction
    def anno_file(items):
        return {
            "annotations": [
                {
                    "question_id": el["ques_id"],
                    "answers": [{"answer": el.get("ans", "yes")}] * 3,
                }
                for el in items
            ]
        }

    def q_file(items):
        return {"questions": [{"question_id": el["ques_id"]} for el in items]}

    for name, obj in [
        ("train_anno.json", anno_file(train)),
        ("val_anno.json", anno_file(test)),
        ("train_mc.json", q_file(train)),
        ("train_oe.json", q_file(train)),
        ("val_mc.json", q_file(test)),
        ("val_oe.json", q_file(test)),
    ]:
        (tmp_path / name).write_text(json.dumps(obj))

    save = str(tmp_path / "out") + "/"
    novel_split.cli(
        [
            "split",
            "--clusters", str(tmp_path / "Clusters" / "clusteredNouns.json"),
            "--raw_train", str(tmp_path / "raw_train.json"),
            "--raw_test", str(tmp_path / "raw_test.json"),
            "--train_annotations", str(tmp_path / "train_anno.json"),
            "--val_annotations", str(tmp_path / "val_anno.json"),
            "--train_questions_mc", str(tmp_path / "train_mc.json"),
            "--train_questions_oe", str(tmp_path / "train_oe.json"),
            "--val_questions_mc", str(tmp_path / "val_mc.json"),
            "--val_questions_oe", str(tmp_path / "val_oe.json"),
            "--save_base_path", save,
            "--save_vqa_annotations_path", str(tmp_path / "Ann") + "/",
            "--save_vqa_questions_path", str(tmp_path / "Ques") + "/",
            "--tagger", "heuristic",
        ]
    )
    train_kn = json.loads((tmp_path / "out" / "train_raw_novel_2.json").read_text())
    val_kn = json.loads((tmp_path / "out" / "val_raw_novel_2.json").read_text())
    assert len(train_kn) + len(val_kn) == len(train) + len(test)
    test_nouns = set(json.loads((tmp_path / "out" / "testNouns.json").read_text()))
    # no novel-val noun appears in any retained train question
    for el in train_kn:
        for w in el["question"].lower().split():
            assert w not in test_nouns, (w, el)


def test_correction_stage(tmp_path):
    from novel_vqa_tpu.pipeline import correction

    novel_words = ["cat", "guitar"]
    (tmp_path / "novel.json").write_text(json.dumps(novel_words))
    train = [
        _raw_item(0, "a.jpg", "what are the cats doing", "playing"),  # plural leak
        _raw_item(1, "b.jpg", "what is this", "guitar"),  # answer leak
        _raw_item(2, "c.jpg", "what is the dog doing", "running"),  # clean
    ]
    anno = {
        "annotations": [
            {"question_id": el["ques_id"], "answers": [{"answer": el["ans"]}] * 3}
            for el in train
        ]
    }
    qf = {"questions": [{"question_id": el["ques_id"]} for el in train]}
    (tmp_path / "train_raw.json").write_text(json.dumps(train))
    (tmp_path / "train_anno.json").write_text(json.dumps(anno))
    (tmp_path / "train_oe.json").write_text(json.dumps(qf))
    (tmp_path / "train_mc.json").write_text(json.dumps(qf))

    correction.cli(
        [
            "correct",
            "--novel_words", str(tmp_path / "novel.json"),
            "--train_raw", str(tmp_path / "train_raw.json"),
            "--train_annotations", str(tmp_path / "train_anno.json"),
            "--train_oe_questions", str(tmp_path / "train_oe.json"),
            "--train_mcq_questions", str(tmp_path / "train_mc.json"),
            "--save_train_raw", str(tmp_path / "new_raw.json"),
            "--save_train_annotations", str(tmp_path / "new_anno.json"),
            "--save_train_oe_questions", str(tmp_path / "new_oe.json"),
            "--save_train_mcq_questions", str(tmp_path / "new_mc.json"),
            "--tagger", "heuristic",
        ]
    )
    kept = json.loads((tmp_path / "new_raw.json").read_text())
    assert [el["ques_id"] for el in kept] == [2]

    # img-lookup + remap-features roundtrip
    prepro = {
        "unique_img_train": ["a.jpg", "b.jpg"],
        "unique_img_val": ["c.jpg"],
        "unique_img_test": [],
    }
    (tmp_path / "old_prepro.json").write_text(json.dumps(prepro))
    correction.cli(
        [
            "img-lookup",
            "--original_json", str(tmp_path / "old_prepro.json"),
            "--save_path", str(tmp_path / "lookup.json"),
        ]
    )
    lookup = json.loads((tmp_path / "lookup.json").read_text())
    assert lookup["a.jpg"] == {"idx": 1, "set": "train"}
    assert lookup["c.jpg"] == {"idx": 1, "set": "val"}

    with h5py.File(tmp_path / "old_img.h5", "w") as f:
        f.create_dataset("images_train", data=np.arange(8, dtype=np.float32).reshape(2, 4))
        f.create_dataset("images_val", data=np.full((1, 4), 9, np.float32))
    new_meta = {"unique_img_train": ["c.jpg", "a.jpg"], "unique_img_val": [], "unique_img_test": []}
    (tmp_path / "new_prepro.json").write_text(json.dumps(new_meta))
    correction.cli(
        [
            "remap-features",
            "--lookup_json", str(tmp_path / "lookup.json"),
            "--new_prepro_json", str(tmp_path / "new_prepro.json"),
            "--old_img_h5", str(tmp_path / "old_img.h5"),
            "--out_h5", str(tmp_path / "new_img.h5"),
        ]
    )
    with h5py.File(tmp_path / "new_img.h5") as f:
        np.testing.assert_array_equal(f["images_train"][0], [9, 9, 9, 9])
        np.testing.assert_array_equal(f["images_train"][1], [0, 1, 2, 3])
