"""Golden-fingerprint regression tests.

The artifact writers must stay byte-stable across rounds: these tests run
the prepro stages on FIXED inputs and compare a canonical fingerprint of the
output h5 (sorted dataset names + dtypes + shapes + raw bytes) and json
against frozen hashes.  If a change is intentional, update the constant and
say why in the commit.
"""

import hashlib
import json

import h5py
import numpy as np
import pytest


def h5_fingerprint(path: str) -> str:
    items = []

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            items.append((name, str(obj.dtype), tuple(obj.shape), obj[()].tobytes()))

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    items.sort(key=lambda t: t[0])
    h = hashlib.sha256()
    for name, dtype, shape, data in items:
        h.update(name.encode())
        h.update(dtype.encode())
        h.update(str(shape).encode())
        h.update(data)
    return h.hexdigest()


def json_fingerprint(path: str) -> str:
    with open(path) as f:
        obj = json.load(f)
    return hashlib.sha256(
        json.dumps(obj, sort_keys=True).encode()
    ).hexdigest()


GOLDEN_VQA_H5 = "70737de5a6527f951d370aff00806d3d157403773ae49d4e6a04b281cb9090c2"
GOLDEN_VQA_JSON = "1290e285d2ac0912d5b4e0ea8c4267cd6c9ff899cb4eb299c27ff3779ec260b2"
GOLDEN_CORPUS_H5 = "dff74cb61499c9f8f18c718bed95f2d6adc1e637ccc2ac958494bd8b04f0a36c"


def fixed_raw_vqa(tmp_path):
    """Deterministic raw inputs (no RNG — golden must be reproducible)."""
    words = ["cat", "dog", "hat", "sun", "car", "box"]
    train = []
    for i in range(24):
        w = words[i % 6]
        train.append(
            {
                "ques_id": i,
                "img_path": f"train2014/im{i % 4}.jpg",
                "question": f"what is the {w} doing?",
                "MC_ans": ["yes", "no", w, "blue"],
                "ans": w if i % 3 else "yes",
            }
        )
    test = [
        {
            "ques_id": 100 + i,
            "img_path": f"val2014/im{i}.jpg",
            "question": f"is this a {words[i % 6]}?",
            "MC_ans": ["yes", "no"],
        }
        for i in range(6)
    ]
    tr = tmp_path / "raw_train.json"
    te = tmp_path / "raw_test.json"
    tr.write_text(json.dumps(train))
    te.write_text(json.dumps(test))
    return str(tr), str(te)


def test_prepro_vqa_golden(tmp_path):
    from novel_vqa_tpu.pipeline import prepro_vqa

    tr, te = fixed_raw_vqa(tmp_path)
    out_h5 = str(tmp_path / "p.h5")
    out_json = str(tmp_path / "p.json")
    prepro_vqa.cli(
        [
            "--input_train_json", tr,
            "--input_test_json", te,
            "--num_ans", "4",
            "--output_h5", out_h5,
            "--output_json", out_json,
            "--num_val", "4",
            "--max_length", "8",
        ]
    )
    assert h5_fingerprint(out_h5) == GOLDEN_VQA_H5
    assert json_fingerprint(out_json) == GOLDEN_VQA_JSON


def test_prepro_corpus_golden(tmp_path):
    from novel_vqa_tpu.pipeline import prepro_book_corpus

    corpus = tmp_path / "c.txt"
    lines = []
    for i in range(40):
        lines.append(" ".join(["the", "cat", "sat", "on", "mat"][: 2 + i % 4]))
    corpus.write_text("\n".join(lines) + "\n")
    out_h5 = str(tmp_path / "d.h5")
    out_json = str(tmp_path / "d.json")
    prepro_book_corpus.cli(
        [
            "--corpus", str(corpus),
            "--output_h5", out_h5,
            "--output_json", out_json,
            "--num_val", "5",
            "--num_test", "5",
            "--word_count_threshold", "0",
            "--max_length", "5",
        ]
    )
    assert h5_fingerprint(out_h5) == GOLDEN_CORPUS_H5
