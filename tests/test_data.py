"""Data-layer tests: right_align semantics (RNNUtils.lua:54-61), the corpus
loader's wrap-around (DataLoader.lua:58-88), and VQA batching."""

import json

import h5py
import numpy as np
import pytest

from novel_vqa_tpu.data import CorpusLoader, right_align
from novel_vqa_tpu.data.align import right_align_fast


def test_right_align_matches_lua_semantics():
    seq = np.array([[3, 5, 0, 0], [1, 2, 3, 4], [7, 0, 0, 0]], np.int32)
    lengths = np.array([2, 4, 1])
    out = right_align(seq, lengths)
    expected = np.array([[0, 0, 3, 5], [1, 2, 3, 4], [0, 0, 0, 7]], np.int32)
    np.testing.assert_array_equal(out, expected)


def test_right_align_fast_matches_slow():
    rs = np.random.RandomState(0)
    D = 16
    seq = np.zeros((40, D), np.uint32)
    lengths = rs.randint(1, D + 1, size=40)
    for i, L in enumerate(lengths):
        seq[i, :L] = rs.randint(1, 100, size=L)
    np.testing.assert_array_equal(
        right_align(seq, lengths), right_align_fast(seq, lengths)
    )


@pytest.fixture
def corpus_files(tmp_path):
    h5_path = tmp_path / "data.h5"
    json_path = tmp_path / "data.json"
    n_train, n_val, L = 10, 4, 6
    labels_train = np.arange(1, n_train * L + 1, dtype=np.uint32).reshape(n_train, L)
    labels_val = np.arange(1, n_val * L + 1, dtype=np.uint32).reshape(n_val, L)
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("labels/train", dtype="uint32", data=labels_train)
        f.create_dataset("labels/val", dtype="uint32", data=labels_val)
        f.create_dataset("labels/test", dtype="uint32", data=labels_val)
    json_path.write_text(
        json.dumps(
            {
                "ix_to_word": {str(i): f"w{i}" for i in range(1, 100)},
                "num_train": n_train,
                "num_val": n_val,
                "num_test": n_val,
            }
        )
    )
    return str(h5_path), str(json_path), labels_train


def test_corpus_loader_sequential_and_wrap(corpus_files):
    h5_path, json_path, labels_train = corpus_files
    loader = CorpusLoader(h5_path, json_path)
    assert loader.vocab_size == 99
    assert loader.seq_length == 6

    b1, bounds1 = loader.get_batch("train", 4)
    assert b1.shape == (6, 4)  # time-major like DataLoader.lua:85
    np.testing.assert_array_equal(b1.T, labels_train[0:4])
    assert not bounds1["wrapped"]

    b2, _ = loader.get_batch("train", 4)
    np.testing.assert_array_equal(b2.T, labels_train[4:8])

    # next batch crosses the end: rows 8,9 then wrap to 0,1; iterator resets
    b3, bounds3 = loader.get_batch("train", 4)
    assert bounds3["wrapped"]
    np.testing.assert_array_equal(b3.T[:2], labels_train[8:10])
    np.testing.assert_array_equal(b3.T[2:], labels_train[0:2])
    assert loader.iterators["train"] == 0
    loader.close()
