"""BLEU / CIDEr-D sanity and known-value tests."""

import math

import numpy as np
import pytest

from novel_vqa_tpu.eval.language_metrics import cider_d, corpus_bleu, language_eval


def test_bleu_perfect_match():
    cands = [["the", "cat", "sat"], ["a", "dog", "ran", "fast"]]
    out = corpus_bleu(cands, cands)
    for n in range(1, 5):
        assert out[f"Bleu_{n}"] == pytest.approx(1.0, abs=1e-9) or out[
            f"Bleu_{n}"
        ] > 0.99  # short sentences have few 4-grams but identical sets


def test_bleu_unigram_known_value():
    # candidate: 4 tokens, 3 appear in the reference; same length -> BP = 1
    cands = [["the", "cat", "sat", "down"]]
    refs = [["the", "cat", "sat", "mat"]]
    out = corpus_bleu(cands, refs, max_n=1)
    assert out["Bleu_1"] == pytest.approx(3 / 4)


def test_bleu_clipping():
    # "the the the" vs "the cat": clipped unigram count = 1
    cands = [["the", "the", "the"]]
    refs = [["the", "cat"]]
    out = corpus_bleu(cands, refs, max_n=1)
    bp = math.exp(1 - 2 / 3) if 3 < 2 else 1.0
    assert out["Bleu_1"] == pytest.approx(1 / 3)


def test_bleu_brevity_penalty():
    cands = [["the"]]
    refs = [["the", "cat", "sat"]]
    out = corpus_bleu(cands, refs, max_n=1)
    assert out["Bleu_1"] == pytest.approx(math.exp(1 - 3 / 1) * 1.0)


def test_cider_identity_beats_mismatch():
    refs = [
        ["the", "cat", "sat", "on", "the", "mat"],
        ["a", "dog", "ran", "in", "the", "park"],
        ["birds", "fly", "over", "the", "trees"],
    ]
    perfect = cider_d(refs, refs)
    wrong = cider_d([["completely", "unrelated", "words"]] * 3, refs)
    assert perfect > wrong
    assert wrong < 1.0
    assert perfect > 1.0  # x10 scaling makes identity scores sizeable


def test_language_eval_entry_format():
    preds = [
        {"prediction": "the cat sat", "actual": "the cat sat"},
        {"prediction": "dog ran", "actual": "a dog ran fast"},
    ]
    out = language_eval(preds)
    assert set(out) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "CIDEr"}
    assert 0 <= out["Bleu_1"] <= 1
