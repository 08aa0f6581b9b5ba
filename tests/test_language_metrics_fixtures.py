"""Hand-computed fixtures for eval/language_metrics.py (VERDICT round-1
item 9): pin corpus BLEU-1..4 and CIDEr-D against values worked out by hand
from the published definitions (Papineni et al. 2002; Vedantam et al. 2015),
since the reference's coco-caption shell-out (misc/net_utils.lua:326-334) is
unavailable offline and these metrics gate --language_eval best-checkpoint
selection.
"""

import math

import pytest

from novel_vqa_tpu.eval.language_metrics import cider_d, corpus_bleu, language_eval


def test_bleu_perfect_match():
    c = [["a", "b", "c", "d"], ["x", "y", "z", "w", "v"]]
    out = corpus_bleu(c, [list(s) for s in c])
    for n in range(1, 5):
        assert out[f"Bleu_{n}"] == pytest.approx(1.0)


def test_bleu_clipping_papineni_example():
    """The classic degenerate candidate from the BLEU paper: 'the' x 7
    against 'the cat is on the mat' — unigram precision must CLIP to 2/7."""
    out = corpus_bleu([["the"] * 7], [["the", "cat", "is", "on", "the", "mat"]])
    assert out["Bleu_1"] == pytest.approx(2.0 / 7.0)


def test_bleu_bigram_geometric_mean():
    # cand "a b c" vs ref "a b d": p1 = 2/3; bigrams {ab, bc} clip to {ab} ->
    # p2 = 1/2; equal lengths -> BP = 1; Bleu_2 = sqrt(p1 * p2)
    out = corpus_bleu([["a", "b", "c"]], [["a", "b", "d"]])
    assert out["Bleu_1"] == pytest.approx(2.0 / 3.0)
    assert out["Bleu_2"] == pytest.approx(math.sqrt((2.0 / 3.0) * 0.5))


def test_bleu_brevity_penalty():
    # cand "a b" (len 2) vs ref "a b c d" (len 4): p1 = 1, BP = exp(1 - 4/2)
    out = corpus_bleu([["a", "b"]], [["a", "b", "c", "d"]])
    assert out["Bleu_1"] == pytest.approx(math.exp(-1.0))


def test_bleu_corpus_level_pooling():
    """BLEU pools clipped counts over the corpus BEFORE dividing (it is not
    a mean of per-sentence scores): two candidates with p1 = 2/2 and 1/3
    pool to 3/5."""
    out = corpus_bleu(
        [["a", "b"], ["x", "q", "r"]],
        [["a", "b"], ["x", "y", "z"]],
    )
    assert out["Bleu_1"] == pytest.approx(3.0 / 5.0)


def test_cider_identical_two_sentence_corpus():
    """refs r1='a b', r2='c d' (distinct, so every n-gram has df=1 and
    idf=log 2 > 0); candidates equal their references.  Unigram and bigram
    cosines are exactly 1, 3/4-gram vectors are empty for length-2
    sentences, length penalty 1 -> per-sentence 10*(1+1+0+0)/4 = 5."""
    c = [["a", "b"], ["c", "d"]]
    assert cider_d(c, [list(s) for s in c]) == pytest.approx(5.0)


def test_cider_partial_overlap_hand_computed():
    """c2='c e' vs r2='c d' in the same 2-document corpus: at n=1 the only
    shared unigram is 'c' with weight log2 on both sides ('e' is unseen in
    the refs and gets idf=log m=log 2 too), so
    cos = (log2)^2 / (sqrt(2)log2 * sqrt(2)log2) = 1/2; no shared bigram.
    Sentence scores: 10*(1+1)/4 = 5 and 10*(1/2)/4 = 1.25 -> mean 3.125."""
    score = cider_d([["a", "b"], ["c", "e"]], [["a", "b"], ["c", "d"]])
    assert score == pytest.approx(3.125, rel=1e-9)


def test_cider_disjoint_is_zero():
    score = cider_d([["p", "q"], ["r", "s"]], [["a", "b"], ["c", "d"]])
    assert score == pytest.approx(0.0)


def test_cider_length_penalty():
    """Same corpus as the identical case but candidate c1 has one extra
    token: delta=1 applies exp(-1/(2*36)) to every n-level of sentence 1.
    n=1 for c1='a b x': shared {a,b} -> num = 2(log2)^2, cn = sqrt(3)log2
    ('x' unseen -> idf = log m), rn = sqrt(2)log2 -> cos = 2/sqrt(6);
    n=2: bigrams {ab, bx} share {ab} -> num=(log2)^2, cn=sqrt(2)log2,
    rn=log2 -> cos = 1/sqrt(2); n=3 empty for the length-2 ref -> rn=0 -> 0.
    s1 = 10 * pen * (2/sqrt(6) + 1/sqrt(2))/4, s2 = 5 (identical pair)."""
    pen = math.exp(-1.0 / 72.0)
    s1 = 10.0 * pen * (2.0 / math.sqrt(6.0) + 1.0 / math.sqrt(2.0)) / 4.0
    expected = (s1 + 5.0) / 2.0
    score = cider_d([["a", "b", "x"], ["c", "d"]], [["a", "b"], ["c", "d"]])
    assert score == pytest.approx(expected, rel=1e-9)


def test_language_eval_entry_structure():
    preds = [
        {"prediction": "a b", "actual": "a b"},
        {"prediction": "c d", "actual": "c d"},
    ]
    out = language_eval(preds)
    assert out["Bleu_1"] == pytest.approx(1.0)
    assert out["CIDEr"] == pytest.approx(5.0)
