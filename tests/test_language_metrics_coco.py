"""Validation of eval/language_metrics.py against the coco-caption algorithm.

The reference shells out to the coco-caption toolkit
(/root/reference/001_train_autoencoder/misc/net_utils.lua:326-334) whose
scorers are published (tylin/coco-caption, pycocoevalcap/{bleu/bleu_scorer.py,
cider/cider_scorer.py}).  coco-caption itself is unavailable offline, so this
file re-derives those published algorithms — hand-executed, from the paper +
repository semantics — as an INDEPENDENT oracle and checks our implementation
against it on fuzzed corpora plus hand-computed literal cases.

Oracle fidelity notes (what the published code computes):

  * BLEU (bleu_scorer.py): corpus-level cumulative geometric mean of modified
    n-gram precisions, smoothed as (correct + tiny)/(guess + small) with
    tiny=1e-15, small=1e-9; brevity penalty exp(1 - 1/ratio) applied to every
    Bleu_n when ratio = testlen/reflen < 1 (option "closest"; with a single
    reference the closest length is that reference's length).
  * CIDEr (cider_scorer.py): despite the module name this is CIDEr-D — the
    repository's sim() carries the "added clipping" min(hyp, ref) * ref and
    the "added a length based gaussian penalty" exp(-delta^2/(2*sigma^2)),
    sigma=6.  Vectors are tf * (log(m) - log(max(1, df))) per n-gram with df
    counted once per image over its reference set; per-n cosine against the
    reference vector, averaged over n=1..4, scaled x10.

Tokenization domain note: coco-caption tokenizes with Stanford PTBTokenizer
(lowercase + punctuation-token removal).  The AE pipeline's strings are
already lowercased, ASCII-only, punctuation-stripped vocabulary words joined
by single spaces (pipeline/tokenize.prepro_sentence_ascii +
net_utils.decode_sequence), so on this input domain PTB tokenization reduces
to whitespace splitting — PTB's special casing (clitics, hyphens, bracket
transcription, punctuation removal) can only fire on characters that the
prepro already removed.  language_metrics therefore splits on whitespace;
test_whitespace_equals_ptb_on_prepro_domain pins the domain property.
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import numpy as np
import pytest

from novel_vqa_tpu.eval.language_metrics import cider_d, corpus_bleu, language_eval


# ---------------------------------------------------------------- oracles


def _ngrams(tokens, n):
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def coco_bleu_oracle(cands, refs, max_n=4):
    """bleu_scorer.py semantics, single reference per candidate."""
    tiny, small = 1e-15, 1e-9
    correct = [0] * max_n
    guess = [0] * max_n
    testlen = sum(len(c) for c in cands)
    reflen = sum(len(r) for r in refs)  # "closest" == the only ref
    for c, r in zip(cands, refs):
        for n in range(1, max_n + 1):
            cg, rg = _ngrams(c, n), _ngrams(r, n)
            guess[n - 1] += max(0, len(c) - n + 1)
            correct[n - 1] += sum(min(cnt, rg[g]) for g, cnt in cg.items())
    out = {}
    ratio = (testlen + tiny) / (reflen + small)
    for k in range(max_n):
        bleu = 1.0
        for m in range(k + 1):
            bleu *= (correct[m] + tiny) / (guess[m] + small)
        bleu = bleu ** (1.0 / (k + 1))
        if ratio < 1:
            bleu *= math.exp(1 - 1 / ratio)
        out[f"Bleu_{k + 1}"] = bleu
    return out


def coco_cider_oracle(cands, refs, max_n=4, sigma=6.0):
    """cider_scorer.py semantics (the CIDEr-D variant the repo ships),
    single reference per candidate."""
    m = len(refs)
    log_m = math.log(float(m))
    doc_freq = defaultdict(int)
    for r in refs:
        seen = set()
        for n in range(1, max_n + 1):
            seen |= set(_ngrams(r, n))
        for g in seen:
            doc_freq[g] += 1

    def counts2vec(tokens):
        vec = [defaultdict(float) for _ in range(max_n)]
        norm = [0.0] * max_n
        for n in range(1, max_n + 1):
            for g, tf in _ngrams(tokens, n).items():
                df = math.log(max(1.0, doc_freq[g]))
                vec[n - 1][g] = tf * (log_m - df)
                norm[n - 1] += vec[n - 1][g] ** 2
        return vec, [math.sqrt(x) for x in norm]

    scores = []
    for c, r in zip(cands, refs):
        cv, cn = counts2vec(c)
        rv, rn = counts2vec(r)
        delta = float(len(c) - len(r))  # == bigram-count delta, the repo quirk
        val = 0.0
        for n in range(max_n):
            s = sum(min(w, rv[n][g]) * rv[n][g] for g, w in cv[n].items())
            if cn[n] != 0 and rn[n] != 0:
                s /= cn[n] * rn[n]
            val += s * math.exp(-(delta**2) / (2 * sigma**2))
        scores.append(10.0 * val / max_n)
    return sum(scores) / len(scores)


# ------------------------------------------------------------------ tests


def _random_corpus(rng, n_pairs, vocab, min_len=1, max_len=12, overlap=0.7):
    cands, refs = [], []
    for _ in range(n_pairs):
        L = rng.randint(min_len, max_len)
        ref = [rng.choice(vocab) for _ in range(L)]
        cand = [
            w if rng.random() < overlap else rng.choice(vocab)
            for w in ref
        ]
        if rng.random() < 0.3:  # length mismatch branch
            cand = cand[: max(1, L - rng.randint(1, 3))]
        cands.append(cand)
        refs.append(ref)
    return cands, refs


def test_bleu_matches_coco_oracle_fuzz():
    rng = random.Random(123)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(20):
        cands, refs = _random_corpus(rng, rng.randint(2, 12), vocab)
        ours = corpus_bleu(cands, refs)
        oracle = coco_bleu_oracle(cands, refs)
        for n in range(1, 5):
            assert ours[f"Bleu_{n}"] == pytest.approx(
                oracle[f"Bleu_{n}"], rel=1e-9, abs=1e-12
            ), (trial, n, cands, refs)


def test_cider_matches_coco_oracle_fuzz():
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(25)]
    for trial in range(20):
        cands, refs = _random_corpus(rng, rng.randint(2, 12), vocab)
        ours = cider_d(cands, refs)
        oracle = coco_cider_oracle(cands, refs)
        assert ours == pytest.approx(oracle, rel=1e-9, abs=1e-12), (
            trial, cands, refs,
        )


def test_hand_computed_literals():
    """Two fully hand-executed cases through the coco-caption formulas."""
    # perfect single-pair reconstruction: every precision 1, BP 1, and
    # CIDEr-D = 10 * mean over n of cos-sim 1 * gaussian(0)... BUT with m=1
    # document, idf = log(1) - log(max(1,df)) = 0, so every tf-idf vector is
    # all-zero, norms are 0, sim contributes 0 => CIDEr 0.  (The division is
    # guarded by the norm != 0 check in the repo; so is ours.)
    cands = [["a", "red", "car", "parked"]]
    refs = [["a", "red", "car", "parked"]]
    b = corpus_bleu(cands, refs)
    for n in range(1, 5):
        assert b[f"Bleu_{n}"] == pytest.approx(1.0, rel=1e-6)
    assert cider_d(cands, refs) == pytest.approx(0.0, abs=1e-12)

    # two pairs, hand-computed BLEU-1/2:
    #   pair 1: cand "the cat sat", ref "the cat sat"      (3/3 uni, 2/2 bi)
    #   pair 2: cand "a dog",       ref "a big dog"        (2/2 uni, 0/1 bi)
    # corpus: uni 5/5 = 1; bi 2/3; testlen 5, reflen 6 -> BP = exp(1 - 6/5)
    cands = [["the", "cat", "sat"], ["a", "dog"]]
    refs = [["the", "cat", "sat"], ["a", "big", "dog"]]
    bp = math.exp(1 - 6 / 5)
    b = corpus_bleu(cands, refs)
    assert b["Bleu_1"] == pytest.approx(bp * 1.0, rel=1e-6)
    assert b["Bleu_2"] == pytest.approx(bp * math.sqrt(1.0 * 2 / 3), rel=1e-6)
    # CIDEr hand-execution, m=2 documents, log_m = log 2:
    #   df: every n-gram occurs in exactly one ref -> idf = log 2 for all.
    #   pair 1 (identical, len delta 0): cos = 1 for n=1,2; n=3: cand tri
    #     "the cat sat" matches ref -> 1; n=4: no 4-grams -> norms 0 -> 0.
    #     -> (1+1+1+0)/4 * 10 = 7.5
    #   pair 2: delta = -1, gaussian g = exp(-1/72).
    #     n=1: cand vec {a, dog}, ref {a, big, dog}; num = 2*(log2)^2,
    #       norms sqrt(2)*log2, sqrt(3)*log2 -> cos = 2/sqrt(6)
    #     n=2: cand {"a dog"}, ref {"a big","big dog"}: no overlap -> 0
    #     n=3,4: cand has no 3-grams (len 2) -> 0
    #     -> 10 * g * (2/sqrt(6)) / 4
    g = math.exp(-1 / 72)
    expected = (7.5 + 10 * g * (2 / math.sqrt(6)) / 4) / 2
    assert cider_d(cands, refs) == pytest.approx(expected, rel=1e-9)
    oracle = coco_cider_oracle(cands, refs)
    assert oracle == pytest.approx(expected, rel=1e-9)


def test_whitespace_equals_ptb_on_prepro_domain():
    """On the AE pipeline's domain — lowercase, ASCII, punctuation-stripped
    vocabulary words joined by single spaces — whitespace splitting is
    exactly what PTBTokenizer would produce: every PTB special case needs a
    character class (punctuation, apostrophes, brackets, uppercase) that the
    prepro removed.  Pin the domain property itself."""
    import string

    from novel_vqa_tpu.pipeline.tokenize import prepro_sentence_ascii

    raw = "The man's RED-ish car, costs $1,000 (really)! café ok?"
    toks = prepro_sentence_ascii(raw)
    joined = " ".join(toks)
    # the decoded-sample strings contain no PTB-active characters
    assert not any(ch in string.punctuation for ch in joined)
    assert joined == joined.lower()
    assert joined.encode("ascii", "ignore").decode() == joined
    # so whitespace-split round-trips exactly
    assert joined.split() == toks
    # and language_eval scores the identical reconstruction at BLEU 1.0
    preds = [{"prediction": joined, "actual": joined}]
    out = language_eval(preds)
    assert out["Bleu_1"] == pytest.approx(1.0, rel=1e-6)
