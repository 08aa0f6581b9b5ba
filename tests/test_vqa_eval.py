"""Golden cases for the bit-exact VQA evaluator port
(vqaEval.py normalization + accuracy formula)."""

import json

import pytest

from novel_vqa_tpu.eval.vqa_api import VQA
from novel_vqa_tpu.eval.vqa_eval import VQAEval


@pytest.fixture
def ev():
    return VQAEval()


def test_punctuation_semicolon_removed_or_spaced(ev):
    # p adjacent to a space -> removed entirely
    assert ev.processPunctuation("red; blue") == "red blue"
    # p embedded with no adjacent space -> replaced by space
    assert ev.processPunctuation("red;blue") == "red blue"


def test_punctuation_comma_in_number(ev):
    # commaStrip triggers total removal of punctuation
    assert ev.processPunctuation("1,000") == "1000"


def test_period_strip(ev):
    assert ev.processPunctuation("u.s.a") == "usa"
    # digits keep their decimal point (negative lookahead (?!\d))
    assert ev.processPunctuation("1.50") == "1.50"


def test_digit_article(ev):
    assert ev.processDigitArticle("a one and the two") == "1 and 2"
    assert ev.processDigitArticle("none") == "0"


def test_contractions_typographic(ev):
    # the table maps "couldnt" -> ASCII "couldn't" but "doesnt" -> the
    # typographic "doesn’t" (vqaEval.py:20-41, preserved verbatim)
    assert ev.processDigitArticle("couldnt") == "couldn't"
    assert ev.processDigitArticle("doesnt") == "doesn’t"


def make_dataset(tmp_path, answers_per_q, results, task_type="Open-Ended"):
    ann = {
        "info": {},
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "annotations": [
            {
                "question_id": qid,
                "image_id": 100 + qid,
                "question_type": "what is",
                "answer_type": "other",
                "multiple_choice_answer": answers[0],
                "answers": [
                    {"answer": a, "answer_confidence": "yes", "answer_id": i + 1}
                    for i, a in enumerate(answers)
                ],
            }
            for qid, answers in answers_per_q.items()
        ],
    }
    ques = {
        "info": {},
        "task_type": task_type,
        "data_type": "mscoco",
        "data_subtype": "val2014",
        "license": {},
        "questions": [
            {"question_id": qid, "image_id": 100 + qid, "question": "what is this?"}
            for qid in answers_per_q
        ],
    }
    res = [{"question_id": qid, "answer": a} for qid, a in results.items()]
    ap, qp, rp = tmp_path / "ann.json", tmp_path / "q.json", tmp_path / "res.json"
    ap.write_text(json.dumps(ann))
    qp.write_text(json.dumps(ques))
    rp.write_text(json.dumps(res))
    return str(ap), str(qp), str(rp)


def test_accuracy_formula(tmp_path):
    """min(1, matches/3) leave-one-out over 10 answers (vqaEval.py:99-103)."""
    answers = {
        1: ["cat"] * 10,                      # perfect match -> 100
        2: ["cat"] * 3 + ["dog"] * 7,         # "cat": 3 matches in 9 of 10 folds
        3: ["dog"] * 10,                      # wrong -> 0
    }
    results = {1: "cat", 2: "cat", 3: "cat"}
    ap, qp, rp = make_dataset(tmp_path, answers, results)
    vqa = VQA(ap, qp)
    res = vqa.loadRes(rp, qp)
    ev = VQAEval(vqa, res, n=2)
    ev.evaluate()
    assert ev.evalQA[1] == 100.0
    # qid 2: 3 folds leave out a "cat" (2 matching remain -> 2/3), 7 folds
    # leave out a "dog" (3 matching -> 1.0); avg = (3*(2/3) + 7*1)/10 = 0.9
    assert ev.evalQA[2] == 90.0
    assert ev.evalQA[3] == 0.0
    assert ev.accuracy["overall"] == round(100 * (1 + 0.9 + 0) / 3, 2)
    assert ev.accuracy["perAnswerType"]["other"] == ev.accuracy["overall"]


def test_loadres_asserts_qid_set(tmp_path):
    answers = {1: ["cat"] * 10}
    results = {2: "cat"}  # wrong qid
    ap, qp, rp = make_dataset(tmp_path, answers, results)
    vqa = VQA(ap, qp)
    with pytest.raises(AssertionError):
        vqa.loadRes(rp, qp)


def test_subset_evaluation_with_mutated_gts(tmp_path):
    """Second evaluate() on a subset must work on the in-place-normalized gt
    answers (the novel-subset pass, evaluate_openended_novel.py:47)."""
    answers = {
        1: ["cat!"] * 5 + ["dog"] * 5,
        2: ["bird"] * 10,
    }
    results = {1: "cat!", 2: "bird"}
    ap, qp, rp = make_dataset(tmp_path, answers, results)
    vqa = VQA(ap, qp)
    res = vqa.loadRes(rp, qp)
    ev = VQAEval(vqa, res, n=2)
    ev.evaluate()
    full = ev.accuracy["overall"]
    ev.evaluate([1])
    subset = ev.accuracy["overall"]
    assert 0 <= subset <= 100 and 0 <= full <= 100
