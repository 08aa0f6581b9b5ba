"""Bit-exactness fuzz: our evaluator's normalization vs the reference's own
source code.

Python 2 is unavailable, but ``processPunctuation`` and
``processDigitArticle`` (vqaEval.py:131-156) are syntactically valid
Python 3; this test extracts those two methods VERBATIM from the read-only
reference source, executes them against the same extracted tables, and
fuzz-compares outputs with our port on thousands of adversarial strings
(punctuation clusters, digit commas, periods, typographic apostrophes,
contraction keys).  Any divergence is a parity bug by definition.
"""

import json
import os
import random
import re

import pytest

REF_EVAL = "/root/reference/004_vqa_evaluation/PythonEvaluationTools/vqaEvaluation/vqaEval.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_EVAL), reason="reference mirror not mounted"
)


def build_reference_normalizer():
    src = open(REF_EVAL, "rb").read().decode("utf-8")

    # the two methods, verbatim (tab-indented class body)
    start = src.index("\tdef processPunctuation")
    end = src.index("\tdef setAccuracy")
    methods_src = src[start:end]
    # dedent one tab level so the defs are module-level
    methods_src = "\n".join(
        line[1:] if line.startswith("\t") else line
        for line in methods_src.splitlines()
    )

    ns = {"re": re}
    exec(methods_src, ns)  # noqa: S102 - executing the read-only reference source

    tables_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "novel_vqa_tpu", "eval", "normalization_tables.json",
    )
    with open(tables_path) as f:
        tables = json.load(f)

    class RefNorm:
        contractions = tables["contractions"]
        manualMap = dict(tables["manualMap"])
        articles = tables["articles"]
        punct = tables["punct"]
        periodStrip = re.compile("(?!<=\\d)(\\.)(?!\\d)")
        commaStrip = re.compile("(\\d)(\\,)(\\d)")
        processPunctuation = ns["processPunctuation"]
        processDigitArticle = ns["processDigitArticle"]

    return RefNorm()


def fuzz_strings(n=4000, seed=0):
    rng = random.Random(seed)
    words = [
        "cat", "dogs", "one", "two", "ten", "a", "an", "the", "couldnt",
        "doesnt", "whats", "yall", "none", "u.s.a", "1.50", "1,000", "red",
        "no", "yes", "skate board", "dont",
    ]
    puncts = [";", "/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\",
              "_", "-", ">", "<", "@", "`", ",", "?", "!", ".", "’", "'"]
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(1, 6)):
            r = rng.random()
            if r < 0.5:
                parts.append(rng.choice(words))
            elif r < 0.8:
                parts.append(rng.choice(puncts))
            else:
                parts.append(str(rng.randint(0, 9999)))
        sep = rng.choice(["", " ", "  "])
        out.append(sep.join(parts))
    # targeted cases
    out += [
        "1,000,000.", "a.b.c", ";;;", "st. mary's", "it's 1.5%", "’twas",
        "couldn’t’ve happened", "one, two and three", "10.", ".5", "a; b",
        "", " ", "no-one", "semi-truck", "3.", "weve got it",
        # the re.UNICODE-as-count quirk caps period removal at 32
        "." * 50, "a." * 40, "x. " * 35,
    ]
    return out


def test_normalization_bitexact_fuzz():
    from novel_vqa_tpu.eval.vqa_eval import VQAEval

    ref = build_reference_normalizer()
    ours = VQAEval()
    mismatches = []
    for s in fuzz_strings():
        r1 = ref.processPunctuation(s)
        o1 = ours.processPunctuation(s)
        if r1 != o1:
            mismatches.append(("punct", s, r1, o1))
            continue
        r2 = ref.processDigitArticle(r1)
        o2 = ours.processDigitArticle(o1)
        if r2 != o2:
            mismatches.append(("digit", s, r2, o2))
    assert not mismatches, mismatches[:10]


REF_STATS = "/root/reference/000_create_dataset/001_create_novel_statistics.py"


def test_question_type_bitexact_fuzz():
    """get_question_type vs the reference's getQuestionType executed verbatim
    (001_create_novel_statistics.py:47-63 — py3-valid syntax)."""
    src = open(REF_STATS, "rb").read().decode("utf-8")
    start = src.index("def getQuestionType")
    end = src.index("# Prints the statistics")
    ns = {}
    exec(src[start:end], ns)  # noqa: S102 - read-only reference source
    ref_fn = ns["getQuestionType"]

    from novel_vqa_tpu.pipeline.novel_split import get_question_type, load_question_types

    q_types = load_question_types(
        "/root/reference/004_vqa_evaluation/QuestionTypes/mscoco_question_types.txt"
    )
    rng = random.Random(1)
    vocab = ["what", "is", "the", "color", "of", "a", "this", "how", "many",
             "are", "there", "does", "do", "you", "can", "cat", "red", "why"]
    for _ in range(2000):
        q = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
        assert get_question_type(q, q_types) == ref_fn(q, q_types), q


REF_LOOKUP = "/root/reference/005_correction_to_dataset/002_create_img_lookup.py"


def test_img_lookup_bitexact():
    """run_img_lookup vs the reference's loop logic (002_create_img_lookup.py
    is fully py3-valid) on an overlap-heavy image list."""
    src = open(REF_LOOKUP, "rb").read().decode("utf-8")
    # strip the argparse/IO head and json dump tail; keep the loop body
    start = src.index("lookup_dict = {}")
    end = src.index("json.dump")
    body = src[start:end]

    original = {
        "unique_img_train": ["a.jpg", "b.jpg", "c.jpg"],
        "unique_img_val": ["b.jpg", "d.jpg"],
        "unique_img_test": ["a.jpg", "e.jpg", "d.jpg"],
    }

    import json as _json
    import tempfile

    from novel_vqa_tpu.pipeline import correction

    with tempfile.TemporaryDirectory() as d:
        src_path = os.path.join(d, "orig.json")
        out_path = os.path.join(d, "lookup.json")
        with open(src_path, "w") as f:
            _json.dump(original, f)

        # the extracted body re-loads the json itself (params['original_json'])
        ns = {"json": _json, "params": {"original_json": src_path}}
        exec(body, ns)  # noqa: S102 - read-only reference source
        ref_lookup = ns["lookup_dict"]

        correction.cli(["img-lookup", "--original_json", src_path, "--save_path", out_path])
        ours = _json.load(open(out_path))
    assert ours == ref_lookup
