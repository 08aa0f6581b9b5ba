"""Aux subsystems: quality-audit CLI, prefetch, profiling timer."""

import json

import numpy as np

from novel_vqa_tpu.core.profiling import StepTimer, nan_guard, trace
from novel_vqa_tpu.data.prefetch import prefetch_to_device


def test_quality_eval_pipeline(tmp_path):
    from novel_vqa_tpu.pipeline import quality_eval

    train = [
        {"ques_id": 1, "question": "what is the dog doing", "img_path": "a"},
        {"ques_id": 2, "question": "what is the cat doing", "img_path": "b"},
    ]
    test = [{"ques_id": 3, "question": "is this a guitar", "img_path": "c"}]
    anns = {
        "annotations": [
            {"question_id": 1, "answers": [{"answer": "running"}]},
            # "men" = irregular plural of the novel noun "man" -> a
            # pluralized leak the NN tagger can still see (regular plurals
            # tag as NNS and are invisible to the reference check too)
            {"question_id": 2, "answers": [{"answer": "men"}]},
        ]
    }
    anns_test = {"annotations": [{"question_id": 3, "answers": [{"answer": "yes"}]}]}
    (tmp_path / "train.json").write_text(json.dumps(train))
    (tmp_path / "test.json").write_text(json.dumps(test))
    (tmp_path / "ann_train.json").write_text(json.dumps(anns))
    (tmp_path / "ann_test.json").write_text(json.dumps(anns_test))
    (tmp_path / "trainNouns.json").write_text(json.dumps(["dog"]))
    (tmp_path / "testNouns.json").write_text(json.dumps(["cat", "guitar", "man"]))

    save = str(tmp_path / "pre") + "/"
    quality_eval.main(
        [
            "nouns",
            "--input_train_json", str(tmp_path / "train.json"),
            "--input_test_json", str(tmp_path / "test.json"),
            "--input_train_annotations", str(tmp_path / "ann_train.json"),
            "--input_test_annotations", str(tmp_path / "ann_test.json"),
            "--save_path", save,
            "--tagger", "heuristic",
        ]
    )
    nouns = json.load(open(save + "nouns_vqa.json"))
    assert "dog" in nouns["nouns_train"] and "cat" in nouns["nouns_train"]

    result = quality_eval.main(
        [
            "overlap",
            "--save_path", save,
            "--train_nouns", str(tmp_path / "trainNouns.json"),
            "--test_nouns", str(tmp_path / "testNouns.json"),
        ]
    )
    assert "cat" in result["novel_in_train"]  # leaked novel noun detected
    assert "men" in result["plural_in_train"]  # pluralized leak detected

    quality_eval.main(
        [
            "sizes",
            "--raw_train_path", str(tmp_path / "train.json"),
            "--raw_test_path", str(tmp_path / "test.json"),
        ]
    )


def test_prefetch_to_device():
    batches = [{"x": np.full((2, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_step_timer_and_guards(tmp_path):
    t = StepTimer()
    t.tick(100)
    t.tick(100)
    assert t.rate() > 0
    with trace(None):
        pass
    with nan_guard(False):
        pass
