"""Pipeline orchestrator: dry-run plan, skip-on-existing-output semantics,
and a real two-stage chain."""

import json
import os

import pytest

from novel_vqa_tpu.pipeline import run_all


def test_print_example_config(capsys):
    run_all.main(["--print_example_config"])
    out = capsys.readouterr().out
    cfg = json.loads(out)
    assert "train_vqa_arch1" in cfg


def test_dry_run_and_skip(tmp_path, capsys):
    existing = tmp_path / "done.h5"
    existing.write_text("x")
    cfg = {
        "prepro_book_corpus": {"args": ["--whatever"], "output": str(existing)},
        "convert_ae": {"args": [], "output": str(tmp_path / "missing.h5")},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    run_all.main(["--config", str(cfg_path), "--dry_run"])
    out = capsys.readouterr().out
    assert "SKIP — output exists" in out
    assert "python -m novel_vqa_tpu.train.convert_ae" in out


def test_unknown_stage_rejected(tmp_path):
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({"not_a_stage": {"args": []}}))
    with pytest.raises(ValueError, match="unknown stages"):
        run_all.main(["--config", str(cfg_path), "--dry_run"])


def test_real_two_stage_chain(tmp_path, monkeypatch):
    """corpus prepro -> AE training driven through the orchestrator."""
    monkeypatch.chdir(tmp_path)
    corpus = tmp_path / "c.txt"
    corpus.write_text("\n".join(["the cat sat", "a dog ran", "birds fly high"] * 10) + "\n")
    cfg = {
        "prepro_book_corpus": {
            "args": ["--corpus", str(corpus), "--output_h5", "data.h5",
                     "--output_json", "data.json", "--num_val", "4",
                     "--num_test", "4", "--word_count_threshold", "0",
                     "--max_length", "4"],
            "output": "data.h5",
        },
        "train_text_ae": {
            "args": ["--input_h5", "data.h5", "--input_json", "data.json",
                     "--rnn_size", "8", "--input_encoding_size", "6",
                     "--batch_size", "8", "--max_iters", "4",
                     "--save_checkpoint_every", "3", "--val_sentences_use", "4",
                     "--losses_log_every", "2", "--checkpoint_path", "."],
            "output": "model_id.npz",
        },
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    run_all.main(["--config", str(cfg_path)])
    assert os.path.exists("model_id.npz")
    # second invocation skips both stages
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_all.main(["--config", str(cfg_path)])
    assert buf.getvalue().count("SKIP") == 2
