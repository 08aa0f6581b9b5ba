"""Smoke-test the real-dimension rehearsal tool (utils/rehearsal.py).

The rehearsal is the capacity/time validation path for the flagship
pipeline (docs/STATUS.md "Real-dimension rehearsal"); this pins the tool
itself — dataset generation at scaled novel_v2 dims with the frozen
vocabs, prepro, HBM-resident training, full-split eval, and the official
VQAEval incl. the novel subset — against regressions, at --scale 0.01 on
the CPU backend (the model runs at FULL size: 12,782-word vocab, 4096-d
fc7, 2x512 LSTM; only the data volume is scaled)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_rehearsal_smoke(tmp_path):
    env = dict(os.environ)
    # drop the axon sitecustomize so the inherited JAX_PLATFORMS=cpu takes
    # effect in the subprocess (same recipe as conftest/verify)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    report_path = tmp_path / "report.json"
    p = subprocess.run(
        [
            sys.executable, "-m", "novel_vqa_tpu.utils.rehearsal",
            "--work_dir", str(tmp_path / "work"),
            "--scale", "0.01",
            "--iters", "50",
            "--steps_per_dispatch", "25",
            "--batch_size", "100",
            "--extract_images", "0",  # skip the 224^2 vision segment (slow compile)
            "--report", str(report_path),
        ],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=1800,
    )
    assert p.returncode == 0, p.stderr[-3000:]

    report = json.loads(report_path.read_text())
    # scaled novel_v2 dims
    assert report["dims"]["train_questions"] == int(215_000 * 0.01)
    assert report["dims"]["test_questions"] == int(121_512 * 0.01)
    assert report["dims"]["fc7_store"]["train"] > 0
    # every stage ran and was timed
    for stage in ("gen_raw", "prepro_vqa", "gen_fc7_store",
                  "train_1k_iters", "eval_full_split", "vqa_eval", "total"):
        assert stage in report["wall_s"], stage
    # training produced the projection record; eval + VQAEval produced the
    # sanity accuracies (near-chance by construction, but present incl.
    # the novel subset)
    assert report["train"]["iters"] == 50
    assert report["train"]["projection_150k_iters_hours_incl_setup"] > 0
    assert report["accuracy_sanity"]["overall"] is not None
    assert report["accuracy_sanity"]["novel"] is not None
    # the result JSONs the eval stage writes (the VQAEval inputs)
    res = tmp_path / "work" / "result"
    assert (res / "OpenEnded_mscoco_val2014_lstm_novel_new_2_results.json").exists()
    assert (res / "MultipleChoice_mscoco_val2014_lstm_novel_new_2_results.json").exists()
