"""bench_baseline.json merge-max policy (utils/torch_cpu_baseline CLI):
each torch_cpu_* key keeps the HIGHEST rate ever measured, and a kept
rate's companion metadata (batch_size/iters/notes) must be kept WITH it —
the round-3 ADVICE finding was metadata describing a different run than
the one that produced the number."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(out_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [
            sys.executable, "-m", "novel_vqa_tpu.utils.torch_cpu_baseline",
            "--batch_size", "2", "--iters", "1",
            "--skip_fc7", "--skip_text_ae", "--out", str(out_path),
        ],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=600,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_merge_max_keeps_better_prior_with_its_metadata(tmp_path):
    out = tmp_path / "bench_baseline.json"
    prior = {
        "torch_cpu_qa_pairs_per_sec": 1e12,  # unbeatable
        "batch_size": 999, "iters": 7, "note": "PRIOR RUN",
        "torch_cpu_fc7_images_per_sec": 123.0, "fc7_note": "PRIOR FC7",
    }
    out.write_text(json.dumps(prior))
    measured = run_cli(out)
    merged = json.loads(out.read_text())
    # the better prior rate survives WITH its companion metadata
    assert merged["torch_cpu_qa_pairs_per_sec"] == 1e12
    assert merged["batch_size"] == 999 and merged["iters"] == 7
    assert merged["note"] == "PRIOR RUN"
    # keys a skipped run didn't produce survive untouched
    assert merged["torch_cpu_fc7_images_per_sec"] == 123.0
    assert merged["fc7_note"] == "PRIOR FC7"
    assert "policy_note" in merged
    assert measured["torch_cpu_qa_pairs_per_sec"] < 1e12


@pytest.mark.slow
def test_merge_max_replaces_worse_prior_and_its_metadata(tmp_path):
    out = tmp_path / "bench_baseline.json"
    out.write_text(json.dumps({
        "torch_cpu_qa_pairs_per_sec": 1e-9,  # always beaten
        "batch_size": 999, "iters": 7, "note": "PRIOR RUN",
    }))
    measured = run_cli(out)
    merged = json.loads(out.read_text())
    assert merged["torch_cpu_qa_pairs_per_sec"] == measured["torch_cpu_qa_pairs_per_sec"] > 1e-9
    # the new rate brings its OWN metadata
    assert merged["batch_size"] == 2 and merged["iters"] == 1
    assert merged["note"] != "PRIOR RUN"
