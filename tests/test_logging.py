"""core/logging.py: the reference's observable logging surface
(002_train_baseline.lua:330-334 EMA, :389-407 logFile/logFileVal) plus the
structured JSONL stream."""

import json
import os

from novel_vqa_tpu.core.logging import EMA, MetricsLogger


def test_ema_matches_reference_recurrence():
    # running_avg = 0.95*running_avg + 0.05*loss, seeded with the first loss
    ema = EMA()
    assert ema.update(10.0) == 10.0
    assert abs(ema.update(0.0) - 9.5) < 1e-12
    assert abs(ema.update(2.0) - (0.95 * 9.5 + 0.05 * 2.0)) < 1e-12


def test_metrics_logger_files(tmp_path, capsys):
    log = MetricsLogger(str(tmp_path), run_name="t")
    log.log_train(100, 1000, 3.25, lr=1e-3)
    log.log_val(100, 1000, 2.5, 2.75)
    log.close()

    txt = (tmp_path / "logFile.txt").read_text()
    assert txt == "training loss: 3.25\ton iter: 100/1000\n"
    val = (tmp_path / "logFileVal.txt").read_text()
    assert val == "validation loss: 2.5 validation loss avg: 2.75 on iter: 100/1000\n"
    recs = [json.loads(l) for l in (tmp_path / "t_metrics.jsonl").read_text().splitlines()]
    assert recs[0]["kind"] == "train" and recs[0]["loss_ema"] == 3.25
    assert recs[0]["lr"] == 1e-3 and "t" in recs[0]
    assert recs[1]["kind"] == "val" and recs[1]["loss"] == 2.5
    out = capsys.readouterr().out
    assert "training loss" in out and "validation loss" in out
