"""Utility-layer tests: infolog, metrics writer, plots (SURVEY.md §5)."""

import json
import os

import numpy as np

from tacotron_multispeaker_tpu.utils import infolog, plot
from tacotron_multispeaker_tpu.utils.metrics import MetricsWriter


def test_infolog_writes_file(tmp_path):
    logf = str(tmp_path / "train.log")
    infolog.init(logf, "testrun")
    infolog.log("hello world")
    infolog._close_logfile()
    text = open(logf).read()
    assert "Starting new training run of testrun" in text
    assert "hello world" in text


def test_infolog_webhook_failure_is_swallowed(tmp_path):
    logf = str(tmp_path / "train.log")
    infolog.init(logf, "testrun", webhook_url="http://127.0.0.1:1/bad")
    infolog.log("msg", slack=True)  # must not raise
    infolog._close_logfile()


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.scalars(1, {"loss": 1.5})
    w.scalars(2, {"loss": 1.25, "lr": 0.01})
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 1.5
    assert lines[1]["lr"] == 0.01


def test_plot_alignment_and_spectrogram(tmp_path):
    a = np.random.rand(20, 30)
    p1 = str(tmp_path / "align.png")
    plot.plot_alignment(a, p1, info="test")
    assert os.path.getsize(p1) > 1000
    s = np.random.rand(100, 80)
    p2 = str(tmp_path / "spec.png")
    plot.plot_spectrogram(s, p2)
    assert os.path.getsize(p2) > 1000
