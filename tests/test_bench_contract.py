"""The driver contract of bench.py: exactly one JSON line, headline first,
extras bounded by the time budget and never fatal."""
import json
import sys

import pytest


@pytest.fixture
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as bench_mod

    monkeypatch.setattr(bench_mod, "bench_pretrain", lambda *a, **k: 1300.0)
    monkeypatch.setattr(bench_mod, "bench_ctc",
                        lambda freeze, *a, **k: 3000.0 if freeze else 1800.0)
    monkeypatch.setattr(bench_mod, "bench_decode", lambda *a, **k: 4000.0)
    monkeypatch.setattr(bench_mod, "bench_seq2seq", lambda *a, **k: 1600.0)
    monkeypatch.setattr(bench_mod, "bench_hubert", lambda *a, **k: 1450.0)
    monkeypatch.setattr(bench_mod, "bench_transducer", lambda *a, **k: 1550.0)
    return bench_mod


def _run(bench, capsys, argv):
    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        bench.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    return json.loads(out[0])


def test_all_mode_headline_and_extras(bench, capsys):
    rec = _run(bench, capsys, [])
    assert rec["metric"] == "wav2vec2_base_pretrain_throughput"
    assert rec["value"] == 1300.0
    assert rec["vs_baseline"] == round(1300.0 / 650.0, 3)
    e = rec["extra_metrics"]
    assert e["ctc_finetune_throughput"] == 1800.0
    assert e["ctc_finetune_frozen_throughput"] == 3000.0
    assert e["greedy_decode_rtfx"] == 4000.0
    assert e["seq2seq_finetune_throughput"] == 1600.0
    assert e["hubert_pretrain_throughput"] == 1450.0
    assert e["transducer_finetune_throughput"] == 1550.0


def test_budget_skips_extras_but_keeps_headline(bench, capsys):
    rec = _run(bench, capsys, ["--budget", "-1"])
    assert rec["value"] == 1300.0
    assert all(v == "skipped:budget"
               for k, v in rec["extra_metrics"].items() if k != "ctc_unit")


def test_extra_failure_is_recorded_not_fatal(bench, capsys, monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("relay hiccup")

    monkeypatch.setattr(bench, "bench_decode", boom)
    rec = _run(bench, capsys, [])
    assert rec["value"] == 1300.0
    assert rec["extra_metrics"]["greedy_decode_rtfx"] == "error:RuntimeError"
    assert rec["extra_metrics"]["seq2seq_finetune_throughput"] == 1600.0


def test_single_workload_modes(bench, capsys):
    rec = _run(bench, capsys, ["--workload", "ctc"])
    assert rec["metric"] == "wav2vec2_base_ctc_finetune_throughput"
    assert rec["value"] == 1800.0
    rec = _run(bench, capsys, ["--workload", "decode"])
    assert rec["value"] == 4000.0
    rec = _run(bench, capsys, ["--workload", "seq2seq"])
    assert rec["value"] == 1600.0
    rec = _run(bench, capsys, ["--workload", "hubert"])
    assert rec["metric"] == "hubert_base_pretrain_throughput"
    assert rec["value"] == 1450.0
    rec = _run(bench, capsys, ["--workload", "transducer"])
    assert rec["metric"] == "wav2vec2_base_transducer_finetune_throughput"
    assert rec["value"] == 1550.0
