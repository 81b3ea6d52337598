"""End-to-end run of the real-checkpoint parity harness on a synthetic
fairseq .pt: conversion must consume every key, per-layer activation
deltas must be at float-noise level, and the JAX eval pipeline's greedy
WER/CER must equal the torch replica's on identical audio."""
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.mark.slow
def test_parity_harness_synthetic(tmp_path):
    from tools.parity_eval import main

    out = tmp_path / "report.json"
    rc = main(["--synthetic", str(tmp_path / "demo"), "--valid_steps", "6",
               "--json_out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["ok"]
    taps = {d["tap"]: d["max_abs_delta"] for d in report["activation_deltas"]}
    assert taps["log_probs"] < 1e-3
    assert all(v < 1e-3 for v in taps.values()), taps
    assert report["wer"]["jax"]["wer"] == report["wer"]["torch"]["wer"]
    assert report["wer"]["jax"]["cer"] == report["wer"]["torch"]["cer"]
