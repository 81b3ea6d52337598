"""End-to-end run of the real-checkpoint parity harness on a synthetic
fairseq .pt: conversion must consume every key, per-layer activation
deltas must be at float-noise level, and the JAX eval pipeline's greedy
WER/CER must match the torch replica's on identical audio up to
float-noise argmax ties (assert_decode_parity)."""
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def assert_decode_parity(report):
    """Exact WER/CER equality is a theorem only when no greedy argmax
    frame disagrees between the oracle and JAX forwards; a disagreement
    is acceptable iff it is a float-noise tie — the oracle's top-2
    margin at that frame within 2x the local log-prob delta (the
    harness counts violations as 'unexplained'). With ties, the bound is
    also a theorem: each flipped frame changes the collapsed hyp by at
    most 2 edits at either level (a mid-run flip splits a run,
    "AAA"->"ABA"), so the aggregate metric moves at most
    200 * flips / ref_total points."""
    diffs = report["argmax_diffs"]
    assert diffs["unexplained"] == 0, diffs
    jax_m, torch_m = report["wer"]["jax"], report["wer"]["torch"]
    if diffs["total"] == 0:
        assert jax_m["wer"] == torch_m["wer"]
        assert jax_m["cer"] == torch_m["cer"]
    wer_bound = 200.0 * diffs["total"] / max(jax_m["ref_words"], 1) + 1e-9
    cer_bound = 200.0 * diffs["total"] / max(jax_m["ref_chars"], 1) + 1e-9
    assert abs(jax_m["wer"] - torch_m["wer"]) <= wer_bound, (report["wer"], diffs)
    assert abs(jax_m["cer"] - torch_m["cer"]) <= cer_bound, (report["wer"], diffs)


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
    assert_decode_parity(report)


@pytest.mark.slow
@pytest.mark.parametrize("stable_ln", [False, True])
def test_parity_harness_hf(tmp_path, stable_ln):
    """--hf mode: the live transformers forward is the oracle; both
    topologies must match at float-noise level with equal greedy WER."""
    import numpy as np
    import torch
    import transformers
    from scipy.io import wavfile

    from tools.parity_eval import main

    torch.manual_seed(1 + stable_ln)
    topo = (dict(do_stable_layer_norm=True, feat_extract_norm="layer",
                 conv_bias=True) if stable_ln else {})
    hf = transformers.Wav2Vec2ForCTC(transformers.Wav2Vec2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=12, layerdrop=0.0, **topo)).eval()
    hf_dir = tmp_path / "hf"
    hf.save_pretrained(str(hf_dir))

    # tiny manifest (letters vocab of size 12 - 4 specials = 8 symbols)
    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(0)
    letters = list("ABCDEFG") + ["|"]
    with open(tmp_path / "dict.ltr.txt", "w") as df:
        for ch in letters:
            df.write(f"{ch} 1\n")
    with open(tmp_path / "dev.tsv", "w") as tf, \
         open(tmp_path / "dev.ltr", "w") as lf:
        tf.write(str(audio) + "\n")
        for i in range(4):
            n = 8000 + 2000 * i
            wavfile.write(str(audio / f"u{i}.wav"), 16000,
                          (rng.normal(size=n) * 5000).astype(np.int16))
            tf.write(f"u{i}.wav\t{n}\n")
            lf.write("A B | C D |\n")

    out = tmp_path / "report.json"
    rc = main(["--hf", str(hf_dir), "--root_dir", str(tmp_path),
               "--valid_dataset", "dev.tsv", "--valid_steps", "4",
               "--json_out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["ok"], report
    taps = {d["tap"]: d["max_abs_delta"] for d in report["activation_deltas"]}
    assert taps["log_probs"] < 1e-3
    assert_decode_parity(report)

@pytest.mark.slow
@pytest.mark.parametrize("family", ["wavlm", "data2vec"])
def test_parity_harness_hf_families(tmp_path, family):
    """--hf mode resolves non-wav2vec2 families via AutoModelForCTC and
    the converter's reported topology (WavLM gated rel-pos bias,
    data2vec-audio stacked positional convs)."""
    import numpy as np
    import torch
    import transformers
    from scipy.io import wavfile

    from tools.parity_eval import main

    torch.manual_seed(11)
    dims = dict(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=128, vocab_size=12, layerdrop=0.0)
    if family == "wavlm":
        hf = transformers.WavLMForCTC(transformers.WavLMConfig(**dims)).eval()
    else:
        hf = transformers.Data2VecAudioForCTC(
            transformers.Data2VecAudioConfig(**dims)).eval()
    hf_dir = tmp_path / "hf"
    hf.save_pretrained(str(hf_dir))

    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(0)
    letters = list("ABCDEFG") + ["|"]
    with open(tmp_path / "dict.ltr.txt", "w") as df:
        for ch in letters:
            df.write(f"{ch} 1\n")
    with open(tmp_path / "dev.tsv", "w") as tf, \
         open(tmp_path / "dev.ltr", "w") as lf:
        tf.write(str(audio) + "\n")
        for i in range(3):
            n = 8000 + 2000 * i
            wavfile.write(str(audio / f"u{i}.wav"), 16000,
                          (rng.normal(size=n) * 5000).astype(np.int16))
            tf.write(f"u{i}.wav\t{n}\n")
            lf.write("A B | C D |\n")

    out = tmp_path / "report.json"
    rc = main(["--hf", str(hf_dir), "--root_dir", str(tmp_path),
               "--valid_dataset", "dev.tsv", "--valid_steps", "3",
               "--json_out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["ok"], report
    taps = {d["tap"]: d["max_abs_delta"] for d in report["activation_deltas"]}
    assert taps["log_probs"] < 1e-3
    assert_decode_parity(report)


@pytest.mark.slow
@pytest.mark.parametrize("family", ["hubert", "conformer_rotary",
                                    "conformer_relative",
                                    "wav2vec2_stable_ln"])
def test_parity_harness_synthetic_family(tmp_path, family):
    """--synthetic --family: one flag builds a tiny random HF model of the
    family, a corpus, and runs the whole live-oracle harness — every zoo
    topology is reachable through the CLI eval path (VERDICT r2 item 1)."""
    from tools.parity_eval import main

    out = tmp_path / "report.json"
    rc = main(["--synthetic", str(tmp_path / "demo"), "--family", family,
               "--valid_steps", "4", "--json_out", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["ok"], report
    taps = {d["tap"]: d["max_abs_delta"] for d in report["activation_deltas"]}
    assert taps["log_probs"] < 1e-3
    assert_decode_parity(report)
