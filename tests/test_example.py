"""examples/transcribe.py end-to-end on a synthetic checkpoint + wav."""
import sys

import numpy as np
import pytest
import torch


def test_transcribe_example(tmp_path, monkeypatch, capsys):
    from scipy.io import wavfile
    from tests.test_convert import make_fairseq_state, D, H, L, V

    rng = np.random.default_rng(0)
    s = make_fairseq_state(rng, prefix="w2v_encoder.w2v_model.")
    s["w2v_encoder.proj.weight"] = rng.normal(size=(V, D)).astype(np.float32) * 0.1
    s["w2v_encoder.proj.bias"] = np.zeros(V, np.float32)
    pt = str(tmp_path / "model.pt")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in s.items()}}, pt)

    letters = "ABCDEF"  # V=10: 4 specials + 6 letters
    dict_file = tmp_path / "dict.ltr.txt"
    dict_file.write_text("".join(f"{c} 1\n" for c in letters))

    wav = tmp_path / "x.wav"
    wavfile.write(str(wav), 16000,
                  (rng.normal(size=8000) * 5000).astype(np.int16))

    import importlib
    sys.path.insert(0, "examples")
    transcribe = importlib.import_module("transcribe")
    monkeypatch.setattr(sys, "argv", [
        "transcribe.py", str(wav), "--checkpoint", pt,
        "--dict_file", str(dict_file),
        "--d_model", str(D), "--num_heads", str(H), "--num_layers", str(L),
        "--d_ff", str(4 * D)])
    transcribe.main()
    out = capsys.readouterr().out
    assert str(wav) in out
