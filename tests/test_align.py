"""Word timestamps / confidences from CTC alignments (ops/align.py)."""
import math

import numpy as np
import pytest

from audio8_tpu.ops.align import (
    greedy_alignment,
    timestamped_words,
    total_stride,
    word_timestamps,
)


def _lp_from_ids(ids, V, hot=0.0, cold=-10.0):
    lp = np.full((len(ids), V), cold, np.float32)
    for t, i in enumerate(ids):
        lp[t, i] = hot
    return lp


def test_total_stride():
    assert total_stride([(512, 10, 5), (512, 3, 2), (512, 2, 2)]) == 20


def test_greedy_alignment_collapse_semantics():
    # blank=0; runs collapse, blank separates repeats
    lp = _lp_from_ids([0, 1, 1, 0, 2, 3, 3, 0, 3], V=4)
    got = greedy_alignment(lp, blank=0)
    assert [(i, t) for i, t, _ in got] == [(1, 1), (2, 4), (3, 5), (3, 8)]
    assert all(lpv == 0.0 for _, _, lpv in got)


def test_word_timestamps_splits_on_separator():
    i2v = {1: "H", 2: "I", 3: "|", 4: "A"}
    # H I | A  at frames 2, 5, 7, 9; 20 ms frames
    align = [(1, 2, math.log(0.9)), (2, 5, math.log(0.8)),
             (3, 7, 0.0), (4, 9, math.log(0.5))]
    words = word_timestamps(align, i2v, frame_seconds=0.02)
    assert [w["word"] for w in words] == ["HI", "A"]
    hi, a = words
    assert hi["start"] == pytest.approx(0.04)
    # separator at frame 7 closes HI at frame 6 -> 7 * 0.02
    assert hi["end"] == pytest.approx(0.14)
    assert hi["confidence"] == pytest.approx(math.sqrt(0.9 * 0.8), abs=1e-3)
    assert a["start"] == pytest.approx(0.18)
    assert a["end"] == pytest.approx(0.20)  # last frame + 1
    assert 0 < a["confidence"] <= 1


def test_specials_carry_no_timing():
    i2v = {1: "<unk>", 2: "A", 3: "|"}
    align = [(1, 0, 0.0), (2, 3, 0.0), (3, 5, 0.0)]
    words = word_timestamps(align, i2v, frame_seconds=0.02)
    assert [w["word"] for w in words] == ["A"]


def test_timestamped_words_end_to_end():
    i2v = {0: "<pad>", 1: "A", 2: "B", 3: "|"}
    lp = _lp_from_ids([0, 1, 0, 2, 3, 0], V=4, hot=math.log(0.7))
    words = timestamped_words(lp, i2v, blank=0, frame_seconds=0.02)
    assert [w["word"] for w in words] == ["AB"]
    assert words[0]["start"] == pytest.approx(0.02)
    assert words[0]["confidence"] == pytest.approx(0.7, abs=1e-3)


@pytest.mark.slow
def test_transcribe_cli_timestamps(tmp_path):
    """--timestamps drives the real CLI and yields schema-valid ndjson."""
    import jax
    import jax.numpy as jnp
    from scipy.io import wavfile

    from audio8_tpu.cli.transcribe import main
    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
    from audio8_tpu.train.checkpoint import save_checkpoint

    letters = list("ABC") + ["|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg = AcousticConfig(num_labels=4 + len(letters), d_model=32,
                         num_heads=2, num_layers=1, d_ff=64)
    model = Wav2Vec2AcousticModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8000)))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)
    rng = np.random.default_rng(0)
    wavfile.write(str(tmp_path / "a.wav"), 16000,
                  (rng.normal(size=40_000) * 5000).astype(np.int16))

    out = main([str(tmp_path / "a.wav"),
                "--checkpoint", str(tmp_path / "ckpt-step-0"),
                "--dict_file", str(tmp_path / "dict.ltr.txt"),
                "--timestamps", "true",
                "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
                "--d_ff", "64"])
    assert len(out) == 1 and isinstance(out[0], dict)
    row = out[0]
    assert set(row) == {"file", "text", "words"}
    for w in row["words"]:
        assert set(w) == {"word", "start", "end", "confidence"}
        assert 0 <= w["start"] < w["end"] <= 40_000 / 16_000 + 0.02
        assert 0 < w["confidence"] <= 1
    # words match the text once specials (random weights emit </s> etc,
    # which carry no timing) are stripped
    import re

    plain = " ".join(re.sub(r"<[^>]*>", "", row["text"]).split())
    assert " ".join(w["word"] for w in row["words"]) == plain
