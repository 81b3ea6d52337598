"""Energy VAD (ops/vad.py) + --vad on the transcribe CLI."""
import numpy as np
import pytest

from audio8_tpu.ops.vad import frame_db, speech_segments

SR = 16_000


def _speech(n, rng, level=0.3):
    return (rng.normal(size=n) * level).astype(np.float32)


def _silence(n, rng, level=0.001):
    return (rng.normal(size=n) * level).astype(np.float32)


def test_frame_db_grid():
    db = frame_db(np.zeros(400 + 320 * 9, np.float32))
    assert db.shape == (10,)


def test_segments_find_speech_islands():
    rng = np.random.default_rng(0)
    wav = np.concatenate([
        _silence(SR, rng), _speech(SR, rng), _silence(2 * SR, rng),
        _speech(SR // 2, rng), _silence(SR, rng)])
    segs = speech_segments(wav, SR)
    assert len(segs) == 2
    (a0, b0), (a1, b1) = segs
    # first island ~ [1.0, 2.0] s with pad 0.15
    assert a0 / SR == pytest.approx(0.85, abs=0.1)
    assert b0 / SR == pytest.approx(2.15, abs=0.1)
    assert a1 / SR == pytest.approx(3.85, abs=0.1)
    assert b1 / SR == pytest.approx(4.65, abs=0.1)
    assert all(a < b <= len(wav) for a, b in segs)


def test_close_islands_merge_and_tiny_drop():
    rng = np.random.default_rng(1)
    # two speech spans 0.1 s apart (< min_gap 0.3) merge into one
    wav = np.concatenate([
        _silence(SR, rng), _speech(SR // 2, rng), _silence(SR // 10, rng),
        _speech(SR // 2, rng), _silence(SR, rng),
        # a 50 ms blip (< min_speech 0.2 s) drops
        _speech(SR // 20, rng), _silence(SR, rng)])
    segs = speech_segments(wav, SR)
    assert len(segs) == 1


def test_flat_audio_is_all_speech():
    # no dynamic range -> whole file, never "all silence"
    rng = np.random.default_rng(2)
    wav = _speech(2 * SR, rng)
    assert speech_segments(wav, SR) == [(0, len(wav))]
    assert speech_segments(np.zeros(SR, np.float32), SR) == [(0, SR)]


def test_transcribe_cli_vad_timestamps(tmp_path):
    """--vad + --timestamps through the real CLI: word times fall inside
    the detected (padded) speech spans, offset past the leading silence."""
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
    wav = np.concatenate([_silence(2 * SR, rng), _speech(SR, rng),
                          _silence(SR, rng)])
    wavfile.write(str(tmp_path / "a.wav"), SR,
                  (wav * 32767).astype(np.int16))

    out = main([str(tmp_path / "a.wav"),
                "--checkpoint", str(tmp_path / "ckpt-step-0"),
                "--dict_file", str(tmp_path / "dict.ltr.txt"),
                "--vad", "true", "--timestamps", "true",
                "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
                "--d_ff", "64"])
    row = out[0]
    assert row["segments"], row
    (a, b), = row["segments"]
    assert a == pytest.approx(1.85, abs=0.1)
    assert b == pytest.approx(3.15, abs=0.1)
    for w in row["words"]:
        assert a - 0.05 <= w["start"] < w["end"] <= b + 0.05
