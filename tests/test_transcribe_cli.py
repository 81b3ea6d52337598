"""a8t-transcribe CLI: checkpoint + audio -> text, plain and chunked."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import wavfile

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.train.checkpoint import save_checkpoint

SMALL = ["--d_model", "32", "--num_heads", "2", "--num_layers", "1",
         "--d_ff", "64"]


@pytest.fixture
def setup(tmp_path):
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
    return tmp_path


def test_transcribe_plain(setup):
    from audio8_tpu.cli.transcribe import main

    out = main([str(setup / "a.wav"),
                "--checkpoint", str(setup / "ckpt-step-0"),
                "--dict_file", str(setup / "dict.ltr.txt")] + SMALL)
    assert len(out) == 1
    assert isinstance(out[0][1], str)


def test_transcribe_chunked_matches_plain_length(setup):
    from audio8_tpu.cli.transcribe import main

    out = main([str(setup / "a.wav"),
                "--checkpoint", str(setup / "ckpt-step-0"),
                "--dict_file", str(setup / "dict.ltr.txt"),
                "--chunk_seconds", "1.5", "--context_seconds", "0.25"]
               + SMALL)
    assert len(out) == 1
    assert isinstance(out[0][1], str)


@pytest.fixture
def setup_bpe(tmp_path):
    units = ["HE@@", "LLO", "WOR@@", "LD"]
    with open(tmp_path / "dict.bpe.txt", "w") as f:
        for u in units:
            f.write(f"{u} 1\n")
    cfg = AcousticConfig(num_labels=4 + len(units), d_model=32,
                         num_heads=2, num_layers=1, d_ff=64)
    model = Wav2Vec2AcousticModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8000)))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)
    rng = np.random.default_rng(1)
    wavfile.write(str(tmp_path / "a.wav"), 16000,
                  (rng.normal(size=40_000) * 5000).astype(np.int16))
    return tmp_path


def test_transcribe_bpe_postproc(setup_bpe):
    """--target_type bpe strips '@@ ' continuations from the output
    (ops/metrics.postproc_bpe; reference ctc.py:69-72 semantics)."""
    from audio8_tpu.cli.transcribe import main

    out = main([str(setup_bpe / "a.wav"),
                "--checkpoint", str(setup_bpe / "ckpt-step-0"),
                "--dict_file", str(setup_bpe / "dict.bpe.txt"),
                "--target_type", "bpe"] + SMALL)
    assert len(out) == 1
    assert "@@ " not in out[0][1]


def test_transcribe_timestamps_rejects_bpe(setup_bpe):
    from audio8_tpu.cli.transcribe import main

    with pytest.raises(SystemExit):
        main([str(setup_bpe / "a.wav"),
              "--checkpoint", str(setup_bpe / "ckpt-step-0"),
              "--dict_file", str(setup_bpe / "dict.bpe.txt"),
              "--target_type", "bpe", "--timestamps", "true"] + SMALL)
