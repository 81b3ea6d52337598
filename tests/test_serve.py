"""ChunkedTranscriber: fixed-shape long-audio serving."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.config import AcousticConfig, conv_output_length
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.serve import ChunkedTranscriber
from audio8_tpu.utils import Offsets, revlut


@pytest.fixture(scope="module")
def acoustic():
    cfg = AcousticConfig(num_labels=8, d_model=32, num_heads=2, num_layers=1,
                         d_ff=64, dropout=0.0, timestep_masking=0.0,
                         channel_masking=0.0)
    model = Wav2Vec2AcousticModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8000), jnp.float32))["params"]

    @jax.jit
    def forward(signal, lengths):
        lp, mask = model.apply({"params": params}, signal, lengths)
        return lp, jnp.sum(mask, axis=-1)

    return cfg, forward


def test_short_audio_equals_direct_forward(acoustic):
    cfg, forward = acoustic
    ct = ChunkedTranscriber(forward, cfg.conv_features,
                            chunk_samples=32_000, context_samples=4_000,
                            batch_size=2)
    wav = np.random.default_rng(0).normal(size=20_000).astype(np.float32)
    lp = ct.log_probs(wav)

    sig = np.zeros((1, 32_000), np.float32)
    sig[0, :len(wav)] = wav
    lp_direct, fl = forward(jnp.asarray(sig),
                            jnp.asarray([len(wav)], jnp.int32))
    np.testing.assert_allclose(lp, np.asarray(lp_direct)[0, :int(fl[0])],
                               rtol=1e-6, atol=1e-6)


def test_long_audio_stitches_all_frames(acoustic):
    cfg, forward = acoustic
    ct = ChunkedTranscriber(forward, cfg.conv_features,
                            chunk_samples=32_000, context_samples=4_000,
                            batch_size=2)
    n = 100_000  # ~4 chunks with overlap
    wav = np.random.default_rng(1).normal(size=n).astype(np.float32)
    lp = ct.log_probs(wav)
    want = conv_output_length(n, cfg.conv_features)
    # stitching drops/keeps margin frames with +-1 rounding per boundary
    assert abs(len(lp) - want) <= 2 + 2 * len(ct._chunk_starts(n)), (
        len(lp), want)
    assert lp.shape[1] == 8
    assert np.all(np.isfinite(lp))


def test_transcribe_returns_text(acoustic):
    cfg, forward = acoustic
    ct = ChunkedTranscriber(forward, cfg.conv_features,
                            chunk_samples=32_000, context_samples=4_000)
    vocab = list(Offsets.VALUES) + ["|", "A", "B", "C"]
    index2vocab = revlut({v: i for i, v in enumerate(vocab)})
    wav = np.random.default_rng(2).normal(size=70_000).astype(np.float32)
    text = ct.transcribe(wav, index2vocab)
    assert isinstance(text, str)


def test_chunk_must_exceed_context():
    with pytest.raises(ValueError):
        ChunkedTranscriber(lambda s, l: None, [(512, 10, 5)],
                           chunk_samples=8_000, context_samples=4_000)
