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
    assert len(lp) == conv_output_length(len(wav), cfg.conv_features)

    sig = np.zeros((1, 32_000), np.float32)
    sig[0, :len(wav)] = wav
    lp_direct, fl = forward(jnp.asarray(sig),
                            jnp.asarray([len(wav)], jnp.int32))
    # the eval pipeline's reshape-all frame count may trail the exact
    # conv count by one; the shared prefix must match bit-for-bit
    n_valid = int(fl[0])
    assert len(lp) - n_valid in (0, 1)
    np.testing.assert_allclose(lp[:n_valid],
                               np.asarray(lp_direct)[0, :n_valid],
                               rtol=1e-6, atol=1e-6)


def test_long_audio_stitches_all_frames(acoustic):
    cfg, forward = acoustic
    ct = ChunkedTranscriber(forward, cfg.conv_features,
                            chunk_samples=32_000, context_samples=4_000,
                            batch_size=2)
    for n in (100_000, 131_072, 97_531):  # multi-chunk, assorted tails
        wav = np.random.default_rng(1).normal(size=n).astype(np.float32)
        lp = ct.log_probs(wav)
        # stitching is exact: frame-aligned chunk starts + global cut
        # points make the output exactly the unchunked frame count
        assert len(lp) == conv_output_length(n, cfg.conv_features), (
            n, len(lp))
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
