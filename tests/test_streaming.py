"""StreamingTranscriber: incremental feed == offline chunked stitching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.config import AcousticConfig, conv_output_length
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.serve import ChunkedTranscriber, StreamingTranscriber

CHUNK, CONTEXT = 32_000, 4_000


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


def feed_in_pieces(st, wav, sizes):
    """Feed wav in a repeating pattern of piece sizes, then finish."""
    i = 0
    while i < len(wav):
        for sz in sizes:
            st.feed(wav[i:i + sz])
            i += sz
            if i >= len(wav):
                break
    return st.finish()


@pytest.mark.parametrize("n", [20_000,            # sub-chunk
                               CHUNK,             # exactly one chunk
                               CHUNK + 1,         # one sample over
                               100_000, 97_531])  # multi-chunk + odd tail
def test_streaming_matches_offline(acoustic, n):
    cfg, forward = acoustic
    offline = ChunkedTranscriber(forward, cfg.conv_features,
                                 chunk_samples=CHUNK,
                                 context_samples=CONTEXT, batch_size=2)
    wav = np.random.default_rng(n).normal(size=n).astype(np.float32)
    ref = offline.log_probs(wav)

    st = StreamingTranscriber(forward, cfg.conv_features,
                              chunk_samples=CHUNK, context_samples=CONTEXT)
    got = feed_in_pieces(st, wav, sizes=[1_000, 7, 25_000, 3_333])
    assert got.shape == ref.shape
    assert len(got) == conv_output_length(n, cfg.conv_features)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_stable_prefix_is_prefix_of_final(acoustic):
    cfg, forward = acoustic
    st = StreamingTranscriber(forward, cfg.conv_features,
                              chunk_samples=CHUNK, context_samples=CONTEXT)
    wav = np.random.default_rng(3).normal(size=90_000).astype(np.float32)
    st.feed(wav[:70_000])
    stable = st.log_probs_so_far()
    assert len(stable) > 0          # at least one interior chunk emitted
    st.feed(wav[70_000:])
    final = st.finish()
    np.testing.assert_array_equal(final[:len(stable)], stable)


def test_bounded_buffer(acoustic):
    cfg, forward = acoustic
    st = StreamingTranscriber(forward, cfg.conv_features,
                              chunk_samples=CHUNK, context_samples=CONTEXT)
    for _ in range(10):
        st.feed(np.zeros(20_000, np.float32))
    # retained raw samples never exceed chunk + one feed block
    assert len(st._tail) <= CHUNK + 20_000
    assert st.samples_fed == 200_000


def test_text_and_lifecycle(acoustic):
    cfg, forward = acoustic
    i2v = {i: c for i, c in enumerate("_abcdefg")}
    st = StreamingTranscriber(forward, cfg.conv_features,
                              chunk_samples=CHUNK, context_samples=CONTEXT)
    assert st.text_so_far(i2v) == ""
    wav = np.random.default_rng(5).normal(size=50_000).astype(np.float32)
    st.feed(wav)
    txt = st.finish_text(i2v)
    offline = ChunkedTranscriber(forward, cfg.conv_features,
                                 chunk_samples=CHUNK,
                                 context_samples=CONTEXT)
    assert txt == offline.transcribe(wav, i2v)
    with pytest.raises(RuntimeError):
        st.feed(wav)
    st.reset()
    assert st.samples_fed == 0 and st.finish().shape == (0, 1)
