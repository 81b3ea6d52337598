"""MicroBatcher: cross-request chunk batching for the serving path."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.serve import (ChunkedTranscriber, MicroBatcher,
                              StreamingTranscriber)

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


def direct_rows(forward, segs, batch=4, chunk=CHUNK):
    """Reference: rows computed one padded batch at a time."""
    rows = []
    for i0 in range(0, len(segs), batch):
        block = segs[i0:i0 + batch]
        sig = np.zeros((batch, chunk), np.float32)
        lens = np.zeros((batch,), np.int32)
        for j, seg in enumerate(block):
            sig[j, :len(seg)] = seg
            lens[j] = len(seg)
        lp, _ = forward(jnp.asarray(sig), jnp.asarray(lens))
        rows.extend(np.asarray(lp, np.float32)[:len(block)])
    return rows


def test_rows_match_direct_and_pack(acoustic):
    _, forward = acoustic
    mb = MicroBatcher(forward, CHUNK, batch_size=4, max_wait_ms=50.0)
    rng = np.random.default_rng(0)
    segs = [rng.normal(size=n).astype(np.float32)
            for n in (CHUNK, 11_000, 25_000, CHUNK, 7)]
    got = mb.submit_many(segs)
    want = direct_rows(forward, segs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-6)
    # 5 rows at batch 4 -> exactly 2 device dispatches (queued rows pack
    # without waiting)
    assert mb.dispatches == 2 and mb.rows == 5
    mb.close()


def test_concurrent_callers_coalesce(acoustic):
    _, forward = acoustic
    # a generous wait so the four threads' lone rows provably co-batch
    mb = MicroBatcher(forward, CHUNK, batch_size=4, max_wait_ms=500.0)
    rng = np.random.default_rng(1)
    segs = [rng.normal(size=9_000 + 1_000 * i).astype(np.float32)
            for i in range(4)]
    results = [None] * 4

    def hit(i):
        results[i] = mb.submit(segs[i])

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    want = direct_rows(forward, segs)
    for g, w in zip(results, want):
        np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-6)
    assert mb.rows == 4
    assert mb.dispatches <= 2  # typically 1; never 4 serial dispatches
    mb.close()


def test_chunked_transcriber_with_batcher_matches(acoustic):
    cfg, forward = acoustic
    plain = ChunkedTranscriber(forward, cfg.conv_features,
                               chunk_samples=CHUNK,
                               context_samples=CONTEXT, batch_size=2)
    mb = MicroBatcher(forward, CHUNK, batch_size=4, max_wait_ms=1.0)
    batched = ChunkedTranscriber(forward, cfg.conv_features,
                                 chunk_samples=CHUNK,
                                 context_samples=CONTEXT, batcher=mb)
    wav = np.random.default_rng(2).normal(size=100_000).astype(np.float32)
    np.testing.assert_allclose(batched.log_probs(wav), plain.log_probs(wav),
                               rtol=1e-6, atol=1e-6)
    mb.close()


def test_streaming_with_batcher_matches(acoustic):
    cfg, forward = acoustic
    offline = ChunkedTranscriber(forward, cfg.conv_features,
                                 chunk_samples=CHUNK,
                                 context_samples=CONTEXT)
    mb = MicroBatcher(forward, CHUNK, batch_size=4, max_wait_ms=1.0)
    st = StreamingTranscriber(forward, cfg.conv_features,
                              chunk_samples=CHUNK, context_samples=CONTEXT,
                              batcher=mb)
    wav = np.random.default_rng(3).normal(size=90_000).astype(np.float32)
    st.feed(wav)
    np.testing.assert_allclose(st.finish(), offline.log_probs(wav),
                               rtol=1e-6, atol=1e-6)
    mb.close()


def test_oversize_row_and_error_propagation(acoustic):
    _, forward = acoustic
    mb = MicroBatcher(forward, CHUNK, batch_size=2, max_wait_ms=1.0)
    with pytest.raises(ValueError):
        mb.submit(np.zeros(CHUNK + 1, np.float32))

    def broken(sig, lens):
        raise RuntimeError("device on fire")

    mb2 = MicroBatcher(broken, CHUNK, batch_size=2, max_wait_ms=1.0)
    with pytest.raises(RuntimeError, match="device on fire"):
        mb2.submit(np.zeros(100, np.float32))
    # the dispatcher survives a failing forward
    assert mb2._thread.is_alive()
    mb.close()
    mb2.close()
