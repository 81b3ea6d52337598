"""a8t-serve HTTP endpoint: health, transcription, errors, concurrency."""
import http.client
import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import wavfile

from audio8_tpu.cli.serve import TranscribeService, make_server
from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.serve import ChunkedTranscriber, MicroBatcher


def wav_bytes(wav: np.ndarray, sr: int = 16_000) -> bytes:
    buf = io.BytesIO()
    wavfile.write(buf, sr, (wav * 32767).astype(np.int16))
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
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

    ct = ChunkedTranscriber(forward, cfg.conv_features,
                            chunk_samples=32_000, context_samples=4_000,
                            batch_size=2)
    i2v = {i: c for i, c in enumerate("_abcdefg")}
    service = TranscribeService(ct, i2v, info={"model": "tiny"})
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, service, ct, i2v
    srv.shutdown()


def request(srv, path, data=None, headers=None):
    url = "http://127.0.0.1:%d%s" % (srv.server_address[1], path)
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    srv, *_ = server
    status, body = request(srv, "/healthz")
    assert status == 200 and body["ok"] and body["model"] == "tiny"


def test_transcribe_matches_direct(server):
    srv, _, ct, i2v = server
    wav = np.random.default_rng(0).normal(size=50_000).astype(np.float32) * .1
    status, body = request(srv, "/transcribe", data=wav_bytes(wav))
    assert status == 200
    # int16 round-trip through the container, so re-derive the expectation
    # from the exact samples the server saw
    seen = (wav * 32767).astype(np.int16).astype(np.float32) / 32768.0
    assert body["text"] == ct.transcribe(seen, i2v)
    assert body["audio_seconds"] == pytest.approx(len(wav) / 16_000, abs=1e-3)
    assert body["latency_ms"] > 0


def test_errors(server):
    srv, *_ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        request(srv, "/transcribe", data=b"")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        request(srv, "/nope")
    assert e.value.code == 404


def stream_request(port, body_iter, headers):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    try:
        conn.request("POST", "/stream", body=body_iter,
                     headers=headers, encode_chunked=True)
        resp = conn.getresponse()
        lines = [json.loads(ln) for ln in resp.read().split(b"\n") if ln]
        return resp.status, lines
    finally:
        conn.close()


def test_stream_endpoint_chunked_pcm16(server):
    srv, _, ct, i2v = server
    port = srv.server_address[1]
    wav = np.random.default_rng(21).normal(size=50_000).astype(np.float32) * .1
    pcm = (wav * 32767).astype("<i2").tobytes()

    def gen():  # ragged blocks, odd sizes straddle the sample width
        for i in range(0, len(pcm), 9_999):
            yield pcm[i:i + 9_999]

    status, lines = stream_request(
        port, gen(), {"Transfer-Encoding": "chunked"})
    assert status == 200
    final = lines[-1]
    assert final["final"] is True
    seen = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
    assert final["text"] == ct.transcribe(seen, i2v)
    assert final["audio_seconds"] == pytest.approx(len(wav) / 16_000,
                                                   abs=1e-3)
    # 50k samples > one 32k chunk -> at least one interim partial line
    assert any("partial" in ln for ln in lines[:-1])


def test_stream_endpoint_f32_and_bad_format(server):
    srv, _, ct, i2v = server
    port = srv.server_address[1]
    wav = np.random.default_rng(22).normal(size=20_000).astype(np.float32) * .1

    def gen():
        yield wav.astype("<f4").tobytes()

    status, lines = stream_request(
        port, gen(), {"Transfer-Encoding": "chunked",
                      "X-Audio-Format": "f32"})
    assert status == 200 and lines[-1]["text"] == ct.transcribe(wav, i2v)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/stream", body=b"",
                 headers={"X-Audio-Format": "mp3"})
    assert conn.getresponse().status == 400
    conn.close()


def test_batched_server_concurrency(server):
    """Same concurrency contract with the cross-request MicroBatcher on:
    results exact, and /healthz reports fewer dispatches than rows."""
    _, service, ct, i2v = server
    mb = MicroBatcher(ct.forward, ct.chunk, batch_size=4, max_wait_ms=200.0)
    bct = ChunkedTranscriber(ct.forward, ct.conv_features,
                             chunk_samples=ct.chunk,
                             context_samples=ct.context, batcher=mb)
    bservice = TranscribeService(bct, i2v, info={"model": "tiny-batched"})
    srv = make_server(bservice, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(11)
        # all shorter than one chunk -> exactly one batcher row per request
        wavs = [rng.normal(size=16_000 + 3_000 * i).astype(np.float32) * .1
                for i in range(4)]
        results = [None] * len(wavs)

        def hit(i):
            results[i] = request(srv, "/transcribe", data=wav_bytes(wavs[i]))

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(len(wavs))]
        [t.start() for t in threads]
        [t.join() for t in threads]
        for i, wav in enumerate(wavs):
            status, body = results[i]
            seen = (wav * 32767).astype(np.int16).astype(np.float32) / 32768.0
            assert status == 200 and body["text"] == ct.transcribe(seen, i2v)
        _, health = request(srv, "/healthz")
        stats = health["batcher"]
        assert stats["rows"] == 4 and stats["dispatches"] <= 2
    finally:
        srv.shutdown()
        mb.close()


def test_concurrent_requests(server):
    srv, _, ct, i2v = server
    rng = np.random.default_rng(7)
    wavs = [rng.normal(size=20_000 + 5_000 * i).astype(np.float32) * .1
            for i in range(4)]
    results = [None] * len(wavs)

    def hit(i):
        results[i] = request(srv, "/transcribe", data=wav_bytes(wavs[i]))

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(wavs))]
    [t.start() for t in threads]
    [t.join() for t in threads]
    for i, wav in enumerate(wavs):
        status, body = results[i]
        seen = (wav * 32767).astype(np.int16).astype(np.float32) / 32768.0
        assert status == 200 and body["text"] == ct.transcribe(seen, i2v)


def test_transcribe_timestamps(server):
    srv, service, ct, i2v = server
    wav = np.random.default_rng(1).normal(size=40_000).astype(np.float32) * .1
    service.timestamps = True
    try:
        status, body = request(srv, "/transcribe", data=wav_bytes(wav))
    finally:
        service.timestamps = False
    assert status == 200 and "words" in body
    for w in body["words"]:
        assert set(w) == {"word", "start", "end", "confidence"}
        assert 0 <= w["start"] < w["end"]
        assert 0 < w["confidence"] <= 1


def test_transcribe_bpe_postproc(server):
    """service.postproc threads into /transcribe: with postproc_bpe the
    '@@ ' continuations are joined instead of letter-convention
    '|' boundaries (cli/serve.py --target_type bpe)."""
    from audio8_tpu.ops.metrics import postproc_bpe

    srv, service, ct, i2v = server
    bpe_i2v = {i: u for i, u in
               enumerate(["_", "HE@@", "LLO", "WOR@@", "LD", "X@@", "Y", "Z"])}
    wav = np.random.default_rng(2).normal(size=40_000).astype(np.float32) * .1
    old_i2v, old_pp = service.index2vocab, service.postproc
    service.index2vocab, service.postproc = bpe_i2v, postproc_bpe
    try:
        status, body = request(srv, "/transcribe", data=wav_bytes(wav))
    finally:
        service.index2vocab, service.postproc = old_i2v, old_pp
    assert status == 200
    assert "@@ " not in body["text"]


@pytest.fixture(scope="module")
def rnnt_server():
    """a8t-serve --transducer equivalent: TransducerService over a tiny
    RNN-T stack."""
    from audio8_tpu.cli.serve import TransducerService
    from audio8_tpu.config import TransducerConfig
    from audio8_tpu.models.transducer import Transducer
    from audio8_tpu.serve import TransducerStreamer

    cfg = TransducerConfig(
        vocab_size=10, d_model=32, num_heads=2, num_layers=1, d_ff=64,
        pred_layers=1, pred_dim=32, pred_embed_dim=16, d_joint=32,
        timestep_masking=0.0, channel_masking=0.0, dropout=0.0,
        pred_dropout=0.0, freeze_fx=False)
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 8000)),
                        jnp.asarray([8000], jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]

    @jax.jit
    def encode(signal, lengths):
        enc, frames = model.apply({"params": params}, signal, lengths,
                                  method=Transducer.encode)
        return enc.astype(jnp.float32), frames

    @jax.jit
    def decode_init():
        return model.apply({"params": params}, 1,
                           method=Transducer.decode_init)

    @jax.jit
    def decode_frames(enc, n_frames, tokens, n, pred_out, carry):
        return model.apply({"params": params}, enc, n_frames, tokens, n,
                           pred_out, carry, 4,
                           method=Transducer.decode_frames)

    def factory():
        return TransducerStreamer(encode, decode_init, decode_frames,
                                  cfg.conv_features, chunk_samples=32_000,
                                  context_samples=4_000, window_frames=31,
                                  max_output_len=512)

    i2v = {i: c for i, c in enumerate("_^$#ABCDE|")}
    service = TransducerService(factory, i2v,
                                info={"model": "tiny-rnnt"})
    srv = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, service, factory, i2v
    srv.shutdown()


@pytest.mark.slow
def test_rnnt_healthz(rnnt_server):
    srv, *_ = rnnt_server
    status, body = request(srv, "/healthz")
    assert status == 200 and body["ok"] and body["model"] == "tiny-rnnt"


@pytest.mark.slow
def test_rnnt_transcribe_matches_direct(rnnt_server):
    srv, service, factory, i2v = rnnt_server
    wav = np.random.default_rng(3).normal(size=50_000).astype(np.float32) * .1
    status, body = request(srv, "/transcribe", data=wav_bytes(wav))
    assert status == 200
    seen = (wav * 32767).astype(np.int16).astype(np.float32) / 32768.0
    st = factory()
    st.feed(seen)
    assert body["text"] == st.finish_text(i2v)
    assert body["audio_seconds"] == pytest.approx(len(wav) / 16_000,
                                                  abs=1e-3)


@pytest.mark.slow
def test_rnnt_stream_endpoint(rnnt_server):
    srv, service, factory, i2v = rnnt_server
    port = srv.server_address[1]
    wav = np.random.default_rng(9).normal(size=70_000).astype(np.float32) * .1
    pcm = (wav * 32767).astype("<i2").tobytes()

    def gen():
        for i in range(0, len(pcm), 9_999):
            yield pcm[i:i + 9_999]

    status, lines = stream_request(
        port, gen(), {"Transfer-Encoding": "chunked"})
    assert status == 200
    final = lines[-1]
    assert final["final"] is True
    seen = np.frombuffer(pcm, "<i2").astype(np.float32) / 32768.0
    st = factory()
    st.feed(seen)
    assert final["text"] == st.finish_text(i2v)
    # 70k samples > one 32k chunk -> at least one interim partial line
    assert any("partial" in ln for ln in lines[:-1])


def test_metrics_endpoint(server):
    """GET /metrics: Prometheus text counters reflect served requests."""
    srv, *_ = server
    wav = np.random.default_rng(3).normal(size=20_000).astype(np.float32) * .1
    request(srv, "/transcribe", data=wav_bytes(wav))
    url = "http://127.0.0.1:%d/metrics" % srv.server_address[1]
    with urllib.request.urlopen(url, timeout=30) as r:
        assert r.status == 200
        assert "text/plain" in r.headers["Content-Type"]
        body = r.read().decode()
    assert 'a8t_requests_total{route="/transcribe",code="200"}' in body
    assert 'a8t_request_seconds_count{route="/transcribe"}' in body
    assert "a8t_audio_seconds_total" in body
    # counters are monotonically increasing
    key = 'a8t_requests_total{route="/transcribe",code="200"} '

    def count(text):
        line = [ln for ln in text.splitlines() if ln.startswith(key)][0]
        return int(line[len(key):])

    n0 = count(body)
    request(srv, "/transcribe", data=wav_bytes(wav))
    with urllib.request.urlopen(url, timeout=30) as r:
        body2 = r.read().decode()
    assert count(body2) == n0 + 1
