"""Streaming/chunked transducer decode (serve.TransducerStreamer).

Exactness contract mirrors tests/test_streaming.py: the streamer's
decoded ids equal one decode_frames pass over the offline-stitched
encoder features, and the windowed decode_frames state machine is
bit-identical to the single-program whole-utterance Transducer.decode.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.config import TransducerConfig
from audio8_tpu.models.transducer import Transducer
from audio8_tpu.serve import ChunkedTranscriber, TransducerStreamer
from audio8_tpu.utils import Offsets

CHUNK, CONTEXT = 32_000, 4_000


def _cfg(v=10):
    return TransducerConfig(
        vocab_size=v, d_model=32, num_heads=2, num_layers=1, d_ff=64,
        pred_layers=2, pred_dim=32, pred_embed_dim=16, d_joint=32,
        timestep_masking=0.0, channel_masking=0.0, dropout=0.0,
        pred_dropout=0.0, freeze_fx=False)


@pytest.fixture(scope="module")
def stack():
    cfg = _cfg()
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8000)),
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

    @functools.partial(jax.jit, static_argnames=("max_output_len",))
    def decode(signal, lengths, max_output_len=512):
        return model.apply({"params": params}, signal, lengths,
                           max_output_len, 4, method=Transducer.decode)

    return cfg, model, params, encode, decode_init, decode_frames, decode


def _ids_from_single_pass(stitched, decode_init, decode_frames, budget=512):
    """Reference: one decode_frames call over ALL stitched frames."""
    pred_out, carry = decode_init()
    tokens = jnp.full((1, budget), Offsets.PAD, jnp.int32)
    n = jnp.zeros((1,), jnp.int32)
    tokens, n, _, _ = decode_frames(
        jnp.asarray(stitched[None, ...]),
        jnp.asarray([len(stitched)], jnp.int32), tokens, n, pred_out, carry)
    return np.asarray(tokens)[0, :int(np.asarray(n)[0])].tolist()


def test_windowed_decode_matches_whole(stack):
    """decode_frames over two windows == Transducer.decode, exactly."""
    cfg, model, params, encode, decode_init, decode_frames, decode = stack
    wav = np.random.default_rng(0).normal(size=24_000).astype(np.float32)
    sig = jnp.asarray(wav[None, ...])
    lens = jnp.asarray([len(wav)], jnp.int32)

    want_toks, want_n = decode(sig, lens)
    want = np.asarray(want_toks)[0, :int(np.asarray(want_n)[0])].tolist()

    enc, frames = encode(sig, lens)
    t = int(np.asarray(frames)[0])
    pred_out, carry = decode_init()
    tokens = jnp.full((1, 512), Offsets.PAD, jnp.int32)
    n = jnp.zeros((1,), jnp.int32)
    for lo, hi in ((0, t // 2), (t // 2, enc.shape[1])):
        n_frames = jnp.asarray([max(min(t, hi) - lo, 0)], jnp.int32)
        tokens, n, pred_out, carry = decode_frames(
            enc[:, lo:hi], n_frames, tokens, n, pred_out, carry)
    got = np.asarray(tokens)[0, :int(np.asarray(n)[0])].tolist()
    assert got == want and len(want) > 0


@pytest.mark.parametrize("n", [20_000, CHUNK + 1, 100_000])
def test_streamer_matches_offline_stitch(stack, n):
    """Incremental feed/window decode == single pass over the offline
    stitched features (exact: same stitch geometry, same lattice)."""
    cfg, model, params, encode, decode_init, decode_frames, decode = stack
    wav = np.random.default_rng(n).normal(size=n).astype(np.float32)

    # batch_size=1 so the reference runs the same (1, chunk) programs the
    # streamer does: a zero-pad row changes XLA's reduction schedule by
    # ~1e-7, enough to flip a greedy near-tie on random weights
    offline = ChunkedTranscriber(encode, cfg.conv_features,
                                 chunk_samples=CHUNK,
                                 context_samples=CONTEXT, batch_size=1)
    stitched = offline.log_probs(wav)  # (T', D) encoder features
    want = _ids_from_single_pass(stitched, decode_init, decode_frames)

    st = TransducerStreamer(encode, decode_init, decode_frames,
                            cfg.conv_features, chunk_samples=CHUNK,
                            context_samples=CONTEXT, window_frames=37,
                            max_output_len=512)
    i = 0
    for sz in (1_000, 7, 25_000, 3_333, 50_000, 40_000):
        st.feed(wav[i:i + sz])
        i += sz
        if i >= n:
            break
    ids = st.finish().tolist()
    assert ids == want and len(want) > 0


def test_streamer_partials_and_lifecycle(stack):
    cfg, model, params, encode, decode_init, decode_frames, decode = stack
    wav = np.random.default_rng(7).normal(size=80_000).astype(np.float32)
    i2v = {i: ch for i, ch in enumerate("_^$#ABCDE|")}
    st = TransducerStreamer(encode, decode_init, decode_frames,
                            cfg.conv_features, chunk_samples=CHUNK,
                            context_samples=CONTEXT, window_frames=25,
                            max_output_len=512)
    st.feed(wav[:40_000])
    ids_mid, n_mid = st.tokens_so_far()
    assert isinstance(st.text_so_far(i2v), str)
    st.feed(wav[40_000:])
    final = st.finish().tolist()
    # the stable mid-stream prefix never changes
    assert final[:n_mid] == ids_mid
    with pytest.raises(RuntimeError):
        st.feed(wav[:10])
    st.reset()
    st.feed(wav[:20_000])
    st.finish()  # short stream still flushes through the masked window


@pytest.mark.slow
def test_transcribe_cli_transducer_chunked(tmp_path):
    """a8t-transcribe --transducer --chunk_seconds: long audio decodes
    through the TransducerStreamer (fixed-shape chunked encoder +
    windowed lattice search)."""
    from scipy.io import wavfile

    from audio8_tpu.train.checkpoint import save_checkpoint

    rng = np.random.default_rng(11)
    letters = ["A", "B", "C", "|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg = _cfg(4 + len(letters))
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8000)),
                        jnp.asarray([8000], jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)
    wav = (rng.normal(size=3 * 16_000) * 4000).astype(np.int16)
    wavfile.write(str(tmp_path / "long.wav"), 16_000, wav)

    from audio8_tpu.cli.transcribe import main

    out = main([str(tmp_path / "long.wav"),
                "--checkpoint", str(tmp_path / "ckpt-step-0"),
                "--dict_file", str(tmp_path / "dict.ltr.txt"),
                "--transducer", "true", "--chunk_seconds", "1.0",
                "--context_seconds", "0.25", "--max_decode_len", "64",
                "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
                "--d_ff", "64", "--pred_layers", "2", "--pred_dim", "32",
                "--pred_embed_dim", "16", "--d_joint", "32"])
    assert len(out) == 1 and out[0][0].endswith("long.wav")
    assert isinstance(out[0][1], str)
