"""a8t-export: serialized StableHLO artifacts, roundtrip + CLI e2e.

No reference equivalent (audio8 ships no export path); the contract
under test is audio8_tpu/export.py's: an exported artifact reproduces
the live model's forward bit-for-bit on the export platform, runs
batch-polymorphically, pads time up to its entry table, and drives the
transcribe/serve surfaces without the checkpoint stack.
"""
import json
import os

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


def _export(setup, extra=()):
    from audio8_tpu.cli.export import main

    out = str(setup / "model.a8x")
    main(["--checkpoint", str(setup / "ckpt-step-0"),
          "--dict_file", str(setup / "dict.ltr.txt"),
          "--output", out, "--seconds", "3", "--platforms", "cpu",
          *extra] + SMALL)
    return out


@pytest.mark.slow
def test_export_roundtrip_matches_live_forward(setup):
    """The artifact's forward == the live jitted forward on the same
    weights, including at a batch size never seen at export time."""
    from audio8_tpu.cli.transcribe import load_acoustic, parse_args
    from audio8_tpu.export import load_artifact

    out = _export(setup)
    art = load_artifact(out)
    args = parse_args([str(setup / "a.wav"),
                       "--checkpoint", str(setup / "ckpt-step-0"),
                       "--dict_file", str(setup / "dict.ltr.txt")] + SMALL)
    _, live_forward, vocab, _, _ = load_acoustic(args)
    assert art.vocab == vocab

    rng = np.random.default_rng(1)
    t = art.max_samples
    for b in (1, 3):
        sig = rng.normal(size=(b, t)).astype(np.float32)
        lens = np.linspace(t // 2, t, b).astype(np.int32)
        lp_a, fr_a = art.forward(sig, lens)
        lp_l, fr_l = live_forward(jnp.asarray(sig), jnp.asarray(lens))
        np.testing.assert_array_equal(np.asarray(fr_a), np.asarray(fr_l))
        np.testing.assert_allclose(np.asarray(lp_a, np.float32),
                                   np.asarray(lp_l, np.float32),
                                   atol=1e-5, rtol=1e-5)


def test_export_pads_time_up_and_rejects_oversize(setup):
    from audio8_tpu.export import load_artifact

    art = load_artifact(_export(setup))
    t = art.max_samples
    sig = np.random.default_rng(2).normal(size=(1, t // 2)).astype(np.float32)
    lp, fr = art.forward(sig, np.asarray([t // 2], np.int32))
    assert lp.shape[0] == 1
    with pytest.raises(ValueError, match="exceeds the largest"):
        art.forward(np.zeros((1, t + 1), np.float32),
                    np.asarray([t + 1], np.int32))


def test_export_meta_and_layout(setup):
    out = _export(setup)
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "ctc"
    assert meta["version"] == 1
    assert meta["conv_features"]
    assert os.path.exists(os.path.join(out, "params.npz"))
    for e in meta["entries"]:
        assert os.path.exists(os.path.join(out, e["file"]))


def test_transcribe_from_artifact(setup):
    """a8t-transcribe --exported runs the artifact end-to-end (no
    checkpoint, no model flags) and matches the checkpoint path's text."""
    from audio8_tpu.cli.transcribe import main

    out = _export(setup)
    ref = main([str(setup / "a.wav"),
                "--checkpoint", str(setup / "ckpt-step-0"),
                "--dict_file", str(setup / "dict.ltr.txt")] + SMALL)
    got = main([str(setup / "a.wav"), "--exported", out])
    assert got[0][1] == ref[0][1]


def test_transcribe_from_artifact_chunked(setup):
    """--exported + --chunk_seconds windows long audio on an exported
    entry size (the artifact's shape table bounds the chunk)."""
    from audio8_tpu.cli.transcribe import main
    from audio8_tpu.export import load_artifact

    out = _export(setup)
    art = load_artifact(out)
    got = main([str(setup / "a.wav"), "--exported", out,
                "--chunk_seconds", "1.0", "--context_seconds", "0.25"])
    assert isinstance(got[0][1], str)
    # requested 1.0s -> smallest entry >= request is the only entry
    assert art.entry_samples(16_000) == art.max_samples


def test_exported_flag_validation(setup):
    from audio8_tpu.cli.transcribe import parse_args

    with pytest.raises(SystemExit):  # no checkpoint and no artifact
        parse_args([str(setup / "a.wav")])
    with pytest.raises(SystemExit):  # quantize is baked at export time
        parse_args([str(setup / "a.wav"), "--exported", "x",
                    "--quantize", "int8"])
    with pytest.raises(SystemExit):  # transducer path is checkpoint-only
        parse_args([str(setup / "a.wav"), "--exported", "x",
                    "--transducer", "true"])


@pytest.mark.slow
def test_export_quantized_int8(setup):
    """--quantize int8 bakes the quantized params + int8-MXU matmul path
    into the artifact; outputs match a live int8-quantized forward.
    (Dense kernels must reach ops/quant.py's min_dim=64 to quantize, so
    this model uses d_model=64.)"""
    from audio8_tpu.cli.export import main as export_main
    from audio8_tpu.cli.transcribe import load_acoustic, parse_args
    from audio8_tpu.export import load_artifact

    q = ["--d_model", "64", "--num_heads", "2", "--num_layers", "1",
         "--d_ff", "128"]
    cfg = AcousticConfig(num_labels=8, d_model=64, num_heads=2,
                         num_layers=1, d_ff=128)
    model = Wav2Vec2AcousticModel(config=cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 8000)))["params"]
    save_checkpoint({"params": params}, str(setup / "qckpt"), 0)
    out = str(setup / "model-int8.a8x")
    export_main(["--checkpoint", str(setup / "qckpt-step-0"),
                 "--dict_file", str(setup / "dict.ltr.txt"),
                 "--output", out, "--seconds", "3", "--platforms", "cpu",
                 "--quantize", "int8"] + q)
    art = load_artifact(out)
    assert art.meta["quantize"] == "int8"
    args = parse_args([str(setup / "a.wav"),
                       "--checkpoint", str(setup / "qckpt-step-0"),
                       "--dict_file", str(setup / "dict.ltr.txt"),
                       "--quantize", "int8"] + q)
    _, live_forward, _, _, _ = load_acoustic(args)
    t = art.max_samples
    sig = np.random.default_rng(5).normal(size=(2, t)).astype(np.float32)
    lens = np.asarray([t, t // 2], np.int32)
    lp_a, fr_a = art.forward(sig, lens)
    lp_l, fr_l = live_forward(jnp.asarray(sig), jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(fr_a), np.asarray(fr_l))
    np.testing.assert_allclose(np.asarray(lp_a, np.float32),
                               np.asarray(lp_l, np.float32),
                               atol=1e-5, rtol=1e-5)


def test_a8t_test_exported_matches_checkpoint(setup):
    """a8t-test --exported certifies an artifact's WER on a manifest:
    metrics equal the checkpoint-path eval bit-for-bit AT THE SAME
    LENGTH GRID (the exported eval pins the grid to the artifact's
    entry table because valid-frame counts depend on the padded
    length under the reference's reshape-all downsampling)."""
    from audio8_tpu.cli.test import evaluate
    from audio8_tpu.export import load_artifact

    # tiny manifest over the fixture wav
    with open(setup / "valid.tsv", "w") as f:
        f.write(f"{setup}\na.wav\t40000\n")
    with open(setup / "valid.ltr", "w") as f:
        f.write("A B | C A |\n")
    out = _export(setup)
    entry = load_artifact(out).max_samples
    common = ["--root_dir", str(setup), "--valid_dataset", "valid.tsv",
              "--target_tokens_per_batch", "48000",
              "--pad_to_multiple", "16000"]
    ref = evaluate(common + ["--checkpoint", str(setup / "ckpt-step-0"),
                             "--dict_file", "dict.ltr.txt",
                             "--length_buckets", str(entry)] + SMALL)
    got = evaluate(common + ["--exported", out])
    assert got["wer"] == ref["wer"] and got["cer"] == ref["cer"]


@pytest.fixture
def setup_transducer(tmp_path):
    from audio8_tpu.config import TransducerConfig
    from audio8_tpu.models.transducer import Transducer

    letters = list("ABC") + ["|"]
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in letters:
            f.write(f"{ch} 1\n")
    cfg = TransducerConfig(
        vocab_size=4 + len(letters), d_model=32, num_heads=2, num_layers=1,
        d_ff=64, pred_layers=1, pred_dim=16, pred_embed_dim=8, d_joint=16,
        timestep_masking=0.0, channel_masking=0.0)
    model = Transducer(config=cfg)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8000)),
                        jnp.asarray([8000], jnp.int32),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 0)
    rng = np.random.default_rng(4)
    wavfile.write(str(tmp_path / "a.wav"), 16000,
                  (rng.normal(size=32_000) * 5000).astype(np.int16))
    return tmp_path


TSMALL = SMALL + ["--pred_layers", "1", "--pred_dim", "16",
                  "--pred_embed_dim", "8", "--d_joint", "16"]


def test_transducer_export_roundtrip(setup_transducer):
    """An exported transducer artifact transcribes to the same text as
    the live checkpoint path (single-chunk audio, so the streamer's
    windowed lattice search is exactly the whole-utterance decode)."""
    from audio8_tpu.cli.export import main as export_main
    from audio8_tpu.cli.transcribe import main as tmain
    from audio8_tpu.export import load_artifact

    d = setup_transducer
    out = str(d / "rnnt.a8x")
    export_main(["--checkpoint", str(d / "ckpt-step-0"),
                 "--dict_file", str(d / "dict.ltr.txt"),
                 "--output", out, "--transducer", "true",
                 "--seconds", "3", "--platforms", "cpu",
                 "--max_decode_len", "64"] + TSMALL)
    art = load_artifact(out)
    assert art.meta["kind"] == "transducer"
    assert art.window_frames == 256 and art.max_output_len == 64
    assert art.chunk_samples >= 3 * 16_000

    ref = tmain([str(d / "a.wav"),
                 "--checkpoint", str(d / "ckpt-step-0"),
                 "--dict_file", str(d / "dict.ltr.txt"),
                 "--transducer", "true", "--max_decode_len", "64"]
                + TSMALL)
    got = tmain([str(d / "a.wav"), "--exported", out])
    assert got[0][1] == ref[0][1]


def test_a8t_test_exported_transducer(setup_transducer):
    """a8t-test --exported on an RNN-T artifact: manifest WER/CER via
    the artifact's windowed lattice search, equal to the checkpoint
    eval at matching pad geometry (the streamer pads to the exported
    chunk; the checkpoint eval pins its grid to the same size)."""
    from audio8_tpu.cli.export import main as export_main
    from audio8_tpu.cli.test import evaluate
    from audio8_tpu.export import load_artifact

    d = setup_transducer
    with open(d / "valid.tsv", "w") as f:
        f.write(f"{d}\na.wav\t32000\n")
    with open(d / "valid.ltr", "w") as f:
        f.write("A B | C |\n")
    out = str(d / "rnnt-eval.a8x")
    export_main(["--checkpoint", str(d / "ckpt-step-0"),
                 "--dict_file", str(d / "dict.ltr.txt"),
                 "--output", out, "--transducer", "true",
                 "--seconds", "3", "--platforms", "cpu",
                 "--max_decode_len", "64"] + TSMALL)
    chunk = load_artifact(out).chunk_samples
    common = ["--root_dir", str(d), "--valid_dataset", "valid.tsv",
              "--target_tokens_per_batch", "48000"]
    ref = evaluate(common + ["--checkpoint", str(d / "ckpt-step-0"),
                             "--dict_file", str(d / "dict.ltr.txt"),
                             "--transducer", "true",
                             "--max_decode_len", "64",
                             "--length_buckets", str(chunk)] + TSMALL)
    got = evaluate(common + ["--exported", out])
    assert got["wer"] == ref["wer"] and got["cer"] == ref["cer"]
    # beam certification stays on the checkpoint path
    with pytest.raises(ValueError):
        evaluate(common + ["--exported", out, "--beam", "4"])


def test_transducer_export_rejects_ctc_flags(setup_transducer):
    from audio8_tpu.cli.export import main as export_main
    from audio8_tpu.cli.transcribe import main as tmain

    d = setup_transducer
    with pytest.raises(SystemExit):  # quantize is a CTC-path option
        export_main(["--checkpoint", str(d / "ckpt-step-0"),
                     "--dict_file", str(d / "dict.ltr.txt"),
                     "--output", str(d / "x"), "--transducer", "true",
                     "--quantize", "int8"] + TSMALL)
    out = str(d / "rnnt2.a8x")
    export_main(["--checkpoint", str(d / "ckpt-step-0"),
                 "--dict_file", str(d / "dict.ltr.txt"),
                 "--output", out, "--transducer", "true",
                 "--seconds", "3", "--platforms", "cpu",
                 "--max_decode_len", "64"] + TSMALL)
    with pytest.raises(SystemExit):  # greedy-only artifact
        tmain([str(d / "a.wav"), "--exported", out, "--beam", "4"])


def test_serve_from_artifact(setup, monkeypatch):
    """a8t-serve --exported: HTTP transcription over the serialized
    forward — the full CLI wiring, no model code on the serving path."""
    import threading
    import urllib.request

    import audio8_tpu.cli.serve as serve_mod

    out = _export(setup)
    captured = {}
    ready = threading.Event()
    orig = serve_mod.make_server

    def capturing(service, host, port):
        s = orig(service, host, port)
        captured["srv"] = s
        ready.set()
        return s

    monkeypatch.setattr(serve_mod, "make_server", capturing)
    t = threading.Thread(
        target=serve_mod.main,
        args=(["--exported", out, "--host", "127.0.0.1", "--port", "0",
               "--chunk_seconds", "1.0", "--context_seconds", "0.25",
               "--batch_wait_ms", "0"],),
        daemon=True)
    t.start()
    try:
        assert ready.wait(timeout=180), "server never came up"
        host, port = captured["srv"].server_address
        with urllib.request.urlopen(
                f"http://{host}:{port}/healthz", timeout=30) as r:
            health = json.load(r)
        assert health["ok"] and "exported" in health["model"]
        with open(setup / "a.wav", "rb") as f:
            wav_bytes = f.read()
        req = urllib.request.Request(
            f"http://{host}:{port}/transcribe", data=wav_bytes,
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.load(r)
        assert "text" in body and body["audio_seconds"] > 0
    finally:
        if "srv" in captured:
            captured["srv"].shutdown()
        t.join(timeout=30)
