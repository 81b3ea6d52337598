"""Transcription CLI: checkpoint + audio files -> text.

A serving entry point with no reference equivalent (audio8 ships no
inference CLI): loads an a8t/Orbax checkpoint, a fairseq ``.pt`` or an
HF ``save_pretrained`` dir, batches a jitted acoustic forward, and
decodes greedily or with prefix-beam(+ARPA LM). Long audio runs through
``ChunkedTranscriber`` (fixed-shape overlapped chunks — one compiled
program for any input length) when ``--chunk_seconds > 0``.

  a8t-transcribe --checkpoint ckpt --dict_file dict.ltr.txt a.wav b.flac
  a8t-transcribe --checkpoint ./hf-wav2vec2-960h --dict_file vocab.json \\
      --chunk_seconds 30 podcast.flac
"""
from __future__ import annotations

import logging
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.cli.common import (add_common_model_args, apply_preset,
                                   resolve_restart, topology_kwargs)
from audio8_tpu.config import AcousticConfig
from audio8_tpu.data.audio import SoundfileAudioReader
from audio8_tpu.models.text import read_vocab_list
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.ops.ctc import greedy_collapse
from audio8_tpu.ops.metrics import postproc_bpe, postproc_letters
from audio8_tpu.utils import Offsets, revlut, str2bool


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("audio", nargs="+", help="WAV/FLAC files")
    p.add_argument("--checkpoint",
                   help="a8t checkpoint, fairseq .pt, or HF dir")
    p.add_argument("--dict_file",
                   help="fairseq dict.ltr.txt or HF vocab.json")
    p.add_argument("--exported",
                   help="a8t-export artifact directory: run the "
                        "serialized StableHLO forward instead of "
                        "building the model from a checkpoint (vocab "
                        "and conv geometry come from the artifact)")
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--device_beam", type=str2bool, default=False,
                   help="no-LM batch beam decode on device (ops/beam_jax.py)")
    p.add_argument("--transducer", type=str2bool, default=False,
                   help="the checkpoint is an a8t-train-transducer model: "
                        "decode with the jitted batched greedy transducer "
                        "search (Transducer.decode) instead of CTC")
    p.add_argument("--pred_layers", type=int, default=2)
    p.add_argument("--pred_dim", type=int, default=512)
    p.add_argument("--pred_embed_dim", type=int, default=256)
    p.add_argument("--d_joint", type=int, default=512)
    p.add_argument("--max_decode_len", type=int, default=None,
                   help="transducer label budget (default 200 for "
                        "whole-utterance decode, 8000 for --chunk_seconds "
                        "streams)")
    p.add_argument("--max_symbols_per_frame", type=int, default=4)
    p.add_argument("--target_type", choices=["ltr", "bpe"], default="ltr",
                   help="unit type the checkpoint was trained on: 'ltr' "
                        "joins letters on '|' word boundaries, 'bpe' "
                        "strips '@@ ' continuations (ops/metrics.py, "
                        "matching a8t-test's --target_type)")
    p.add_argument("--vad", type=str2bool, default=False,
                   help="energy-based voice activity detection "
                        "(ops/vad.py): transcribe only speech spans — "
                        "skips silence compute and silence "
                        "hallucinations; timestamps stay global")
    p.add_argument("--timestamps", type=str2bool, default=False,
                   help="emit ndjson with word-level {start, end, "
                        "confidence} from the greedy CTC alignment "
                        "(ops/align.py) instead of plain text lines")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8: post-training weight quantization of the "
                        "Dense kernels onto the int8 MXU path (ops/quant.py)")
    p.add_argument("--lm", help="ARPA LM for beam decoding")
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--beta", type=float, default=5.0)
    p.add_argument("--chunk_seconds", type=float, default=0.0,
                   help=">0: transcribe arbitrarily long audio through "
                        "fixed-shape overlapped chunks")
    p.add_argument("--context_seconds", type=float, default=2.0)
    p.add_argument("--lane_align", type=str2bool, default=True,
                   help="snap the chunk window UP so its frame count sits "
                        "on the 128-lane MXU tile boundary")
    add_common_model_args(p)
    args = apply_preset(p.parse_args(argv))
    if args.exported:
        if args.transducer:
            raise SystemExit("--transducer is not needed with "
                             "--exported: the artifact records its own "
                             "kind (meta.json) and routes itself")
        if args.quantize != "none":
            raise SystemExit("--quantize is baked at export time "
                             "(a8t-export --quantize int8)")
    elif not (args.checkpoint and args.dict_file):
        raise SystemExit("--checkpoint and --dict_file are required "
                         "(or pass an --exported artifact)")
    return args


def build_beam_decoder(args, vocab_list):
    """The optional PrefixBeamSearch an eval/serving surface wants,
    from its common flag set (shared by the live and exported paths)."""
    if args.beam <= 1 and not args.lm:
        return None
    from audio8_tpu.ops.beam import PrefixBeamSearch

    return PrefixBeamSearch(vocab_list, alpha=args.alpha, beta=args.beta,
                            beam=args.beam, lm_file=args.lm,
                            device=args.device_beam)


def load_exported_acoustic(args):
    """:func:`load_acoustic` equivalent backed by an ``a8t-export``
    artifact: the serialized StableHLO forward runs in place of the
    live model — no checkpoint restore, no model build."""
    from types import SimpleNamespace

    from audio8_tpu.export import load_artifact

    Offsets.remap_fairseq_ctc()
    art = load_artifact(args.exported)
    if art.kind != "ctc":
        raise SystemExit(
            f"{args.exported} is a {art.kind!r} artifact; this surface "
            "serves CTC artifacts (transducer artifacts route "
            "automatically; embed artifacts run under a8t-embed)")
    vocab_list = art.vocab
    index2vocab = revlut({v: i for i, v in enumerate(vocab_list)})
    decoder = build_beam_decoder(args, vocab_list)
    cfg = SimpleNamespace(conv_features=art.conv_features)
    forward = art.forward
    return cfg, forward, vocab_list, index2vocab, decoder, art


def build_acoustic(args):
    """Model + restored params from CLI args (no jit, no device_put).

    Returns ``(cfg, model, params, vocab_list, index2vocab)`` — the
    common front half of :func:`load_acoustic` and ``a8t-export``.
    """
    Offsets.remap_fairseq_ctc()
    vocab_list = read_vocab_list(args.dict_file)
    index2vocab = revlut({v: i for i, v in enumerate(vocab_list)})

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = AcousticConfig(
        num_labels=len(vocab_list), d_model=args.d_model,
        num_heads=args.num_heads, num_layers=args.num_layers, d_ff=args.d_ff,
        timestep_masking=0.0, channel_masking=0.0, **topology_kwargs(args))
    model = Wav2Vec2AcousticModel(config=cfg, dtype=dtype)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))["params"]
    params, _, _ = resolve_restart(args.checkpoint, init, ctc=True,
                                   num_layers=args.num_layers,
                                   **topology_kwargs(args))
    if getattr(args, "quantize", "none") == "int8":
        from audio8_tpu.ops.quant import quantize_model_params

        params = quantize_model_params(params)
    return cfg, model, params, vocab_list, index2vocab


def load_acoustic(args):
    """Build the jitted eval stack a decoding surface needs from CLI args.

    Returns ``(cfg, forward, vocab_list, index2vocab, decoder)`` where
    ``forward(signal (B, T) f32, lengths (B,)) -> (log_probs, frames)``
    is jitted with the restored parameters closed over. Shared by the
    one-shot CLI below and the HTTP server (`cli/serve.py`).
    """
    cfg, model, params, vocab_list, index2vocab = build_acoustic(args)

    decoder = build_beam_decoder(args, vocab_list)

    # params as a jit ARGUMENT, not a closure: closed-over arrays embed in
    # the HLO as constants, which overflows the axon remote-compile relay
    # (HTTP 413) at real model sizes and bloats compiles everywhere else.
    # On a multi-chip host the params replicate over a ('data',) mesh so
    # the server can shard request batches across chips (mesh DP serving;
    # cli/serve.py snaps its batch to the device count).
    mesh = None
    if jax.device_count() > 1:
        from audio8_tpu.parallel.sharding import (DP_ONLY_RULES, make_mesh,
                                                  shard_params)

        mesh = make_mesh(data=-1, model=1)
        params = shard_params(params, mesh, DP_ONLY_RULES)
    else:
        params = jax.device_put(params)

    @jax.jit
    def _forward(p, signal, lengths):
        lp, mask = model.apply({"params": p}, signal, lengths)
        return lp, jnp.sum(mask, axis=-1)

    def forward(signal, lengths):
        return _forward(params, signal, lengths)

    forward.mesh = mesh
    return cfg, forward, vocab_list, index2vocab, decoder


def load_transducer(args):
    """Jitted decode stack for an a8t-train-transducer checkpoint.

    Returns ``(cfg, decode, index2vocab, model, params)`` where
    ``decode(signal (B, T), lengths (B,)) -> (tokens, lengths)`` runs
    the batched transducer search on device — greedy
    (Transducer.decode) or, when ``args.beam > 1``, the 1-best of the
    time-synchronous beam search (Transducer.decode_beam).
    """
    from audio8_tpu.config import TransducerConfig
    from audio8_tpu.models.transducer import Transducer

    Offsets.remap_fairseq_ctc()
    vocab_list = read_vocab_list(args.dict_file)
    index2vocab = revlut({v: i for i, v in enumerate(vocab_list)})
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = TransducerConfig(
        vocab_size=len(vocab_list), d_model=args.d_model,
        num_heads=args.num_heads, num_layers=args.num_layers, d_ff=args.d_ff,
        timestep_masking=0.0, channel_masking=0.0,
        pred_layers=args.pred_layers, pred_dim=args.pred_dim,
        pred_embed_dim=args.pred_embed_dim, d_joint=args.d_joint,
        **topology_kwargs(args))
    model = Transducer(config=cfg, dtype=dtype)
    init = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)),
                      jnp.asarray([16000], jnp.int32),
                      jnp.zeros((1, 8), jnp.int32))["params"]
    params, _, _ = resolve_restart(args.checkpoint, init, ctc=True,
                                   num_layers=args.num_layers,
                                   **topology_kwargs(args))
    params = jax.device_put(params)

    import functools

    @functools.partial(jax.jit,
                       static_argnames=("max_output_len", "max_symbols"))
    def _decode(p, signal, lengths, max_output_len, max_symbols):
        return model.apply({"params": p}, signal, lengths, max_output_len,
                           max_symbols, method=Transducer.decode)

    @functools.partial(jax.jit,
                       static_argnames=("beam", "max_output_len",
                                        "max_symbols"))
    def _decode_beam(p, signal, lengths, beam, max_output_len, max_symbols):
        return model.apply({"params": p}, signal, lengths, beam,
                           max_output_len, max_symbols,
                           method=Transducer.decode_beam)

    @functools.partial(jax.jit,
                       static_argnames=("max_output_len", "max_symbols"))
    def _decode_timed(p, signal, lengths, max_output_len, max_symbols):
        return model.apply({"params": p}, signal, lengths, max_output_len,
                           max_symbols, True, method=Transducer.decode)

    if args.beam > 1:
        def decode(signal, lengths):
            toks, n, _ = _decode_beam(params, signal, lengths, args.beam,
                                      args.max_decode_len,
                                      args.max_symbols_per_frame)
            return toks[:, 0], n[:, 0]  # 1-best of the sorted beams
    elif getattr(args, "timestamps", False):
        def decode(signal, lengths):
            return _decode_timed(params, signal, lengths,
                                 args.max_decode_len,
                                 args.max_symbols_per_frame)
    else:
        def decode(signal, lengths):
            return _decode(params, signal, lengths, args.max_decode_len,
                           args.max_symbols_per_frame)

    return cfg, decode, index2vocab, model, params


def load_transducer_stream(args):
    """Jitted (encode, decode_init, decode_frames) for a
    ``serve.TransducerStreamer`` — the chunked/streaming transducer path.

    Built from the same checkpoint stack as :func:`load_transducer`;
    the three fns close over nothing but the module (params ride as jit
    arguments, see the HTTP-413 note in :func:`load_acoustic`).
    """
    import functools

    from audio8_tpu.models.transducer import Transducer

    cfg, decode, index2vocab, model, params = load_transducer(args)

    @jax.jit
    def _encode(p, signal, lengths):
        enc, frames = model.apply({"params": p}, signal, lengths,
                                  method=Transducer.encode)
        return enc.astype(jnp.float32), frames

    @jax.jit
    def _decode_init(p):
        return model.apply({"params": p}, 1, method=Transducer.decode_init)

    @functools.partial(jax.jit, static_argnames=("max_symbols",))
    def _decode_frames(p, enc, n_frames, tokens, n, pred_out, carry,
                       max_symbols):
        return model.apply({"params": p}, enc, n_frames, tokens, n,
                           pred_out, carry, max_symbols,
                           method=Transducer.decode_frames)

    def encode(signal, lengths):
        return _encode(params, signal, lengths)

    def decode_init():
        return _decode_init(params)

    def decode_frames(enc, n_frames, tokens, n, pred_out, carry):
        return _decode_frames(params, enc, n_frames, tokens, n, pred_out,
                              carry, args.max_symbols_per_frame)

    return cfg, encode, decode_init, decode_frames, index2vocab


def _transducer_main(args):
    if args.lm or args.device_beam or args.quantize != "none":
        raise SystemExit(
            "--transducer: --lm/--device_beam/--quantize are CTC-path "
            "flags")
    if args.beam > 1 and args.chunk_seconds > 0:
        raise SystemExit(
            "--transducer beam search decodes whole utterances; the "
            "--chunk_seconds streaming path is greedy "
            "(serve.TransducerStreamer)")
    if args.timestamps and (args.chunk_seconds > 0 or args.beam > 1
                            or args.target_type != "ltr"):
        raise SystemExit(
            "--transducer --timestamps: whole-utterance greedy decode "
            "with --target_type ltr only (word boundaries come from the "
            "'|' letter unit)")
    stream_budget = args.max_decode_len or 8_000
    args.max_decode_len = args.max_decode_len or 200
    postproc = postproc_bpe if args.target_type == "bpe" else postproc_letters
    reader = SoundfileAudioReader()
    sr = args.target_sample_rate

    streamer = None
    if args.chunk_seconds > 0:
        from audio8_tpu.serve import TransducerStreamer

        cfg, encode, decode_init, decode_frames, index2vocab = (
            load_transducer_stream(args))
        chunk = int(args.chunk_seconds * sr)
        if args.lane_align:
            from audio8_tpu.config import lane_aligned_chunk
            chunk = lane_aligned_chunk(chunk, cfg.conv_features)
        streamer = TransducerStreamer(
            encode, decode_init, decode_frames, cfg.conv_features,
            chunk_samples=chunk,
            context_samples=int(args.context_seconds * sr),
            max_output_len=stream_budget)
    else:
        cfg, decode, index2vocab, _, _ = load_transducer(args)

    from audio8_tpu.ops.align import total_stride, word_timestamps

    frame_sec = total_stride(cfg.conv_features) / sr
    results = []
    for path in args.audio:
        wav = np.asarray(reader.read(path), np.float32)
        if args.vad:
            from audio8_tpu.ops.vad import speech_segments

            segs = speech_segments(wav, sr)
        else:
            segs = [(0, len(wav))]
        texts, words = [], []
        for a, b in segs:
            seg = wav[a:b]
            if streamer is not None:
                streamer.reset()
                streamer.feed(seg)
                text = streamer.finish_text(index2vocab, postproc=postproc)
            else:
                t_pad = (len(seg) + sr - 1) // sr * sr
                signal = np.zeros((1, t_pad), np.float32)
                signal[0, :len(seg)] = seg
                out = decode(jnp.asarray(signal),
                             jnp.asarray([len(seg)], jnp.int32))
                toks, lens = out[0], out[1]
                k = int(np.asarray(lens)[0])
                ids = np.asarray(toks)[0, :k]
                text = postproc([index2vocab[int(i)] for i in ids])
                if args.timestamps:
                    times = np.asarray(out[2])[0, :k]
                    lps = np.asarray(out[3])[0, :k]
                    align = list(zip(ids.tolist(), times.tolist(),
                                     lps.tolist()))
                    off = a / sr
                    for w in word_timestamps(align, index2vocab,
                                             frame_sec):
                        w["start"] = round(w["start"] + off, 3)
                        w["end"] = round(w["end"] + off, 3)
                        words.append(w)
            if text:
                texts.append(text)
        text = " ".join(texts)
        if args.timestamps:
            import json

            row = {"file": path, "text": text, "words": words}
            if args.vad:
                row["segments"] = [[round(a / sr, 3), round(b / sr, 3)]
                                   for a, b in segs]
            results.append(row)
            print(json.dumps(row))
        else:
            results.append((path, text))
            print(f"{path}\t{text}")
    return results


def _exported_transducer_main(args):
    """Transcribe through an a8t-export transducer artifact: the
    serialized encode/decode_init/decode_frames entries drive a
    ``serve.TransducerStreamer`` (greedy resumable lattice search) —
    no model code, any audio length through the artifact's fixed
    shapes."""
    if args.beam > 1 or args.timestamps or args.lm or args.device_beam:
        raise SystemExit(
            "exported transducer artifacts decode with the greedy "
            "streaming lattice search: --beam/--timestamps/--lm/"
            "--device_beam need the checkpoint path (--transducer)")
    from audio8_tpu.export import load_artifact
    from audio8_tpu.serve import TransducerStreamer

    art = load_artifact(args.exported)
    index2vocab = revlut({v: i for i, v in enumerate(art.vocab)})
    postproc = postproc_bpe if args.target_type == "bpe" else postproc_letters
    sr = art.sample_rate
    streamer = TransducerStreamer(
        art.encode, art.decode_init, art.decode_frames, art.conv_features,
        chunk_samples=art.chunk_samples,
        context_samples=int(args.context_seconds * sr),
        window_frames=art.window_frames,
        max_output_len=art.max_output_len)
    reader = SoundfileAudioReader()
    results = []
    for path in args.audio:
        wav = np.asarray(reader.read(path), np.float32)
        if args.vad:
            from audio8_tpu.ops.vad import speech_segments

            segs = speech_segments(wav, sr)
        else:
            segs = [(0, len(wav))]
        texts = []
        for a, b in segs:
            streamer.reset()
            streamer.feed(wav[a:b])
            text = streamer.finish_text(index2vocab, postproc=postproc)
            if text:
                texts.append(text)
        text = " ".join(texts)
        results.append((path, text))
        print(f"{path}\t{text}")
    return results


def _transcribe_wav(wav, forward, ct, decoder, index2vocab, sr,
                    postproc=postproc_letters):
    """One waveform -> ``(text, (T', V) np log-probs)`` via the chunked
    (any length, one compiled program) or one-shot (pad to whole
    seconds) path."""
    if ct is not None:
        from audio8_tpu.serve import decode_stitched

        lp = ct.log_probs(wav)
        return decode_stitched(lp, index2vocab, decoder,
                               postproc=postproc), lp
    t_pad = (len(wav) + sr - 1) // sr * sr
    signal = np.zeros((1, t_pad), np.float32)
    signal[0, :len(wav)] = wav
    lp, frames = forward(jnp.asarray(signal),
                         jnp.asarray([len(wav)], jnp.int32))
    n = int(frames[0])
    lp = np.asarray(lp[0, :n], np.float32)
    if decoder is not None:
        chars = decoder.run(lp[None, ...], [n], n_best=1)[0]
    else:
        ids = greedy_collapse(np.argmax(lp, -1).astype(np.int32), Offsets.GO)
        chars = [index2vocab[i] for i in ids]
    return postproc(chars), lp


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.exported:
        from audio8_tpu.export import artifact_kind

        if artifact_kind(args.exported) == "transducer":
            return _exported_transducer_main(args)
    if args.transducer:
        return _transducer_main(args)
    if args.timestamps and args.target_type != "ltr":
        raise SystemExit("--timestamps requires --target_type ltr: word "
                         "boundaries come from the '|' letter unit "
                         "(ops/align.py)")
    postproc = postproc_bpe if args.target_type == "bpe" else postproc_letters
    art = None
    if args.exported:
        cfg, forward, _, index2vocab, decoder, art = (
            load_exported_acoustic(args))
        sr = art.sample_rate
    else:
        cfg, forward, _, index2vocab, decoder = load_acoustic(args)
        sr = args.target_sample_rate
    reader = SoundfileAudioReader()
    from audio8_tpu.ops.align import timestamped_words, total_stride

    frame_sec = total_stride(cfg.conv_features) / sr
    ct = None
    if args.chunk_seconds > 0:
        from audio8_tpu.serve import ChunkedTranscriber

        chunk = int(args.chunk_seconds * sr)
        if art is not None:
            # the artifact's entry table IS the shape menu: window on
            # the smallest exported size that covers the request
            chunk = art.entry_samples(chunk)
        elif args.lane_align:
            from audio8_tpu.config import lane_aligned_chunk
            chunk = lane_aligned_chunk(chunk, cfg.conv_features)
        ct = ChunkedTranscriber(
            forward, cfg.conv_features,
            chunk_samples=chunk,
            context_samples=int(args.context_seconds * sr))

    results = []
    for path in args.audio:
        wav = np.asarray(reader.read(path), np.float32)
        if args.vad:
            from audio8_tpu.ops.vad import speech_segments

            segs = speech_segments(wav, sr)
        else:
            segs = [(0, len(wav))]
        texts, words = [], []
        for a, b in segs:
            text, lp = _transcribe_wav(wav[a:b], forward, ct, decoder,
                                       index2vocab, sr, postproc)
            if text:
                texts.append(text)
            if args.timestamps:
                off = a / sr
                for w in timestamped_words(lp, index2vocab, Offsets.GO,
                                           frame_sec):
                    w["start"] = round(w["start"] + off, 3)
                    w["end"] = round(w["end"] + off, 3)
                    words.append(w)
        text = " ".join(texts)
        if args.timestamps:
            import json

            row = {"file": path, "text": text, "words": words}
            if args.vad:
                row["segments"] = [[round(a / sr, 3), round(b / sr, 3)]
                                   for a, b in segs]
            results.append(row)
            print(json.dumps(row))
        else:
            results.append((path, text))
            print(f"{path}\t{text}")
    return results


if __name__ == "__main__":
    main()
