"""`a8t-serve`: HTTP transcription endpoint over a fixed-shape TPU program.

Production serving surface the reference does not have (its inference
story ends at the batch eval driver, /root/reference/audio8/test.py):
one process compiles the acoustic forward once at startup, then serves

  GET  /healthz            -> {"ok": true, model info, batcher stats}
  POST /transcribe         -> {"text", "audio_seconds", "latency_ms"}
       body: WAV or FLAC bytes (FLAC detected by magic/Content-Type)
  POST /stream             -> ndjson: {"partial"} lines as audio arrives,
       then {"text", "final": true, "audio_seconds"}
       body: raw mono PCM at the model sample rate, chunked
       transfer-encoding (or Content-Length); little-endian int16 by
       default, float32 with `X-Audio-Format: f32`

Long audio rides the ChunkedTranscriber (fixed-shape overlapped
chunks); /stream rides the StreamingTranscriber (same stitched math,
incremental, bounded memory). Concurrent requests and streams share
MXU batches through the MicroBatcher dispatcher; without it, device
dispatch serializes behind a lock. Partials decode greedily; the final
line uses the beam/LM decoder when configured.

Usage:
  a8t-serve --checkpoint ckpt --dict_file dict.ltr.txt --port 8000
  curl -s --data-binary @utt.wav localhost:8000/transcribe
  arecord -f S16_LE -r 16000 -t raw | curl -sN -T - \
      -H 'Transfer-Encoding: chunked' localhost:8000/stream
"""
from __future__ import annotations

import json
import logging
import os
import tempfile
import threading
import time
from argparse import ArgumentParser
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

from audio8_tpu.cli.common import add_common_model_args, apply_preset
from audio8_tpu.config import lane_aligned_chunk
from audio8_tpu.data.audio import SoundfileAudioReader
from audio8_tpu.utils import Offsets, str2bool
from audio8_tpu.serve import (ChunkedTranscriber, MicroBatcher,
                              StreamingTranscriber, decode_stitched)

logger = logging.getLogger("audio8_tpu.serve")


class _NullLock:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


_NULL_LOCK = _NullLock()


class TranscribeService:
    """Decode-bytes -> text around one ChunkedTranscriber.

    ``transcriber.log_probs`` dispatches to the device, so calls
    serialize through ``_lock``; the host-side text decode (greedy or
    beam+LM) happens outside it.
    """

    def __init__(self, transcriber: ChunkedTranscriber, index2vocab: dict,
                 decoder=None, sample_rate: int = 16_000, info: dict = None,
                 timestamps: bool = False, postproc=None):
        self.transcriber = transcriber
        self.index2vocab = index2vocab
        self.decoder = decoder
        self.sample_rate = sample_rate
        self.info = dict(info or {})
        self.timestamps = timestamps
        self.postproc = postproc
        self._lock = threading.Lock()
        self._reader = SoundfileAudioReader()

    def decode_bytes(self, data: bytes, content_type: str = "") -> np.ndarray:
        """Audio container bytes -> float32 waveform."""
        if not data:
            raise ValueError("empty request body")
        is_flac = data[:4] == b"fLaC" or "flac" in content_type.lower()
        suffix = ".flac" if is_flac else ".wav"
        fd, path = tempfile.mkstemp(suffix=suffix)
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            return np.asarray(self._reader.read(path), np.float32)
        finally:
            os.unlink(path)

    def transcribe(self, data: bytes, content_type: str = "") -> dict:
        wav = self.decode_bytes(data, content_type)
        t0 = time.perf_counter()
        if self.transcriber.batcher is not None:
            # the MicroBatcher's dispatcher thread serializes device
            # access; concurrent requests pack into shared batches
            lp = self.transcriber.log_probs(wav)
        else:
            with self._lock:
                lp = self.transcriber.log_probs(wav)
        text = decode_stitched(lp, self.index2vocab, self.decoder,
                               postproc=self.postproc)
        out = {"text": text,
               "audio_seconds": round(len(wav) / self.sample_rate, 3),
               "latency_ms": round((time.perf_counter() - t0) * 1e3, 1)}
        if self.timestamps:
            from audio8_tpu.ops.align import timestamped_words

            frame_sec = self.transcriber.stride / self.sample_rate
            out["words"] = timestamped_words(lp, self.index2vocab,
                                             Offsets.GO, frame_sec)
        return out

    def health(self) -> dict:
        out = {"ok": True, **self.info}
        b = self.transcriber.batcher
        if b is not None:
            out["batcher"] = {"dispatches": b.dispatches, "rows": b.rows}
        return out

    def new_stream(self) -> StreamingTranscriber:
        """Fresh per-request incremental transcriber sharing the device
        path (and cross-stream batching) of the one-shot endpoint."""
        t = self.transcriber
        return StreamingTranscriber(t.forward, t.conv_features,
                                    chunk_samples=t.chunk,
                                    context_samples=t.context,
                                    batcher=t.batcher)

    def final_text(self, st, lock=_NULL_LOCK) -> str:
        """Flush a finished stream to its final text (beam/LM decoder
        applied here; partials stay greedy). ``lock`` guards only the
        device flush — the host-side text decode runs outside it."""
        with lock:
            lp = st.finish()
        return decode_stitched(lp, self.index2vocab, self.decoder,
                               postproc=self.postproc)

    def stream_lock(self):
        """Device-dispatch guard for streams: a real lock only when no
        MicroBatcher carries the heavy encoder forwards. With a batcher,
        feeds must NOT hold a shared lock (a blocked feed waiting for
        its batched row would prevent other requests from co-filling the
        batch). Small per-stream device calls outside the batcher (the
        transducer's decode windows) stay unserialized — JAX dispatch is
        thread-safe and they are minor next to the encoder chunks."""
        if self.transcriber.batcher is not None:
            return _NULL_LOCK
        return self._lock


class TransducerService(TranscribeService):
    """RNN-T serving: per-request ``TransducerStreamer`` state instead of
    stateless stitched log-probs. ``/transcribe`` and ``/stream`` both
    ride the resumable windowed lattice search; the encoder chunks share
    cross-request MicroBatcher batches exactly like the CTC path."""

    def __init__(self, streamer_factory, index2vocab: dict,
                 sample_rate: int = 16_000, info: dict = None,
                 postproc=None):
        self._factory = streamer_factory
        probe = streamer_factory()  # geometry/batcher probe for health()
        super().__init__(probe, index2vocab, decoder=None,
                         sample_rate=sample_rate, info=info,
                         timestamps=False, postproc=postproc)

    def new_stream(self):
        return self._factory()

    def final_text(self, st, lock=_NULL_LOCK) -> str:
        with lock:
            st.finish()
        return st.text_so_far(self.index2vocab, postproc=self.postproc)

    def transcribe(self, data: bytes, content_type: str = "") -> dict:
        wav = self.decode_bytes(data, content_type)
        t0 = time.perf_counter()
        st = self.new_stream()
        lock = self.stream_lock()
        with lock:
            st.feed(wav)
        text = self.final_text(st, lock)
        return {"text": text,
                "audio_seconds": round(len(wav) / self.sample_rate, 3),
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 1)}


def pcm_to_float(data: bytes, fmt: str) -> np.ndarray:
    """Raw little-endian PCM bytes -> float32 waveform in [-1, 1]."""
    if fmt == "f32":
        return np.frombuffer(data, "<f4").astype(np.float32)
    return np.frombuffer(data, "<i2").astype(np.float32) / 32768.0


def make_server(service: TranscribeService, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    """Bind a ThreadingHTTPServer serving ``service`` (port 0 = ephemeral)."""

    class Metrics:
        """Thread-safe request counters rendered in Prometheus text
        format at GET /metrics (production-serving observability the
        reference has no equivalent of).

        Semantics: requests are observed BEFORE their response is
        written, so by the time a client holds a response the counters
        already include it (scrape-after-response is consistent).
        Consequently ``a8t_request_seconds`` measures *service* time —
        read + decode + transcribe — excluding the response
        serialization/socket write (sub-ms for JSON transcripts); the
        /stream route is the exception, where the response IS the work
        and the duration covers the full stream."""

        def __init__(self):
            self._lock = threading.Lock()
            self.requests = {}       # (route, code) -> count
            self.seconds = {}        # route -> [sum, count]
            self.audio_seconds = 0.0

        def observe(self, route: str, code: int, elapsed: float,
                    audio_seconds: float = 0.0):
            with self._lock:
                key = (route, code)
                self.requests[key] = self.requests.get(key, 0) + 1
                s = self.seconds.setdefault(route, [0.0, 0])
                s[0] += elapsed
                s[1] += 1
                self.audio_seconds += audio_seconds

        def render(self) -> str:
            with self._lock:
                lines = [
                    "# TYPE a8t_requests_total counter",
                ]
                for (route, code), n in sorted(self.requests.items()):
                    lines.append(
                        f'a8t_requests_total{{route="{route}",'
                        f'code="{code}"}} {n}')
                lines.append("# TYPE a8t_request_seconds summary")
                for route, (tot, cnt) in sorted(self.seconds.items()):
                    lines.append(
                        f'a8t_request_seconds_sum{{route="{route}"}} '
                        f"{tot:.6f}")
                    lines.append(
                        f'a8t_request_seconds_count{{route="{route}"}} '
                        f"{cnt}")
                lines.append("# TYPE a8t_audio_seconds_total counter")
                lines.append(
                    f"a8t_audio_seconds_total {self.audio_seconds:.3f}")
            b = service.transcriber.batcher
            if b is not None:
                lines.append("# TYPE a8t_batcher_dispatches_total counter")
                lines.append(f"a8t_batcher_dispatches_total {b.dispatches}")
                lines.append("# TYPE a8t_batcher_rows_total counter")
                lines.append(f"a8t_batcher_rows_total {b.rows}")
            return "\n".join(lines) + "\n"

    metrics = Metrics()

    class Handler(BaseHTTPRequestHandler):
        # chunked responses (the /stream ndjson) require HTTP/1.1;
        # _send always sets Content-Length so keep-alive stays correct
        protocol_version = "HTTP/1.1"

        def _send(self, code: int, payload: dict):
            if code >= 400:
                # error paths may leave request-body bytes unread, which
                # would corrupt the next request on a kept-alive socket
                self.close_connection = True
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/health"):
                self._send(200, service.health())
            elif self.path == "/metrics":
                body = metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path == "/stream":
                t0 = time.perf_counter()
                audio_sec, code = self._stream()
                metrics.observe("/stream", code,
                                time.perf_counter() - t0, audio_sec)
                return
            if self.path != "/transcribe":
                self._send(404, {"error": f"no route {self.path}"})
                return
            t0 = time.perf_counter()
            try:
                n = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(n)
                out = service.transcribe(
                    data, self.headers.get("Content-Type", ""))
                code, payload = 200, out
                audio_sec = out.get("audio_seconds", 0.0)
            except (ValueError, KeyError) as e:
                code, payload, audio_sec = 400, {"error": str(e)}, 0.0
            except Exception as e:  # noqa: BLE001 — keep the server alive
                logger.exception("transcribe failed")
                code, payload, audio_sec = (
                    500, {"error": f"{type(e).__name__}: {e}"}, 0.0)
            # observe BEFORE writing the response: once a client has its
            # response, a /metrics scrape must already include that
            # request (the old after-send order let a scrape racing the
            # handler thread under-report a completed request)
            metrics.observe("/transcribe", code,
                            time.perf_counter() - t0, audio_sec)
            self._send(code, payload)

        def _body_blocks(self):
            """Yield request-body byte blocks, honoring chunked
            transfer-encoding (stdlib http.server does not decode it)."""
            if "chunked" in self.headers.get("Transfer-Encoding", "").lower():
                while True:
                    size = int(self.rfile.readline().split(b";")[0], 16)
                    if size == 0:
                        while self.rfile.readline() not in (b"\r\n", b"\n",
                                                            b""):
                            pass  # trailers
                        return
                    yield self.rfile.read(size)
                    self.rfile.readline()  # chunk-terminating CRLF
            else:
                left = int(self.headers.get("Content-Length", 0))
                while left > 0:
                    block = self.rfile.read(min(left, 65536))
                    if not block:
                        return
                    left -= len(block)
                    yield block

        def _emit(self, payload: dict):
            line = (json.dumps(payload) + "\n").encode()
            self.wfile.write(b"%x\r\n" % len(line) + line + b"\r\n")
            self.wfile.flush()

        def _stream(self):
            """Serve one /stream request; returns (audio_seconds, code)
            for the metrics counters."""
            fmt = self.headers.get("X-Audio-Format", "s16").lower()
            if fmt not in ("s16", "f32"):
                self._send(400, {"error": f"unknown X-Audio-Format {fmt}"})
                return 0.0, 400
            width = 4 if fmt == "f32" else 2
            st = service.new_stream()
            lock = service.stream_lock()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                partial, leftover = "", b""
                for block in self._body_blocks():
                    data = leftover + block
                    usable = len(data) - len(data) % width
                    leftover = data[usable:]
                    with lock:
                        st.feed(pcm_to_float(data[:usable], fmt))
                    # greedy partials (cheap host decode); beam/LM waits
                    # for the final
                    text = st.text_so_far(service.index2vocab,
                                          postproc=service.postproc)
                    if text != partial:
                        partial = text
                        self._emit({"partial": text})
                text = service.final_text(st, lock)
                self._emit({"text": text, "final": True,
                            "audio_seconds": round(
                                st.samples_fed / service.sample_rate, 3)})
                code = 200
            except Exception as e:  # noqa: BLE001 — keep the server alive
                logger.exception("stream failed")
                self._emit({"error": f"{type(e).__name__}: {e}",
                            "final": True})
                code = 500
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()
            # a failed stream may leave body bytes unread
            self.close_connection = True
            return st.samples_fed / service.sample_rate, code

        def log_message(self, fmt, *a):  # route to logging, not stderr
            logger.info("%s %s", self.address_string(), fmt % a)

    return ThreadingHTTPServer((host, port), Handler)


def parse_args(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint",
                   help="a8t checkpoint, fairseq .pt, or HF dir")
    p.add_argument("--dict_file",
                   help="fairseq dict.ltr.txt or HF vocab.json")
    p.add_argument("--exported",
                   help="a8t-export artifact directory: serve the "
                        "serialized StableHLO forward instead of "
                        "building the model from a checkpoint")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--device_beam", type=str2bool, default=False,
                   help="no-LM batch beam decode on device "
                        "(ops/beam_jax.py); wins for wide beams, see "
                        "docs/PERF.md")
    p.add_argument("--quantize", choices=["none", "int8"], default="none",
                   help="int8: post-training weight quantization of the "
                        "Dense kernels onto the int8 MXU path (ops/quant.py)")
    p.add_argument("--timestamps", type=str2bool, default=False,
                   help="include word-level {start, end, confidence} from "
                        "the greedy CTC alignment in /transcribe responses")
    p.add_argument("--target_type", choices=["ltr", "bpe"], default="ltr",
                   help="unit type the checkpoint was trained on: 'ltr' "
                        "joins letters on '|' word boundaries, 'bpe' "
                        "strips '@@ ' continuations (ops/metrics.py)")
    p.add_argument("--lm", help="ARPA LM for beam decoding")
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--beta", type=float, default=5.0)
    p.add_argument("--transducer", type=str2bool, default=False,
                   help="the checkpoint is an a8t-train-transducer model: "
                        "serve the streaming RNN-T lattice search "
                        "(serve.TransducerStreamer) instead of CTC")
    p.add_argument("--pred_layers", type=int, default=2)
    p.add_argument("--pred_dim", type=int, default=512)
    p.add_argument("--pred_embed_dim", type=int, default=256)
    p.add_argument("--d_joint", type=int, default=512)
    p.add_argument("--max_decode_len", type=int, default=8_000,
                   help="transducer label budget per request/stream")
    p.add_argument("--max_symbols_per_frame", type=int, default=4)
    p.add_argument("--chunk_seconds", type=float, default=30.0)
    p.add_argument("--context_seconds", type=float, default=2.0)
    p.add_argument("--lane_align", type=str2bool, default=True,
                   help="snap the chunk window UP so its frame count sits "
                        "on the 128-lane MXU tile boundary (free audio in "
                        "tiles XLA pads to anyway)")
    p.add_argument("--batch", type=int, default=4,
                   help="chunk batch per device dispatch")
    p.add_argument("--batch_wait_ms", type=float, default=2.0,
                   help="max wait for co-batching concurrent requests; "
                        "0 disables the cross-request MicroBatcher")
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


def _serve_transducer(args):
    """RNN-T serving branch of main(): a checkpoint (--transducer) or
    an a8t-export transducer artifact (--exported)."""
    if (args.timestamps or args.beam > 1 or args.lm or args.device_beam
            or args.quantize != "none"):
        raise SystemExit(
            "the transducer path serves the greedy streaming lattice "
            "search: --timestamps/--beam/--lm/--device_beam/--quantize "
            "are CTC-path flags")
    from audio8_tpu.ops.metrics import postproc_bpe, postproc_letters
    from audio8_tpu.serve import TransducerStreamer
    from audio8_tpu.utils import revlut

    postproc = postproc_bpe if args.target_type == "bpe" else postproc_letters
    if args.exported:
        from audio8_tpu.export import load_artifact

        art = load_artifact(args.exported)
        index2vocab = revlut({v: i for i, v in enumerate(art.vocab)})
        conv_features = art.conv_features
        encode, decode_init, decode_frames = (
            art.encode, art.decode_init, art.decode_frames)
        sr = art.sample_rate
        chunk = art.chunk_samples  # the artifact's entry IS the shape
        window = art.window_frames
        budget = art.max_output_len
        model_name = "wav2vec2-transducer (exported)"
    else:
        from audio8_tpu.cli.transcribe import load_transducer_stream

        cfg, encode, decode_init, decode_frames, index2vocab = (
            load_transducer_stream(args))
        conv_features = cfg.conv_features
        sr = args.target_sample_rate
        chunk = int(args.chunk_seconds * sr)
        if args.lane_align:
            chunk = lane_aligned_chunk(chunk, conv_features)
        window = 256
        budget = args.max_decode_len
        model_name = "wav2vec2-transducer"
    batcher = None
    if args.batch_wait_ms > 0:
        batcher = MicroBatcher(encode, chunk, batch_size=args.batch,
                               max_wait_ms=args.batch_wait_ms)

    def factory():
        # decode window well under frames_per_chunk: windowing is exact
        # (tests/test_transducer_streaming.py), and a small window lets
        # /stream emit partials as soon as the first chunk's stable
        # frames land instead of waiting for a full chunk's worth more
        return TransducerStreamer(
            encode, decode_init, decode_frames, conv_features,
            chunk_samples=chunk,
            context_samples=int(args.context_seconds * sr),
            window_frames=window,
            max_output_len=budget, batcher=batcher)

    # exported artifacts record the REAL dims in meta.json; CLI flag
    # defaults would misreport them on /healthz
    dims = (dict(d_model=art.meta.get("d_model"),
                 num_layers=art.meta.get("num_layers"))
            if args.exported else
            dict(d_model=args.d_model, num_layers=args.num_layers))
    service = TransducerService(
        factory, index2vocab, sample_rate=sr, postproc=postproc,
        info={"model": model_name, **dims,
              "chunk_seconds": round(chunk / sr, 3)})
    logger.info("warming up (compiling %d-sample chunk encode + decode "
                "window)", chunk)
    st = factory()
    st.feed(np.zeros(sr, np.float32))
    st.finish()
    srv = make_server(service, args.host, args.port)
    logger.info("serving on %s:%d", *srv.server_address)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return srv


def main(argv=None):
    args = parse_args(argv)
    # force=True: importing jax installs absl's root handler at WARNING,
    # which would make a plain basicConfig a silent no-op
    logging.basicConfig(level=logging.INFO, force=True)
    from audio8_tpu.cli.transcribe import load_acoustic

    if args.exported:
        from audio8_tpu.export import artifact_kind

        if artifact_kind(args.exported) == "transducer":
            return _serve_transducer(args)
    if args.transducer:
        return _serve_transducer(args)
    if args.timestamps and args.target_type != "ltr":
        raise SystemExit("--timestamps requires --target_type ltr: word "
                         "boundaries come from the '|' letter unit "
                         "(ops/align.py)")
    art = None
    if args.exported:
        from audio8_tpu.cli.transcribe import load_exported_acoustic

        cfg, forward, _, index2vocab, decoder, art = (
            load_exported_acoustic(args))
        sr = art.sample_rate
        model_name = "wav2vec2-ctc (exported)"
    else:
        cfg, forward, _, index2vocab, decoder = load_acoustic(args)
        sr = args.target_sample_rate
        model_name = "wav2vec2-ctc"
    from audio8_tpu.ops.metrics import postproc_bpe, postproc_letters

    postproc = postproc_bpe if args.target_type == "bpe" else postproc_letters
    chunk = int(args.chunk_seconds * sr)
    if art is not None:
        # the artifact's entry table IS the shape menu
        chunk = art.entry_samples(chunk)
    elif args.lane_align:
        chunk = lane_aligned_chunk(chunk, cfg.conv_features)
    mesh = getattr(forward, "mesh", None)
    if mesh is not None:
        # multi-chip host: shard the request batch over the 'data' mesh
        # axis (params are already replicated by load_acoustic). Batch
        # rows snap up to the device count; padding rows carry length 0.
        from audio8_tpu.parallel.sharding import batch_sharding

        ndev = jax.device_count()
        if args.batch % ndev:
            args.batch = -(-args.batch // ndev) * ndev
            logger.info("snapped --batch to %d (multiple of %d devices)",
                        args.batch, ndev)
        bsh = batch_sharding(mesh)
        inner_forward = forward

        def forward(signal, lengths):  # noqa: F811 - deliberate rewrap
            return inner_forward(
                jax.device_put(np.asarray(signal), bsh),
                jax.device_put(np.asarray(lengths), bsh))

    batcher = None
    if args.batch_wait_ms > 0:
        batcher = MicroBatcher(forward, chunk, batch_size=args.batch,
                               max_wait_ms=args.batch_wait_ms)
    ct = ChunkedTranscriber(forward, cfg.conv_features,
                            chunk_samples=chunk,
                            context_samples=int(args.context_seconds * sr),
                            batch_size=args.batch, batcher=batcher)
    service = TranscribeService(
        ct, index2vocab, decoder, sample_rate=sr,
        timestamps=args.timestamps, postproc=postproc,
        info={"model": model_name, "beam": args.beam,
              **(dict(d_model=art.meta.get("d_model"),
                      num_layers=art.meta.get("num_layers"))
                 if art is not None else
                 dict(d_model=args.d_model, num_layers=args.num_layers)),
              # the lane-aligned (snapped) window actually served, not
              # the requested flag value
              "chunk_seconds": round(ct.chunk / sr, 3)})
    # warm the XLA programs so the first request doesn't pay the compile
    logger.info("warming up (compiling %d-sample chunk forward)", ct.chunk)
    service.transcriber.log_probs(np.zeros(sr, np.float32))
    srv = make_server(service, args.host, args.port)
    logger.info("serving on %s:%d", *srv.server_address)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
    return srv


if __name__ == "__main__":
    main()
