"""Serving helpers: long-audio transcription through fixed-shape chunks.

The reference bounds clip length data-side (max_sample_len ~20 s,
/root/reference/audio8/pretrain.py:45) and has no long-audio path. On
TPU the constraint is compile-shape stability: one XLA program must
serve any input length. ``ChunkedTranscriber`` slices the waveform into
fixed ``chunk_samples`` windows with ``context_samples`` of overlap on
each side, runs the acoustic forward on (batch, chunk) blocks, drops the
margin frames of interior chunks, and stitches per-frame log-probs —
after which greedy or prefix-beam decoding proceeds exactly as for a
single clip.

Overlap rationale: the encoder's receptive field is global (self
attention), so chunk boundaries perturb nearby frames; a ~2 s context
margin pushes the perturbation outside the kept frames. Accuracy equals
the unchunked forward for audio shorter than one chunk and degrades only
at stitch points otherwise.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Callable, List, Optional, Sequence

import numpy as np

from audio8_tpu.config import conv_output_length


class MicroBatcher:
    """Cross-request chunk batching: one device program, shared batches.

    Callers (HTTP threads, streams) submit fixed-length chunk rows; a
    single dispatcher thread packs up to ``batch_size`` pending rows —
    from ANY caller — into one ``(batch, chunk)`` dispatch of the jitted
    forward and hands each caller its row back. This is the TPU-idiomatic
    way to scale a serving endpoint: concurrent requests fill the MXU
    batch dimension instead of serializing whole forwards behind a lock.
    The reference has no serving path at all (its inference story ends at
    the batch eval driver, /root/reference/audio8/test.py).

    A lone row waits at most ``max_wait_ms`` for company before
    dispatching alone; rows already queued (e.g. one long request's many
    chunks) pack immediately. Device access is serialized by construction
    — the dispatcher is the only thread that touches ``forward``.
    """

    def __init__(self, forward: Callable, chunk_samples: int,
                 batch_size: int = 4, max_wait_ms: float = 2.0):
        self.forward = forward
        self.chunk = int(chunk_samples)
        self.batch = int(batch_size)
        self.max_wait = max_wait_ms / 1e3
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self.dispatches = 0          # device programs run (stats/tests)
        self.rows = 0                # rows served
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="a8t-microbatcher")
        self._thread.start()

    def submit_many(self, segs: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Enqueue chunk rows (each 1-D, len <= chunk); block until all
        are served; return per-row ``(T_chunk', V)`` log-probs."""
        items = []
        for seg in segs:
            if len(seg) > self.chunk:
                raise ValueError(f"row of {len(seg)} > chunk {self.chunk}")
            items.append([np.asarray(seg, np.float32), None,
                          threading.Event()])
        for it in items:
            self._q.put(it)
        for it in items:
            it[2].wait()
            if isinstance(it[1], BaseException):
                raise it[1]
        return [it[1] for it in items]

    def submit(self, seg: np.ndarray) -> np.ndarray:
        return self.submit_many([seg])[0]

    def close(self) -> None:
        self._q.put(None)
        self._thread.join(timeout=5)

    def _loop(self) -> None:
        import jax.numpy as jnp

        while True:
            first = self._q.get()
            if first is None:
                return
            block = [first]
            deadline = time.monotonic() + self.max_wait
            while len(block) < self.batch:
                try:
                    nxt = self._q.get(
                        timeout=max(deadline - time.monotonic(), 0))
                except queue.Empty:
                    break
                if nxt is None:
                    self._drain(block, None)
                    return
                block.append(nxt)
            sig = np.zeros((self.batch, self.chunk), np.float32)
            lens = np.zeros((self.batch,), np.int32)
            for j, it in enumerate(block):
                sig[j, :len(it[0])] = it[0]
                lens[j] = len(it[0])
            try:
                lp, _ = self.forward(jnp.asarray(sig), jnp.asarray(lens))
                lp = np.asarray(lp, np.float32)
            except Exception as e:  # propagate to every waiting caller
                self._drain(block, e)
                continue
            self.dispatches += 1
            self.rows += len(block)
            for j, it in enumerate(block):
                it[1] = lp[j]
                it[2].set()

    @staticmethod
    def _drain(block, exc) -> None:
        err = exc or RuntimeError("MicroBatcher closed")
        for it in block:
            it[1] = err
            it[2].set()


class ChunkedTranscriber:
    """Stitched log-probs + transcription for arbitrarily long audio.

    ``forward(signal (B, chunk) f32, lengths (B,) i32) -> (log_probs
    (B, T', V), frame_lengths (B,))`` — the jitted acoustic eval fn
    (cli/test.py's eval path). Chunk geometry is in samples.
    """

    def __init__(self, forward: Callable, conv_features: Sequence,
                 chunk_samples: int = 480_000,
                 context_samples: int = 32_000, batch_size: int = 4,
                 batcher: Optional[MicroBatcher] = None):
        if chunk_samples <= 2 * context_samples:
            raise ValueError("chunk must exceed twice the context margin")
        if batcher is not None and batcher.chunk != int(chunk_samples):
            raise ValueError("batcher chunk size mismatch")
        self.forward = forward
        self.batcher = batcher
        self.chunk = int(chunk_samples)
        self.context = int(context_samples)
        self.batch = int(batch_size)
        self.conv_features = list(conv_features)
        self.frames_per_chunk = conv_output_length(self.chunk, self.conv_features)
        # total stride of the conv stack (product of per-layer strides);
        # NOT chunk // frames_per_chunk — the receptive field eats a
        # fraction of a frame, and deriving the stride from that ratio
        # puts an off-by-one at every seam
        self.stride = 1
        for _, _, s in self.conv_features:
            self.stride *= s
        self.margin_frames = self.context // self.stride
        self.core = self.chunk - 2 * self.context
        if self.core % self.stride:
            # chunk starts must stay frame-aligned so local frame j of a
            # chunk at sample s is global frame s//stride + j
            self.core -= self.core % self.stride
        # the receptive field eats a few trailing frames per chunk; the
        # margin must cover that deficit or interior cuts would index
        # past the frames a chunk actually produces
        deficit = self.chunk // self.stride - self.frames_per_chunk
        if self.margin_frames <= deficit:
            raise ValueError(
                f"context_samples too small: margin {self.margin_frames} "
                f"frames must exceed the receptive-field deficit {deficit}")

    def _chunk_starts(self, n: int) -> List[int]:
        if n <= self.chunk:
            return [0]
        starts = list(range(0, n - 2 * self.context, self.core))
        return starts

    def log_probs(self, wav: np.ndarray) -> np.ndarray:
        """(T_total', V) stitched frame log-probs for a 1-D waveform.

        Stitching is exact: chunk starts are frame-aligned (stride
        multiples), so chunk-local frame ``j`` of the chunk at sample
        ``s`` is global frame ``s // stride + j``; interior cut points
        are single global frame indices, making the stitched sequence
        contiguous and exactly ``conv_output_length(len(wav))`` frames
        long."""
        wav = np.asarray(wav, np.float32).reshape(-1)
        n = len(wav)
        starts = self._chunk_starts(n)
        # global frame index where chunk k stops and chunk k+1 takes over
        cuts = [0]
        for s_next in starts[1:]:
            cuts.append(s_next // self.stride + self.margin_frames)
        cuts.append(conv_output_length(n, self.conv_features))
        segs = [wav[s:s + self.chunk] for s in starts]
        rows = self._row_log_probs(segs)
        pieces: List[np.ndarray] = []
        for k, (s, seg, row) in enumerate(zip(starts, segs, rows)):
            # exact conv frame count of this chunk's real samples (the
            # model's reshape-all pad mask may zero the final frame's
            # transformer input, but the frame exists and belongs in
            # the stitched sequence)
            exact = conv_output_length(len(seg), self.conv_features)
            valid = row[:min(exact, len(row))]
            base = s // self.stride
            lo = cuts[k] - base
            hi = min(cuts[k + 1] - base, len(valid))
            pieces.append(valid[lo:hi])
        return np.concatenate(pieces, axis=0) if pieces else np.zeros(
            (0, 1), np.float32)

    def _row_log_probs(self, segs: List[np.ndarray]) -> List[np.ndarray]:
        """Per-chunk ``(T_chunk', V)`` rows. With a ``MicroBatcher`` the
        rows ride shared cross-request batches; otherwise they pack into
        this transcriber's own ``(batch, chunk)`` dispatches. The
        forward's frame lengths are ignored either way: the reshape-all
        semantics undercount the tail by <=1 vs the exact conv count."""
        if self.batcher is not None:
            return self.batcher.submit_many(segs)
        import jax.numpy as jnp

        rows: List[np.ndarray] = []
        for i0 in range(0, len(segs), self.batch):
            block = segs[i0:i0 + self.batch]
            sig = np.zeros((self.batch, self.chunk), np.float32)
            lens = np.zeros((self.batch,), np.int32)
            for j, seg in enumerate(block):
                sig[j, :len(seg)] = seg
                lens[j] = len(seg)
            lp, _ = self.forward(jnp.asarray(sig), jnp.asarray(lens))
            lp = np.asarray(lp, np.float32)
            rows.extend(lp[j] for j in range(len(block)))
        return rows

    def transcribe(self, wav: np.ndarray, index2vocab: dict,
                   decoder=None, blank: Optional[int] = None,
                   postproc: Optional[Callable] = None) -> str:
        """Waveform -> text via greedy collapse (or a PrefixBeamSearch)."""
        return decode_stitched(self.log_probs(wav), index2vocab, decoder,
                               blank, postproc)


def decode_stitched(lp: np.ndarray, index2vocab: dict, decoder=None,
                    blank: Optional[int] = None,
                    postproc: Optional[Callable] = None) -> str:
    """(T', V) stitched frame log-probs -> text (greedy or beam decode)."""
    from audio8_tpu.ops.ctc import greedy_collapse
    from audio8_tpu.ops.metrics import postproc_letters
    from audio8_tpu.utils import Offsets

    if len(lp) == 0:
        return ""
    if decoder is not None:
        chars = decoder.run(lp[None, ...], [len(lp)], n_best=1)[0]
    else:
        b = Offsets.GO if blank is None else blank
        ids = greedy_collapse(np.argmax(lp, -1).astype(np.int32), b)
        chars = [index2vocab[i] for i in ids]
    return (postproc or postproc_letters)(chars)


class StreamingTranscriber(ChunkedTranscriber):
    """Incremental transcription: feed audio as it arrives, read partials.

    Produces the SAME stitched log-probs as ``ChunkedTranscriber`` on the
    concatenated waveform (guard-tested), but consumes the stream in
    bounded memory: a chunk is forwarded as soon as its samples (plus one
    lookahead sample proving it is not the final chunk) have arrived, its
    kept core frames are appended to the stable prefix, and everything
    before the next chunk's start is discarded. ``text_so_far`` decodes
    the stable prefix at any time; ``finish`` flushes the tail once the
    stream ends. The reference has no streaming path (clips are bounded
    data-side, /root/reference/audio8/pretrain.py:45); this is the
    TPU-native serving design: one fixed-shape XLA program, host-side
    stitching, O(chunk) state per stream.
    """

    def __init__(self, forward: Callable, conv_features: Sequence,
                 chunk_samples: int = 480_000,
                 context_samples: int = 32_000,
                 batcher: Optional[MicroBatcher] = None):
        super().__init__(forward, conv_features, chunk_samples=chunk_samples,
                         context_samples=context_samples, batch_size=1,
                         batcher=batcher)
        self.reset()

    def reset(self) -> None:
        """Forget all stream state; ready for a new utterance."""
        self._tail = np.zeros((0,), np.float32)   # retained raw samples
        self._tail_base = 0                       # absolute idx of _tail[0]
        self._next_chunk = 0                      # next chunk index to emit
        self._pieces: List[np.ndarray] = []       # stable stitched frames
        self._final: Optional[np.ndarray] = None

    @property
    def samples_fed(self) -> int:
        return self._tail_base + len(self._tail)

    def feed(self, samples: np.ndarray) -> None:
        """Append samples; forward any chunks that became complete."""
        if self._final is not None:
            raise RuntimeError("stream already finished; call reset()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        if len(samples) == 0:
            return
        self._tail = np.concatenate([self._tail, samples])
        # chunk k is provably interior once one sample past its window
        # has arrived: the stream end n can only grow, so start_{k+1}
        # stays < n - 2*context and the offline geometry keeps chunk k's
        # cut points exactly where we emit them now
        while self.samples_fed >= self._next_chunk * self.core + self.chunk + 1:
            start = self._next_chunk * self.core
            upper = (start + self.core) // self.stride + self.margin_frames
            self._emit(start, self.chunk, upper)
            self._next_chunk += 1
            drop = self._next_chunk * self.core - self._tail_base
            if drop > 0:
                self._tail = self._tail[drop:]
                self._tail_base += drop

    def _emit(self, start: int, seg_len: int, upper_cut: int) -> None:
        seg = self._tail[start - self._tail_base:
                         start - self._tail_base + seg_len]
        lp = self._row_log_probs([seg])[0]
        exact = conv_output_length(len(seg), self.conv_features)
        valid = lp[:min(exact, len(lp))]
        base = start // self.stride
        lo = 0 if start == 0 else self.margin_frames
        hi = min(upper_cut - base, len(valid))
        self._pieces.append(valid[lo:hi])

    def log_probs_so_far(self) -> np.ndarray:
        """(T_stable', V) stable stitched prefix (exact vs offline)."""
        if not self._pieces:
            return np.zeros((0, 1), np.float32)
        return np.concatenate(self._pieces, axis=0)

    def text_so_far(self, index2vocab: dict, decoder=None,
                    blank: Optional[int] = None,
                    postproc: Optional[Callable] = None) -> str:
        return decode_stitched(self.log_probs_so_far(), index2vocab,
                               decoder, blank, postproc)

    def finish(self) -> np.ndarray:
        """End of stream: flush remaining chunks, return full (T', V)."""
        if self._final is not None:
            return self._final
        n = self.samples_fed
        if n == 0:
            self._final = np.zeros((0, 1), np.float32)
            return self._final
        starts = self._chunk_starts(n)
        total = conv_output_length(n, self.conv_features)
        for k in range(self._next_chunk, len(starts)):
            start = starts[k]
            upper = (starts[k + 1] // self.stride + self.margin_frames
                     if k + 1 < len(starts) else total)
            self._emit(start, min(n - start, self.chunk), upper)
        self._next_chunk = len(starts)
        self._final = self.log_probs_so_far()
        return self._final

    def finish_text(self, index2vocab: dict, decoder=None,
                    blank: Optional[int] = None,
                    postproc: Optional[Callable] = None) -> str:
        return decode_stitched(self.finish(), index2vocab, decoder,
                               blank, postproc)


class TransducerStreamer(StreamingTranscriber):
    """Streaming RNN-T recognition: feed audio, read partial text.

    The transducer is the streaming-native topology (label-history
    conditioning, frame-synchronous emissions), and this completes its
    serving story the same way ``StreamingTranscriber`` completes CTC's:
    the encoder runs as fixed-shape overlapped chunks whose *feature*
    rows (not log-probs) are stitched exactly as the CTC path stitches
    frames, and the greedy lattice search consumes the stable stitched
    frames through one fixed-width ``decode_frames`` window program,
    carrying (tokens, n, predictor state) across windows
    (models/transducer.Transducer.decode_frames). Three compiled
    programs total — encoder chunk, decode window, decode init — serve
    any stream length in O(chunk) memory.

    ``encode(signal (1, chunk) f32, lengths (1,)) -> (enc (1, F, D),
    frames (1,))``, ``decode_init() -> (pred_out, carry)`` and
    ``decode_frames(enc (1, W, D), n_frames (1,), tokens, n, pred_out,
    carry) -> (tokens, n, pred_out, carry)`` are the jitted model fns
    (see cli/transcribe.load_transducer_stream). Decoded ids are exact
    vs running ``decode_frames`` once over the offline-stitched
    features (guard-tested); vs the unchunked whole-utterance decode
    the only divergence is the stitch-boundary feature perturbation the
    CTC chunked path already documents and bounds with the context
    margin.
    """

    def __init__(self, encode: Callable, decode_init: Callable,
                 decode_frames: Callable, conv_features: Sequence,
                 chunk_samples: int = 480_000,
                 context_samples: int = 32_000,
                 window_frames: Optional[int] = None,
                 max_output_len: int = 8_000,
                 batcher: Optional[MicroBatcher] = None):
        super().__init__(encode, conv_features, chunk_samples=chunk_samples,
                         context_samples=context_samples, batcher=batcher)
        self.decode_init = decode_init
        self.decode_frames_fn = decode_frames
        self.window = int(window_frames or self.frames_per_chunk)
        self.max_output_len = int(max_output_len)
        self.reset()

    def reset(self) -> None:
        super().reset()
        # __init__ calls reset() through the parent ctor before the
        # decode fns exist; the decode state initializes lazily
        self._dec = None

    def _decode_state(self):
        if self._dec is None:
            pred_out, carry = self.decode_init()
            tokens = np.full((1, self.max_output_len), _pad_id(), np.int32)
            n = np.zeros((1,), np.int32)
            self._dec = [tokens, n, pred_out, carry]
        return self._dec

    def feed(self, samples: np.ndarray) -> None:
        super().feed(samples)
        self._drain(final=False)

    def _drain(self, final: bool) -> None:
        """Run full decode windows over un-consumed stable frames; on
        ``final`` flush the remainder as one short (masked) window."""
        import jax.numpy as jnp

        self._decode_state()
        while True:
            avail = sum(len(p) for p in self._pieces)
            if avail < self.window and not (final and avail > 0):
                return
            take = min(self.window, avail)
            frames, rest, got = [], [], 0
            for p in self._pieces:
                if got >= take:
                    rest.append(p)
                    continue
                use = min(len(p), take - got)
                frames.append(p[:use])
                got += use
                if use < len(p):
                    rest.append(p[use:])
            self._pieces = rest
            flat = np.concatenate(frames, axis=0)
            win = np.zeros((1, self.window, flat.shape[-1]), np.float32)
            win[0, :take] = flat
            out = self.decode_frames_fn(
                jnp.asarray(win), jnp.asarray([take], jnp.int32), *self._dec)
            self._dec = list(out)

    def tokens_so_far(self):
        """(ids list, count) decoded from the stable consumed frames."""
        state = self._decode_state()
        tokens, n = np.asarray(state[0]), int(np.asarray(state[1])[0])
        return tokens[0, :n].tolist(), n

    def text_so_far(self, index2vocab: dict, decoder=None,
                    blank: Optional[int] = None,
                    postproc: Optional[Callable] = None) -> str:
        from audio8_tpu.ops.metrics import postproc_letters

        ids, _ = self.tokens_so_far()
        return (postproc or postproc_letters)(
            [index2vocab[int(i)] for i in ids])

    def finish(self) -> np.ndarray:
        """End of stream: flush encoder chunks, decode every remaining
        stable frame, return the decoded ids as a 1-D int32 array."""
        super().finish()
        self._drain(final=True)
        ids, _ = self.tokens_so_far()
        return np.asarray(ids, np.int32)

    def finish_text(self, index2vocab: dict, decoder=None,
                    blank: Optional[int] = None,
                    postproc: Optional[Callable] = None) -> str:
        self.finish()
        return self.text_so_far(index2vocab, postproc=postproc)


def _pad_id() -> int:
    from audio8_tpu.utils import Offsets

    return int(Offsets.PAD)
