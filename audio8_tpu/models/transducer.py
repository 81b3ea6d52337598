"""RNN-T (transducer) ASR model: wav2vec2 encoder + LSTM prediction
network + additive joint.

A model family beyond the reference (audio8's ASR heads are CTC,
/root/reference/audio8/wav2vec2.py:726-770, and attention seq2seq,
wav2vec2.py:979-1006): the transducer factorizes P(y | x) over
monotonic frame-synchronous alignments with label-history conditioning
— the standard topology for streaming ASR, trained with
``ops.transducer.transducer_loss``.

TPU-native shape discipline mirrors the rest of the zoo: the training
forward produces the full (B, T', U+1, V) joint tensor in one fused
program (V is a letter/BPE vocab, so the tensor is small and the
log-softmax fuses into the lattice scan), and greedy decode is a jitted
``lax.fori_loop`` over frames whose per-row LSTM state advances only on
emissions — static shapes, no host round-trips (the reference's decode
loops run per step in Python).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio8_tpu.config import TransducerConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2Encoder
from audio8_tpu.nn.embeddings import LookupTableEmbeddings
from audio8_tpu.nn.dropout import Dropout
from audio8_tpu.nn.layers import Dense
from audio8_tpu.utils import Offsets

Dtype = Any


class TransducerPredictor(nn.Module):
    """Label-history network: embed -> stacked LSTM.

    ``__call__`` runs the whole (GO-prefixed) label sequence for
    training; ``step`` advances one token for decode, carrying the
    per-layer (c, h) states explicitly so the greedy loop stays inside
    one XLA program.
    """

    vocab_size: int
    num_layers: int = 2
    d_model: int = 512
    embed_dim: int = 256
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed = LookupTableEmbeddings(
            vocab_size=self.vocab_size, features=self.embed_dim, **dd)
        self.rnns = [
            nn.RNN(nn.OptimizedLSTMCell(features=self.d_model, **dd),
                   name=f"rnn_{i}")
            for i in range(self.num_layers)]
        self.drop = Dropout(self.dropout)

    def init_carry(self, batch: int):
        zeros = jnp.zeros((batch, self.d_model), self.dtype)
        # OptimizedLSTMCell carry = (c, h)
        return [(zeros, zeros) for _ in range(self.num_layers)]

    def __call__(self, ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, U1) token ids -> (B, U1, d_model) prediction states."""
        x = self.embed(ids)
        x = self.drop(x, deterministic=not train)
        for rnn in self.rnns:
            x = rnn(x)
            x = self.drop(x, deterministic=not train)
        return x

    def step(self, carry, tok: jnp.ndarray):
        """One decode step. tok: (B,) int32; returns (out (B, d), carry).

        Routes through each RNN's own cell so the decode path shares the
        sequence path's parameters.
        """
        x = self.embed(tok)
        new_carry = []
        for rnn in self.rnns:
            c, x = rnn.cell(carry[len(new_carry)], x)
            new_carry.append(c)
        return x, new_carry


class TransducerJoint(nn.Module):
    """Additive joint: tanh(W_e enc + W_p pred) -> vocab logits."""

    vocab_size: int
    d_joint: int = 512
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.enc_proj = Dense(self.d_joint, **dd)
        self.pred_proj = Dense(self.d_joint, **dd)
        self.out = Dense(self.vocab_size, **dd)

    def __call__(self, enc: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
        """enc (B, T, d_e), pred (B, U1, d_p) -> logits (B, T, U1, V)."""
        e = self.enc_proj(enc)[:, :, None, :] + self.pred_proj(pred)[:, None]
        return self.out(jnp.tanh(e)).astype(jnp.float32)

    def single(self, enc_t: jnp.ndarray, pred_u: jnp.ndarray) -> jnp.ndarray:
        """One lattice node per row: (B, d_e), (B, d_p) -> (B, V)."""
        e = self.enc_proj(enc_t) + self.pred_proj(pred_u)
        return self.out(jnp.tanh(e)).astype(jnp.float32)


class Transducer(nn.Module):
    """Encoder + predictor + joint; blank = ``Offsets.GO`` (the CTC
    blank convention shared across this framework's decode surfaces)."""

    config: TransducerConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Wav2Vec2Encoder(config=cfg, **dd)
        self.predictor = TransducerPredictor(
            vocab_size=cfg.vocab_size, num_layers=cfg.pred_layers,
            d_model=cfg.pred_dim, embed_dim=cfg.pred_embed_dim,
            dropout=cfg.pred_dropout, **dd)
        self.joint = TransducerJoint(
            vocab_size=cfg.vocab_size, d_joint=cfg.d_joint, **dd)

    def __call__(self, x, input_lengths, targets, train: bool = False,
                 freeze: bool = True):
        """Training forward.

        targets: (B, U) label ids (no GO/EOS). Returns (log_probs
        (B, T', U+1, V) float32, pad_mask) — feed to transducer_loss.
        """
        enc, pad_mask = self.encoder(x, input_lengths, train)
        if freeze:
            enc = jax.lax.stop_gradient(enc)
        b = targets.shape[0]
        go = jnp.full((b, 1), Offsets.GO, targets.dtype)
        pred = self.predictor(jnp.concatenate([go, targets], axis=1), train)
        logits = self.joint(enc, pred)
        return jax.nn.log_softmax(logits, axis=-1), pad_mask

    def encode(self, x, input_lengths):
        """Encoder features for decode: (B, T) waveform -> (enc (B, T', D),
        frame_lengths (B,)). The chunked/streaming transducer path
        (serve.TransducerStreamer) stitches these across fixed-shape
        chunks before running ``decode_frames``."""
        enc, pad_mask = self.encoder(x, input_lengths, train=False)
        b, t_max, _ = enc.shape
        frame_lengths = (jnp.sum(pad_mask, axis=-1).astype(jnp.int32)
                         if pad_mask is not None
                         else jnp.full((b,), t_max, jnp.int32))
        return enc, frame_lengths

    def decode_init(self, batch: int):
        """Fresh decode state: the predictor advanced once on blank.

        Returns ``(pred_out (B, d_p), carry)`` — combine with an all-PAD
        token buffer and ``n = 0`` for the full resumable state."""
        carry = self.predictor.init_carry(batch)
        return self.predictor.step(
            carry, jnp.full((batch,), Offsets.GO, jnp.int32))

    def decode_frames(self, enc, frame_lengths, tokens, n, pred_out, carry,
                      max_symbols_per_frame: int = 4, extra=(), t0=0):
        """Resumable greedy lattice search over one window of encoder
        frames.

        Threads ``(tokens, n, pred_out, carry)`` in and out so arbitrarily
        long audio decodes through fixed-shape windows in ONE compiled
        program: the caller stitches encoder features chunk by chunk and
        keeps feeding windows, exactly like the reference-free streaming
        CTC path but with label-history state. Frames at ``t >=
        frame_lengths[row]`` are inert for that row.

        ``extra`` optionally carries alignment buffers ``(times, lps)``
        — per emitted token, the global frame index (``t0`` + local t)
        and its log-posterior — threaded and returned alongside the
        state when provided (static: () and 2-tuples trace separately).
        """
        b, t_max, _ = enc.shape
        max_output_len = tokens.shape[1]
        blank = Offsets.GO
        rows = jnp.arange(b)

        track = len(extra) > 0

        def frame_body(t, state):
            tokens, n, pred_out, carry, extra = state
            enc_t = enc[:, t]
            active_t = t < frame_lengths

            def emit_body(_, inner):
                tokens, n, pred_out, carry, extra, live = inner
                logits = self.joint.single(enc_t, pred_out)
                best = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                emit = (live & active_t & (best != blank)
                        & (n < max_output_len))
                pos = jnp.minimum(n, max_output_len - 1)
                tokens = tokens.at[rows, pos].set(
                    jnp.where(emit, best, tokens[rows, pos]))
                if track:
                    times, lps = extra
                    lp_best = (jnp.max(logits, axis=-1)
                               - jax.nn.logsumexp(logits, axis=-1))
                    times = times.at[rows, pos].set(
                        jnp.where(emit, t0 + t, times[rows, pos]))
                    lps = lps.at[rows, pos].set(
                        jnp.where(emit, lp_best, lps[rows, pos]))
                    extra = (times, lps)
                new_out, new_carry = self.predictor.step(
                    carry, jnp.where(emit, best, blank))
                sel = emit[:, None]
                pred_out = jnp.where(sel, new_out, pred_out)
                carry = [(jnp.where(sel, c2, c1), jnp.where(sel, h2, h1))
                         for (c1, h1), (c2, h2) in zip(carry, new_carry)]
                n = n + emit.astype(jnp.int32)
                return tokens, n, pred_out, carry, extra, emit

            live = jnp.ones((b,), bool)
            tokens, n, pred_out, carry, extra, _ = jax.lax.fori_loop(
                0, max_symbols_per_frame, emit_body,
                (tokens, n, pred_out, carry, extra, live))
            return tokens, n, pred_out, carry, extra

        tokens, n, pred_out, carry, extra = jax.lax.fori_loop(
            0, t_max, frame_body, (tokens, n, pred_out, carry, extra))
        if track:
            return tokens, n, pred_out, carry, extra
        return tokens, n, pred_out, carry

    def decode(self, x, input_lengths, max_output_len: int = 200,
               max_symbols_per_frame: int = 4, timed: bool = False):
        """Batched greedy transducer decode, one XLA program.

        Per frame, emit argmax labels (advancing the predictor state)
        until blank, a per-frame emission cap, or the output budget.
        Returns (tokens (B, max_output_len) PAD-padded, lengths (B,)),
        plus per-token (frames, log-posteriors) when ``timed`` — the
        transducer emits frame-synchronously, so the alignment is free
        (feed to ops/align.word_timestamps).
        """
        enc, frame_lengths = self.encode(x, input_lengths)
        b = enc.shape[0]
        pred_out, carry = self.decode_init(b)
        tokens = jnp.full((b, max_output_len), Offsets.PAD, jnp.int32)
        n = jnp.zeros((b,), jnp.int32)
        if timed:
            extra = (jnp.full((b, max_output_len), -1, jnp.int32),
                     jnp.zeros((b, max_output_len), jnp.float32))
            tokens, n, _, _, (times, lps) = self.decode_frames(
                enc, frame_lengths, tokens, n, pred_out, carry,
                max_symbols_per_frame, extra=extra)
            return tokens, n, times, lps
        tokens, n, _, _ = self.decode_frames(
            enc, frame_lengths, tokens, n, pred_out, carry,
            max_symbols_per_frame)
        return tokens, n


    def decode_beam(self, x, input_lengths, beam: int = 8,
                    max_output_len: int = 200,
                    max_symbols_per_frame: int = 4):
        """Batched time-synchronous RNN-T beam search, one XLA program.

        Per frame each hypothesis either *closes* (consumes the frame's
        blank) or extends with a label, for ``max_symbols_per_frame``
        rounds plus one forced-close round — so every surviving
        alignment carries exactly one blank per frame, and the final
        score is the log-sum over all explored alignments of the label
        sequence (merging below). Beyond the reference (the on-device
        analog of torchaudio's RNNTBeamSearch; audio8 has no transducer
        at all).

        Hypotheses with EQUAL label sequences merge exactly, in the
        style of ops/beam_jax.py: candidates sort lexicographically by
        (closed, rolling-hash pair) with ``lax.sort``, equal runs
        segment-logsumexp their scores, and the run head survives as
        representative. Unlike CTC, the merge is exact for the state
        too: the predictor is a deterministic function of the label
        history, so equal sequences have equal (pred_out, carry) and any
        representative carries the right state. Open and closed nodes
        never merge (``closed`` is the leading sort key): an open node
        can still emit at this frame, so they are distinct search
        states.

        Returns (tokens (B, K, max_output_len) PAD-padded, lengths
        (B, K), scores (B, K)), beams sorted by descending score.
        """
        neg = -1.0e30
        enc, frame_lengths = self.encode(x, input_lengths)
        b, t_max, _ = enc.shape
        k, u_max = beam, max_output_len
        blank = Offsets.GO
        v = self.config.vocab_size
        ext_syms = jnp.asarray([s for s in range(v) if s != blank],
                               jnp.int32)
        mul1, mul2 = jnp.uint32(1000003), jnp.uint32(2654435761)
        arange_k = jnp.arange(k, dtype=jnp.int32)
        rows = jnp.arange(b)

        def flat_step(carry, tok):
            """predictor.step over the flattened (B*K,) hypothesis axis."""
            flat = [(c.reshape(b * k, -1), h.reshape(b * k, -1))
                    for c, h in carry]
            out, new = self.predictor.step(flat, tok.reshape(b * k))
            return (out.reshape(b, k, -1),
                    [(c.reshape(b, k, -1), h.reshape(b, k, -1))
                     for c, h in new])

        # beam 0 = the empty sequence; the rest are -inf duds with
        # distinct hashes so they can never merge with a live node
        pred0, carry0 = self.decode_init(b)
        d_p = pred0.shape[-1]
        pred_out = jnp.broadcast_to(pred0[:, None], (b, k, d_p))
        carry = [(jnp.broadcast_to(c[:, None], (b, k, c.shape[-1])),
                  jnp.broadcast_to(h[:, None], (b, k, h.shape[-1])))
                 for c, h in carry0]
        state = dict(
            tokens=jnp.full((b, k, u_max), Offsets.PAD, jnp.int32),
            n=jnp.zeros((b, k), jnp.int32),
            score=jnp.full((b, k), neg).at[:, 0].set(0.0),
            h1=jnp.tile(jnp.arange(1, k + 1, dtype=jnp.uint32)[None],
                        (b, 1)),
            h2=jnp.tile((jnp.arange(1, k + 1, dtype=jnp.uint32)
                         * 7919)[None], (b, 1)),
            pred=pred_out, carry=carry)

        def round_fn(state, closed, lp, force_close):
            """One expansion round inside a frame. lp: (B, K, V)."""
            # close candidates (M1 = K rows): already-closed nodes pass
            # through without re-paying the blank
            close_score = state["score"] + jnp.where(
                closed, 0.0, lp[:, :, blank])
            # label candidates (M2 = K*(V-1))
            lbl_ok = (~closed) & (state["n"] < u_max)
            if force_close:  # static: the frame's last expansion round
                lbl_ok = jnp.zeros_like(lbl_ok)
            lbl_ok = lbl_ok[:, :, None]
            lbl_score = jnp.where(
                lbl_ok, state["score"][:, :, None] + lp[:, :, ext_syms],
                neg)
            sym_u = (ext_syms + 1).astype(jnp.uint32)
            lbl_h1 = state["h1"][:, :, None] * mul1 + sym_u[None, None, :]
            lbl_h2 = state["h2"][:, :, None] * mul2 + sym_u[None, None, :]

            m2 = k * (v - 1)

            def kv(a):
                return a.reshape(b, m2)

            def bc(a):
                return kv(jnp.broadcast_to(a, (b, k, v - 1)))

            cat = lambda p, q: jnp.concatenate([p, q], axis=1)
            c_closed = cat(jnp.ones((b, k), jnp.uint32),
                           jnp.zeros((b, m2), jnp.uint32))
            c_h1 = cat(state["h1"], kv(lbl_h1))
            c_h2 = cat(state["h2"], kv(lbl_h2))
            c_score = cat(close_score, kv(lbl_score))
            c_parent = cat(arange_k[None].repeat(b, 0),
                           bc(arange_k[None, :, None]))
            c_token = cat(jnp.full((b, k), -1, jnp.int32),
                          bc(ext_syms[None, None, :]))

            cl_s, h1_s, h2_s, sc_s, par_s, tok_s = jax.lax.sort(
                (c_closed, c_h1, c_h2, c_score, c_parent, c_token),
                dimension=1, num_keys=3, is_stable=True)
            first = jnp.concatenate(
                [jnp.ones((b, 1), bool),
                 (cl_s[:, 1:] != cl_s[:, :-1])
                 | (h1_s[:, 1:] != h1_s[:, :-1])
                 | (h2_s[:, 1:] != h2_s[:, :-1])], axis=1)
            m = k * v
            seg = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
            ids = (seg + jnp.arange(b, dtype=jnp.int32)[:, None] * m).ravel()
            flat = sc_s.ravel()
            mx = jnp.maximum(
                jax.ops.segment_max(flat, ids, num_segments=b * m), neg)
            ssum = jax.ops.segment_sum(jnp.exp(flat - mx[ids]), ids,
                                       num_segments=b * m)
            merged = (mx + jnp.log(jnp.maximum(ssum, 1e-38)))[ids].reshape(
                b, m)
            rank_score = jnp.where(first, merged, neg)
            _, top = jax.lax.top_k(rank_score, k)

            def pick(a):
                return jnp.take_along_axis(a, top, axis=1)

            parent = pick(par_s)
            token = pick(tok_s)
            new_closed = pick(cl_s).astype(bool)

            def by_parent(a):
                return jnp.take_along_axis(
                    a, parent.reshape(b, k, *([1] * (a.ndim - 2))), axis=1)

            emitted = token >= 0
            n_par = jnp.take_along_axis(state["n"], parent, axis=1)
            tokens = by_parent(state["tokens"])
            pos = jnp.minimum(n_par, u_max - 1)
            tokens = tokens.at[rows[:, None], arange_k[None], pos].set(
                jnp.where(emitted, token,
                          tokens[rows[:, None], arange_k[None], pos]))
            pred_par = by_parent(state["pred"])
            carry_par = [(by_parent(c), by_parent(h))
                         for c, h in state["carry"]]
            step_out, step_carry = flat_step(
                carry_par, jnp.where(emitted, token, blank))
            sel = emitted[:, :, None]
            new_state = dict(
                tokens=tokens,
                n=n_par + emitted.astype(jnp.int32),
                score=pick(merged),
                h1=pick(h1_s), h2=pick(h2_s),
                pred=jnp.where(sel, step_out, pred_par),
                carry=[(jnp.where(sel, c2, c1), jnp.where(sel, h2_, h1_))
                       for (c1, h1_), (c2, h2_) in zip(carry_par,
                                                       step_carry)])
            return new_state, new_closed

        def frame_body(t, state):
            active = (t < frame_lengths)[:, None]
            closed = jnp.zeros((b, k), bool)
            new = state
            for r in range(max_symbols_per_frame + 1):
                lp = jax.nn.log_softmax(self.joint.single(
                    jnp.broadcast_to(enc[:, t][:, None],
                                     (b, k, enc.shape[-1])
                                     ).reshape(b * k, -1),
                    new["pred"].reshape(b * k, -1)
                ).reshape(b, k, v), axis=-1)
                new, closed = round_fn(
                    new, closed, lp,
                    force_close=(r == max_symbols_per_frame))
            # rows whose audio ended keep their state untouched
            out = {}
            for key, val in new.items():
                if key == "carry":
                    out[key] = [
                        (jnp.where(active[:, :, None], c2, c1),
                         jnp.where(active[:, :, None], h2, h1))
                        for (c1, h1), (c2, h2) in zip(state[key], val)]
                elif val.ndim == 3:
                    out[key] = jnp.where(active[:, :, None], val,
                                         state[key])
                else:
                    out[key] = jnp.where(active, val, state[key])
            return out

        state = jax.lax.fori_loop(0, t_max, frame_body, state)
        order = jnp.argsort(-state["score"], axis=1)
        return (jnp.take_along_axis(state["tokens"], order[:, :, None],
                                    axis=1),
                jnp.take_along_axis(state["n"], order, axis=1),
                jnp.take_along_axis(state["score"], order, axis=1))


def create_transducer_model(
    vocab_size: int,
    config: Optional[TransducerConfig] = None,
    dtype=jnp.float32,
    **kwargs,
) -> Transducer:
    """Factory in the shape of create_acoustic_model
    (/root/reference/audio8/wav2vec2.py:262-296) with the transducer
    head's knobs added."""
    cfg = config or TransducerConfig(
        vocab_size=vocab_size,
        **{k: v for k, v in kwargs.items()
           if k in TransducerConfig.__dataclass_fields__})
    return Transducer(config=cfg, dtype=dtype)
